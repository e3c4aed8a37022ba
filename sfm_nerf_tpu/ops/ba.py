"""Bundle adjustment: Schur-complement Levenberg-Marquardt, fully on device.

The reference's BA (Phase1/BundleAdjustment.py) packs (N cams x 6 Rodrigues+t)
+ (M pts x 3) into one vector and hands a dense Python double-loop residual to
scipy TRF with ``max_nfev=10`` and NO sparse-Jacobian structure — the numeric
Jacobian re-runs the double loop O(params) times, making BA the dominant
Phase1 cost (SURVEY §3.1).  Here the problem's camera/point block sparsity is
exploited directly:

- residuals r_ij (2-vector per (cam i, point j)) and their analytic-by-AD
  Jacobians A_ij = dr/dcam (2x6), B_ij = dr/dpoint (2x3) are built for ALL
  (i,j) pairs in one vmapped jacfwd launch, gated by the visibility mask
  (and the reference's behind-camera drop, BundleAdjustment.py:95-98,
  becomes a multiplicative mask — same normal equations as skipping);
- the damped normal system is reduced by the Schur complement onto the
  camera block: S = U - Y W^-1 Y^T is only (6N x 6N) (30x30 for 5 cameras)
  while the point block W is M independent 3x3 solves (vmapped);
- a fixed-trip-count accept/reject LM loop (lax.scan) keeps the whole solver
  one compiled program.

Parameterization parity: cam = [rvec (Rodrigues, world->cam), tvec], residual
= (K-projection of R X + t) - obs, identical to reprojection_residual
(BundleAdjustment.py:54-119); returned cost is scipy's 0.5*sum(r^2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sfm_nerf_tpu.ops.linalg import HI, rodrigues


def _observe(cam: jnp.ndarray, X: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Residual-ready projection of one point through one camera.

    cam = [rvec(3), tvec(3)]; returns pixel (2,).  The depth clamp is
    ONE-SIDED (z floored at +1e-6, never sign-preserving): u = f*x/z is
    invariant under reflecting a point through the camera center, so a
    sign-preserving clamp lets LM march the whole rig through a distant
    point cloud to a mirrored optimum with near-identical residuals but
    every depth negative (observed on the bundled 5-view data: round-1
    global BA ended with 99% of observations behind the cameras at
    sub-pixel "error", gutting round 2 via the frozen cheirality mask).
    Flooring z makes behind-camera projections astronomically wrong, i.e.
    the cost itself is a cheirality barrier; the Jacobian stays finite.
    """
    R = rodrigues(cam[:3])
    # HIGHEST: TPU demotes plain f32 matmul inputs to bf16 (one MXU pass);
    # a 0.2% relative error on an ~800 px projection is ~1.6 px of fake
    # residual — measured as exactly that on the TPU pipeline's metrics
    xc = jnp.einsum("ij,j->i", R, X, precision=HI) + cam[3:]
    z = jnp.maximum(xc[2], 1e-6)
    u = K[0, 0] * xc[0] / z + K[0, 2]
    v = K[1, 1] * xc[1] / z + K[1, 2]
    return jnp.stack([u, v])


def _depth(cam: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    R = rodrigues(cam[:3])
    return (jnp.einsum("ij,j->i", R, X, precision=HI) + cam[3:])[2]


class BAResult(NamedTuple):
    camera_params: jnp.ndarray   # (N, 6) refined [rvec, tvec]
    points: jnp.ndarray          # (M, 3) refined
    cost: jnp.ndarray            # scipy-style 0.5 * sum(r^2) at optimum
    initial_cost: jnp.ndarray
    n_accepted: jnp.ndarray      # accepted LM steps
    n_residuals: jnp.ndarray     # observations active in the cost (mask0)


@functools.partial(jax.jit, static_argnames=("n_iters", "loss", "axis_name"))
def bundle_adjust(
    K: jnp.ndarray,              # (3,3)
    camera_params: jnp.ndarray,  # (N,6) [rvec, tvec] world->cam
    points: jnp.ndarray,         # (M,3)
    observations: jnp.ndarray,   # (N,M,2) pixel obs (-1 placeholder ok)
    visibility: jnp.ndarray,     # (N,M) 1/0
    n_iters: int = 50,
    lambda0: float = 1e-3,
    loss: str = "linear",        # 'linear' (reference parity) | 'huber'
    huber_delta: float = 3.0,    # px; transition of the robust loss
    axis_name: str | None = None,
) -> BAResult:
    """``axis_name``: when called inside shard_map with the POINT axis (M)
    sharded over that mesh axis, every reduction over points becomes a
    psum, the (small) camera system solves replicated on all devices, and
    the point back-substitution stays device-local — the Schur structure
    IS the sharding structure (parallel/ba.py wraps this)."""
    n_cam = camera_params.shape[0]
    n_pts = points.shape[0]
    vis = visibility.astype(K.dtype)

    def preduce(x):
        """Complete a point-axis reduction across devices."""
        return jax.lax.psum(x, axis_name) if axis_name else x

    # Cheirality mask FROZEN at the initial geometry.  The reference
    # re-evaluates its z<=1e-8 residual drop every evaluation
    # (BundleAdjustment.py:95-98); under a solver that actually converges
    # (unlike its max_nfev=10 TRF) that is exploitable — LM "improves" cost
    # by pushing points behind cameras to zero their residuals (observed:
    # reported RMS 0.5 px while true median error was 92 px).  Freezing the
    # drop set keeps the reference's semantics for initially-invalid
    # observations while making the objective honest.
    depth_fn = jax.vmap(jax.vmap(_depth, (None, 0)), (0, None))
    z0 = depth_fn(camera_params, points)                 # (N,M)
    mask0 = vis * (z0 > 1e-8).astype(K.dtype)

    if loss not in ("linear", "huber"):
        raise ValueError(f"unknown loss {loss!r}")

    def residual_mask(cams, pts):
        """(N,M,2) residuals under the frozen visibility+cheirality mask."""
        obs_fn = jax.vmap(jax.vmap(_observe, (None, 0, None)), (0, None, None))
        proj = obs_fn(cams, pts, K)                      # (N,M,2)
        r = (proj - observations) * mask0[..., None]
        return r, mask0

    def irls_weights(r):
        """Per-observation sqrt-IRLS weights for the Huber loss: residuals
        and Jacobian rows scaled by sqrt(min(1, delta/|r|)) turn the damped
        Gauss-Newton step into a robust one."""
        if loss == "linear":
            return jnp.ones_like(r[..., 0])
        norm = jnp.linalg.norm(r, axis=-1)               # (N,M)
        return jnp.sqrt(jnp.minimum(1.0, huber_delta / (norm + 1e-12)))

    def cost_of(cams, pts):
        r, _ = residual_mask(cams, pts)
        if loss == "linear":
            return preduce(0.5 * jnp.sum(r * r))
        norm = jnp.linalg.norm(r, axis=-1) * (mask0 > 0)
        quad = 0.5 * norm**2
        lin = huber_delta * (norm - 0.5 * huber_delta)
        return preduce(jnp.sum(jnp.where(norm <= huber_delta, quad, lin)))

    # jacobians of one (cam, point) observation wrt cam (2x6) and point (2x3)
    jac_cam = jax.jacfwd(_observe, argnums=0)
    jac_pt = jax.jacfwd(_observe, argnums=1)

    def lm_step(carry, _):
        cams, pts, lam, cost = carry
        r, mask = residual_mask(cams, pts)               # (N,M,2), (N,M)
        w = irls_weights(r)                              # (N,M)
        r = r * w[..., None]
        wmask = mask * w

        A = jax.vmap(jax.vmap(jac_cam, (None, 0, None)), (0, None, None))(
            cams, pts, K
        ) * wmask[..., None, None]                       # (N,M,2,6)
        B = jax.vmap(jax.vmap(jac_pt, (None, 0, None)), (0, None, None))(
            cams, pts, K
        ) * wmask[..., None, None]                       # (N,M,2,3)

        # normal-equation blocks.  U/g_cam/S_off/rhs reduce over the point
        # axis — cross-device under sharding; W/Y/g_pt are per-point, i.e.
        # local.  The four point-axis reductions are bundled into ONE psum
        # (pytree collective) so a multi-host mesh pays one small-payload
        # all-reduce latency per LM iteration, not four.
        U_p = jnp.einsum("nmri,nmrj->nij", A, A, precision=HI)  # (N,6,6)
        W = jnp.einsum("nmri,nmrj->mij", B, B, precision=HI)    # (M,3,3)
        Y = jnp.einsum("nmri,nmrj->nmij", A, B, precision=HI)   # (N,M,6,3)
        g_cam_p = jnp.einsum("nmri,nmr->ni", A, r, precision=HI)  # (N,6)
        g_pt = jnp.einsum("nmri,nmr->mi", B, r, precision=HI)   # (M,3)

        I6 = jnp.eye(6, dtype=K.dtype)
        I3 = jnp.eye(3, dtype=K.dtype)
        W_d = W + lam * I3
        W_inv = jnp.linalg.inv(W_d)                              # (M,3,3)

        # Schur complement on cameras: S (N,6,N,6); after the bundled
        # reduction S and rhs are replicated and the (small) camera solve
        # runs redundantly on every device
        YWi = jnp.einsum("nmij,mjk->nmik", Y, W_inv, precision=HI)
        S_off_p = jnp.einsum("nmik,pmlk->npil", YWi, Y, precision=HI)
        rhs2_p = jnp.einsum("nmik,mk->ni", YWi, g_pt, precision=HI)
        U, g_cam, S_off, rhs2 = preduce((U_p, g_cam_p, S_off_p, rhs2_p))
        U_d = U + lam * I6
        S = -S_off
        S = S.at[jnp.arange(n_cam), jnp.arange(n_cam)].add(U_d)
        rhs = g_cam - rhs2

        S_flat = S.transpose(0, 2, 1, 3).reshape(6 * n_cam, 6 * n_cam)
        d_cam = -jnp.linalg.solve(S_flat, rhs.reshape(-1)).reshape(n_cam, 6)
        # back-substitute points
        rhs_pt = g_pt + jnp.einsum("nmij,ni->mj", Y, d_cam, precision=HI)
        d_pt = -jnp.einsum("mij,mj->mi", W_inv, rhs_pt, precision=HI)

        cams_new = cams + d_cam
        pts_new = pts + d_pt
        cost_new = cost_of(cams_new, pts_new)
        ok = jnp.isfinite(cost_new) & (cost_new < cost)
        cams = jnp.where(ok, cams_new, cams)
        pts = jnp.where(ok, pts_new, pts)
        cost = jnp.where(ok, cost_new, cost)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-10, 1e10)
        return (cams, pts, lam, cost), ok

    c0 = cost_of(camera_params, points)
    (cams, pts, _, cost), accepted = jax.lax.scan(
        lm_step,
        (camera_params, points, jnp.asarray(lambda0, K.dtype), c0),
        None,
        length=n_iters,
    )
    return BAResult(
        cams, pts, cost, c0, jnp.sum(accepted), preduce(jnp.sum(mask0))
    )


def fix_gauge_to_first_camera(
    camera_params: jnp.ndarray, points: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-express a BA solution in camera 0's frame (R0=I, t0=0).

    LM with damping handles the 7-DOF gauge freedom numerically, but the
    drifted solution no longer has camera 1 at the origin — the convention
    every downstream consumer (and the reference driver) assumes.  Apply the
    rigid transform x' = R0 x + t0: cams (R_i, t_i) -> (R_i R0^T,
    t_i - R_i R0^T t0), points X -> R0 X + t0.
    """
    R0 = rodrigues(camera_params[0, :3])
    t0 = camera_params[0, 3:]
    Rs = rodrigues(camera_params[:, :3])
    Rs_new = jnp.einsum("nij,kj->nik", Rs, R0, precision=HI)  # R_i R0^T
    ts_new = camera_params[:, 3:] - jnp.einsum(
        "nij,j->ni", Rs_new, t0, precision=HI
    )
    from sfm_nerf_tpu.ops.linalg import rotation_to_rvec

    cams_new = jnp.concatenate([rotation_to_rvec(Rs_new), ts_new], axis=-1)
    pts_new = jnp.einsum("ij,mj->mi", R0, points, precision=HI) + t0
    return cams_new, pts_new


def camera_params_from_RC(Rs: jnp.ndarray, Cs: jnp.ndarray) -> jnp.ndarray:
    """(R world->cam, C center) -> packed [rvec, tvec=-R C] (N,6) — the
    reference's packing (Phase1/Wrapper.py:794-809)."""
    from sfm_nerf_tpu.ops.linalg import rotation_to_rvec

    rvecs = rotation_to_rvec(Rs)
    tvecs = -jnp.einsum("nij,nj->ni", Rs, Cs, precision=HI)
    return jnp.concatenate([rvecs, tvecs], axis=-1)


def RC_from_camera_params(cams: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed (N,6) -> (R (N,3,3), C (N,3)); C = -R^T t
    (Phase1/Wrapper.py:843-850)."""
    Rs = rodrigues(cams[:, :3])
    Cs = -jnp.einsum("nji,nj->ni", Rs, cams[:, 3:], precision=HI)
    return Rs, Cs
