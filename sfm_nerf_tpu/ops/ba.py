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


# intrinsics vector layout for refine_intrinsics (ADDITION — the reference
# treats K as God-given; production SfM refines it, cf. COLMAP's OPENCV
# camera model): theta = [fx, fy, cx, cy, k1, k2] with k1/k2 the radial
# polynomial (1 + k1 r^2 + k2 r^4) on normalized image coordinates.
_INTR_TOKENS = {
    "f": (0, 1),       # fx and fy (independent)
    "fx": (0,), "fy": (1,),
    "pp": (2, 3),      # principal point
    "cx": (2,), "cy": (3,),
    "k1": (4,), "k2": (5,),
}


def intrinsics_free_mask(refine_intrinsics: str) -> Tuple[bool, ...]:
    """'f,pp,k1' -> 6-tuple of free flags over [fx, fy, cx, cy, k1, k2]."""
    free = [False] * 6
    for tok in filter(None, (t.strip() for t in refine_intrinsics.split(","))):
        if tok not in _INTR_TOKENS:
            raise ValueError(
                f"unknown intrinsics token {tok!r}; valid: "
                f"{sorted(_INTR_TOKENS)}"
            )
        for i in _INTR_TOKENS[tok]:
            free[i] = True
    return tuple(free)


def theta_from_K(K: jnp.ndarray) -> jnp.ndarray:
    """(3,3) pinhole K -> theta = [fx, fy, cx, cy, k1=0, k2=0]."""
    z = jnp.zeros((), K.dtype)
    return jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2], z, z])


def K_from_theta(theta: jnp.ndarray) -> jnp.ndarray:
    """theta -> (3,3) pinhole K (radial terms are not representable)."""
    fx, fy, cx, cy = theta[0], theta[1], theta[2], theta[3]
    o, i = jnp.zeros_like(fx), jnp.ones_like(fx)
    return jnp.stack([
        jnp.stack([fx, o, cx]),
        jnp.stack([o, fy, cy]),
        jnp.stack([o, o, i]),
    ])


def _observe_theta(cam: jnp.ndarray, X: jnp.ndarray,
                   theta: jnp.ndarray) -> jnp.ndarray:
    """``_observe`` parameterized by the intrinsics vector (plus the radial
    polynomial), for refine_intrinsics mode.  With k1=k2=0 the distortion
    factor is exactly 1.0 so the projection equals the pinhole one."""
    R = rodrigues(cam[:3])
    xc = jnp.einsum("ij,j->i", R, X, precision=HI) + cam[3:]
    z = jnp.maximum(xc[2], 1e-6)
    x, y = xc[0] / z, xc[1] / z
    r2 = x * x + y * y
    d = 1.0 + r2 * (theta[4] + theta[5] * r2)
    u = theta[0] * (x * d) + theta[2]
    v = theta[1] * (y * d) + theta[3]
    return jnp.stack([u, v])


def _inv3x3_lanes(W: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate/det) inverse of (W + lam*I) for W of shape
    (3, 3, M) — the damped per-point normal blocks, batch axis LAST.

    Keeping M minor-most means every multiply here is an elementwise VPU op
    over full 128-wide lanes; ``jnp.linalg.inv`` would need the batch
    leading, i.e. an (M,3,3) layout whose (3,3) minor tile pads 128x on
    TPU.  W is symmetric positive semi-definite (a Gauss-Newton block
    J^T J), so det(W + lam*I) >= lam^3 > 0 and the division is safe."""
    a = W[0, 0] + lam
    b, c = W[0, 1], W[0, 2]
    d = W[1, 1] + lam
    e = W[1, 2]
    f = W[2, 2] + lam
    # cofactors of the symmetric damped matrix [[a,b,c],[b,d,e],[c,e,f]]
    A00 = d * f - e * e
    A01 = c * e - b * f
    A02 = b * e - c * d
    A11 = a * f - c * c
    A12 = b * c - a * e
    A22 = a * d - b * b
    det = a * A00 + b * A01 + c * A02
    inv = 1.0 / det
    row0 = jnp.stack([A00, A01, A02])
    row1 = jnp.stack([A01, A11, A12])
    row2 = jnp.stack([A02, A12, A22])
    return jnp.stack([row0, row1, row2]) * inv


class BAResult(NamedTuple):
    camera_params: jnp.ndarray   # (N, 6) refined [rvec, tvec]
    points: jnp.ndarray          # (M, 3) refined
    cost: jnp.ndarray            # scipy-style 0.5 * sum(r^2) at optimum
    initial_cost: jnp.ndarray
    n_accepted: jnp.ndarray      # accepted LM steps
    n_residuals: jnp.ndarray     # observations active in the cost (mask0)
    intrinsics: jnp.ndarray      # (6,) [fx, fy, cx, cy, k1, k2] (refined
    #                              when refine_intrinsics requested; else
    #                              the input K's values verbatim)


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "loss", "axis_name", "refine_intrinsics"),
)
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
    refine_intrinsics: str = "",
) -> BAResult:
    """``axis_name``: when called inside shard_map with the POINT axis (M)
    sharded over that mesh axis, every reduction over points becomes a
    psum, the (small) camera system solves replicated on all devices, and
    the point back-substitution stays device-local — the Schur structure
    IS the sharding structure (parallel/ba.py wraps this).

    ``refine_intrinsics`` (ADDITION; '' = off, the reference treats K as
    fixed): comma-set of {f, fx, fy, pp, cx, cy, k1, k2} freeing SHARED
    intrinsics — focal(s), principal point, radial distortion
    (1 + k1 r^2 + k2 r^4 on normalized coords) — as one extra 6-wide
    global block in the same Schur reduction: the reduced system grows
    from (6N)^2 to (6N+6)^2, the per-point work is two extra small
    einsums, and the point-axis reductions join the existing single psum,
    so the sharded path (parallel/ba.py) refines intrinsics with no extra
    collectives.  Frozen coordinates take d=0 exactly (their Jacobian
    columns are zeroed and the damped diagonal pins them).  The refined
    vector is returned in ``BAResult.intrinsics``."""
    n_cam = camera_params.shape[0]
    n_pts = points.shape[0]
    vis = visibility.astype(K.dtype)
    free = intrinsics_free_mask(refine_intrinsics)
    refining = any(free)
    theta0 = theta_from_K(K)
    free_v = jnp.asarray(free, K.dtype)

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

    def residual_mask(cams, pts, theta):
        """(N,M,2) residuals under the frozen visibility+cheirality mask.
        The refine-off path projects through the ORIGINAL `_observe(.., K)`
        (bit-identical to the pre-refine implementation); the refining
        path through `_observe_theta` (same math, associativity aside)."""
        one = _observe_theta if refining else _observe
        obs_fn = jax.vmap(jax.vmap(one, (None, 0, None)), (0, None, None))
        proj = obs_fn(cams, pts, theta if refining else K)    # (N,M,2)
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

    def cost_of(cams, pts, theta):
        r, _ = residual_mask(cams, pts, theta)
        if loss == "linear":
            return preduce(0.5 * jnp.sum(r * r))
        norm = jnp.linalg.norm(r, axis=-1) * (mask0 > 0)
        quad = 0.5 * norm**2
        lin = huber_delta * (norm - 0.5 * huber_delta)
        return preduce(jnp.sum(jnp.where(norm <= huber_delta, quad, lin)))

    # jacobians of one (cam, point) observation wrt cam (2x6), point (2x3),
    # and (refining only) the shared intrinsics vector (2x6)
    obs_one = _observe_theta if refining else _observe
    jac_cam = jax.jacfwd(obs_one, argnums=0)
    jac_pt = jax.jacfwd(obs_one, argnums=1)
    jac_th = jax.jacfwd(_observe_theta, argnums=2)

    def lm_step(carry, _):
        cams, pts, theta, lam, cost = carry
        kparam = theta if refining else K
        r, mask = residual_mask(cams, pts, theta)        # (N,M,2), (N,M)
        w = irls_weights(r)                              # (N,M)
        rt = jnp.transpose(r * w[..., None], (2, 0, 1))  # (2,N,M)
        wmask = mask * w                                 # (N,M)

        # TPU layout discipline for the per-observation block tensors.
        # Mosaic tiles the two MINOR dims of every buffer to the (8,128)
        # vregister, so any tensor whose minor dims are the tiny Jacobian
        # block axes (2/3/6) pads 20-43x: the natural (N,M,2,6) einsum
        # formulation measured 27.6 GB padded for 1.05 GB of data at
        # (200 cams, 36k pts) — an OOM on a 16 GB chip.  einsum axis
        # reordering alone does NOT fix it (dot_general re-copies operands
        # into its own (batch, free, contract) layouts), so:
        #   - every TINY contraction (over r=2 residual rows or a 3/6
        #     block axis) is a broadcast-FMA (VPU elementwise multiply
        #     fused into a reduce; the `_k3_phase` pattern — also exact
        #     f32, immune to the TPU's bf16 dot demotion);
        #   - the ONE FLOP-heavy contraction (the Schur product over
        #     k,m) is a single big MXU matmul over a FREE reshape
        #     (N,6,3,M) -> (6N, 3M) — which is why Y/YWi live in
        #     (N,6,3,M) order with the huge M axis minor.
        A = jnp.transpose(
            jax.vmap(jax.vmap(jac_cam, (None, 0, None)), (0, None, None))(
                cams, pts, kparam
            ), (2, 0, 3, 1),
        ) * wmask[None, :, None, :]                      # (2,N,6,M)
        B = jnp.transpose(
            jax.vmap(jax.vmap(jac_pt, (None, 0, None)), (0, None, None))(
                cams, pts, kparam
            ), (2, 0, 3, 1),
        ) * wmask[None, :, None, :]                      # (2,N,3,M)

        # normal-equation blocks.  U/g_cam/S_off/rhs reduce over the point
        # axis — cross-device under sharding; W/Y/g_pt are per-point, i.e.
        # local.  The four point-axis reductions are bundled into ONE psum
        # (pytree collective) so a multi-host mesh pays one small-payload
        # all-reduce latency per LM iteration, not four.
        U_p = (A[:, :, :, None] * A[:, :, None]).sum((0, 4))   # (N,6,6)
        W = (B[:, :, :, None] * B[:, :, None]).sum((0, 1))     # (3,3,M)
        Y = (A[:, :, :, None] * B[:, :, None]).sum(0)          # (N,6,3,M)
        g_cam_p = (A * rt[:, :, None]).sum((0, 3))             # (N,6)
        g_pt = (B * rt[:, :, None]).sum((0, 1))                # (3,M)

        if refining:
            # shared-intrinsics block: one more Jacobian per observation,
            # frozen coordinates' columns zeroed so their update is 0
            D = jnp.transpose(
                jax.vmap(
                    jax.vmap(jac_th, (None, 0, None)), (0, None, None)
                )(cams, pts, theta), (2, 0, 3, 1),
            ) * wmask[None, :, None, :] * free_v[:, None]  # (2,N,6,M)
            Z = (D[:, :, :, None] * B[:, :, None]).sum((0, 1))   # (6,3,M)
            Q_p = (D[:, :, :, None] * D[:, :, None]).sum((0, 1, 4))  # (6,6)
            Yc_p = (A[:, :, :, None] * D[:, :, None]).sum((0, 4))  # (N,6,6)
            g_th_p = (D * rt[:, :, None]).sum((0, 1, 3))         # (6,)

        I6 = jnp.eye(6, dtype=K.dtype)
        W_inv = _inv3x3_lanes(W, lam)                    # (3,3,M)

        # Schur complement on cameras (+ the shared-intrinsics block when
        # refining): after the ONE bundled reduction everything reduced is
        # replicated and the (small) augmented solve runs redundantly on
        # every device
        YWi = (Y[:, :, :, None] * W_inv[None, None]).sum(2)  # (N,6,3,M)
        Y_r = Y.reshape(6 * n_cam, -1)                   # (6N, 3M) free
        YWi_r = YWi.reshape(6 * n_cam, -1)
        # THE matmul: S_off[n,p,i,l] over contraction (k, m) — 6N x 6N
        # output with a 3M-deep contraction, the only MXU-shaped op here
        S_off_p = jnp.einsum(
            "ak,bk->ab", YWi_r, Y_r, precision=HI,
        ).reshape(n_cam, 6, n_cam, 6).transpose(0, 2, 1, 3)  # (N,N,6,6)
        rhs2_p = jnp.einsum(
            "ak,k->a", YWi_r, g_pt.reshape(-1), precision=HI,
        ).reshape(n_cam, 6)                              # (N,6)
        if refining:
            ZWi = (Z[:, :, None] * W_inv[None]).sum(1)   # (6,3,M)
            S_cth_p = Yc_p - jnp.einsum(
                "ak,jk->aj", YWi_r, Z.reshape(6, -1), precision=HI,
            ).reshape(n_cam, 6, 6)                               # (N,6,6)
            S_thth_p = Q_p - jnp.einsum(
                "ik,jk->ij", ZWi.reshape(6, -1), Z.reshape(6, -1),
                precision=HI)                                    # (6,6)
            rhs_th_p = g_th_p - jnp.einsum(
                "ik,k->i", ZWi.reshape(6, -1), g_pt.reshape(-1),
                precision=HI)                                    # (6,)
            (U, g_cam, S_off, rhs2, S_cth, S_thth, rhs_th) = preduce(
                (U_p, g_cam_p, S_off_p, rhs2_p, S_cth_p, S_thth_p, rhs_th_p)
            )
        else:
            U, g_cam, S_off, rhs2 = preduce((U_p, g_cam_p, S_off_p, rhs2_p))
        U_d = U + lam * I6
        S = -S_off
        S = S.at[jnp.arange(n_cam), jnp.arange(n_cam)].add(U_d)
        rhs = g_cam - rhs2

        S_flat = S.transpose(0, 2, 1, 3).reshape(6 * n_cam, 6 * n_cam)
        if refining:
            # augment with the 6-wide global block: [[S, S_cth],
            # [S_cth^T, S_thth + lam I]]; frozen coords have zero rows,
            # columns, and rhs — the damped diagonal pins their update to 0
            top = jnp.concatenate(
                [S_flat, S_cth.reshape(6 * n_cam, 6)], axis=1)
            bot = jnp.concatenate(
                [S_cth.reshape(6 * n_cam, 6).T, S_thth + lam * I6], axis=1)
            S_aug = jnp.concatenate([top, bot], axis=0)
            rhs_aug = jnp.concatenate([rhs.reshape(-1), rhs_th])
            d = -jnp.linalg.solve(S_aug, rhs_aug)
            d_cam = d[: 6 * n_cam].reshape(n_cam, 6)
            d_th = d[6 * n_cam:] * free_v
        else:
            d_cam = -jnp.linalg.solve(
                S_flat, rhs.reshape(-1)).reshape(n_cam, 6)
            d_th = jnp.zeros_like(theta)
        # back-substitute points (tiny per-point contractions: VPU FMAs)
        rhs_pt = g_pt + jnp.einsum(
            "ak,a->k", Y_r, d_cam.reshape(-1), precision=HI,
        ).reshape(3, -1)                                 # (3,M)
        if refining:
            rhs_pt = rhs_pt + (Z * d_th[:, None, None]).sum(0)
        d_pt = -(W_inv * rhs_pt[None]).sum(1).T          # (M,3)

        cams_new = cams + d_cam
        pts_new = pts + d_pt
        theta_new = theta + d_th
        cost_new = cost_of(cams_new, pts_new, theta_new)
        ok = jnp.isfinite(cost_new) & (cost_new < cost)
        cams = jnp.where(ok, cams_new, cams)
        pts = jnp.where(ok, pts_new, pts)
        theta = jnp.where(ok, theta_new, theta)
        cost = jnp.where(ok, cost_new, cost)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-10, 1e10)
        return (cams, pts, theta, lam, cost), ok

    c0 = cost_of(camera_params, points, theta0)
    (cams, pts, theta, _, cost), accepted = jax.lax.scan(
        lm_step,
        (camera_params, points, theta0, jnp.asarray(lambda0, K.dtype), c0),
        None,
        length=n_iters,
    )
    return BAResult(
        cams, pts, cost, c0, jnp.sum(accepted), preduce(jnp.sum(mask0)),
        theta,
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
