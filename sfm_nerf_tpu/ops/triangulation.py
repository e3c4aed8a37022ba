"""Triangulation: batched DLT, cheirality vote, vmapped nonlinear refinement.

Parity notes (Phase1/Triangulation.py + Utils.py):

- DLT stacks [h1]_x P1 over [h2]_x P2 (skew form) per point and takes the
  null vector (Triangulation.py:208-252) — here a single batched 4x4
  eigendecomposition over all points at once instead of a Python loop of
  6x4 SVDs;
- projection conventions differ across the reference and BOTH are kept:
  ``P = K [R|T]`` (translation form, Utils.py:3-31) vs
  ``P = K R [I|-C]`` (camera-center form, Utils.py:86-106);
- nonlinear refinement minimizes the 4-residual (two cameras x (u,v))
  reprojection error per point with camera-CENTER convention
  (Triangulation.py:270-304), vmapped LM over all points simultaneously
  (the reference runs one scipy TRF solve per point, serially);
- cheirality picks the candidate pose maximizing #points with z>0 in cam 1
  AND r3.(X-C)>0 in cam 2 (Triangulation.py:372-401).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sfm_nerf_tpu.utils.buckets import pow2_bucket

from sfm_nerf_tpu.ops.linalg import (
    HI,
    homogenize,
    skew,
    smallest_eigvec_of_normal,
)
from sfm_nerf_tpu.ops.lm import levenberg_marquardt


def projection_matrix_RT(K, R, T):
    """P = K [R | T] with T a translation vector (Utils.py:3-31)."""
    # HIGHEST: bf16-demoted 3x3 products corrupt P by ~0.2% -> ~1.6 px
    # at this dataset's pixel scale (observed on the TPU f32 pipeline)
    return jnp.matmul(
        K, jnp.concatenate([R, T.reshape(3, 1)], axis=1), precision=HI)


def projection_matrix_RC(K, R, C):
    """P = K R [I | -C] with C the camera center (Utils.py:86-106)."""
    return jnp.matmul(K, jnp.matmul(
        R,
        jnp.concatenate([jnp.eye(3, dtype=K.dtype), -C.reshape(3, 1)],
                        axis=1),
        precision=HI), precision=HI)


def project(P: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Project world points ``X[..., 3]`` through ``P(3,4)`` -> pixels [..., 2]."""
    Xh = homogenize(X)
    x = jnp.einsum("ij,...j->...i", P, Xh, precision=HI)
    return x[..., :2] / x[..., 2:3]


def triangulate_linear(
    K: jnp.ndarray,
    R1: jnp.ndarray, T1: jnp.ndarray,
    R2: jnp.ndarray, T2: jnp.ndarray,
    pts1: jnp.ndarray, pts2: jnp.ndarray,
) -> jnp.ndarray:
    """Batched DLT triangulation -> (N, 3).

    T1/T2 are TRANSLATIONS (P = K[R|T]), matching triangulationlinear's
    inputs (Triangulation.py:224-226; the caller converts centers via
    T = -R C, Wrapper.py:437-439).
    """
    P1 = projection_matrix_RT(K, R1, T1)
    P2 = projection_matrix_RT(K, R2, T2)
    A1 = jnp.einsum("nij,jk->nik", skew(homogenize(pts1)), P1, precision=HI)
    A2 = jnp.einsum("nij,jk->nik", skew(homogenize(pts2)), P2, precision=HI)
    A = jnp.concatenate([A1, A2], axis=-2)          # (N, 6, 4)
    # Jacobi path (ops/linalg.py): ~14x XLA eigh on TPU for tiny normal
    # matrices; the homogeneous divide cancels the eigenvector's arbitrary
    # sign, and the nonlinear LM refinement follows anyway
    from sfm_nerf_tpu.ops.linalg import smallest_eigvec_of_normal_fast

    X = smallest_eigvec_of_normal_fast(A)           # (N, 4)
    return X[..., :3] / X[..., 3:4]


def triangulate_midpoint(
    K: jnp.ndarray,
    R1: jnp.ndarray, C1: jnp.ndarray,
    R2: jnp.ndarray, C2: jnp.ndarray,
    pts1: jnp.ndarray, pts2: jnp.ndarray,
) -> jnp.ndarray:
    """Closed-form two-ray midpoint triangulation -> (N, 3) (ADDITION; no
    reference counterpart — Triangulation.py only knows the DLT).

    Solves min_{t1,t2} |(C1 + t1 d1) - (C2 + t2 d2)| per point (a 2x2
    normal system over the ray directions d = R^T K^-1 [u, v, 1]) and
    returns the segment midpoint.  No eigensolver: measured on the
    200-camera ring dataset, the f32 DLT's smallest-eigenvector init sits
    ~0.3 units off at 1.8-degree ray angles and the LM refinement then
    diverges to |X| ~ 1e6 for a handful of points per pair (12-95 px
    source-view reprojection) — the midpoint init is exact FMA arithmetic,
    lands closer than the DLT (median 0.12 vs 0.31), and never produced a
    diverged refinement in the same sweep.  Used as the SECOND init of the
    best-of-two LM in :func:`triangulate_pair_bucketed`."""
    Ki = jnp.linalg.inv(K)
    h1 = homogenize(pts1)
    h2 = homogenize(pts2)
    # rows of (Ki h)^T R = world-frame ray directions R^T Ki [u,v,1]
    d1 = jnp.matmul(jnp.matmul(h1, Ki.T, precision=HI), R1, precision=HI)
    d2 = jnp.matmul(jnp.matmul(h2, Ki.T, precision=HI), R2, precision=HI)
    b = (C2 - C1).reshape(3)
    a11 = jnp.sum(d1 * d1, axis=1)
    a12 = jnp.sum(d1 * d2, axis=1)
    a22 = jnp.sum(d2 * d2, axis=1)
    b1 = jnp.einsum("nj,j->n", d1, b, precision=HI)
    b2 = jnp.einsum("nj,j->n", d2, b, precision=HI)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    t1 = (a22 * b1 - a12 * b2) / det
    t2 = (a12 * b1 - a11 * b2) / det
    return 0.5 * ((C1.reshape(3) + t1[:, None] * d1)
                  + (C2.reshape(3) + t2[:, None] * d2))


def cheirality_counts(
    points: jnp.ndarray,   # (4, N, 3) triangulated per candidate pose
    Cs: jnp.ndarray,       # (4, 3)
    Rs: jnp.ndarray,       # (4, 3, 3)
    R1: jnp.ndarray = None,
    C1: jnp.ndarray = None,
    n_valid: jnp.ndarray = None,
) -> jnp.ndarray:
    """#points passing the two-camera depth test per candidate
    (Triangulation.py:372-401).  Camera 1 defaults to identity at the
    origin (the reference's two-view case — it tests raw world z there,
    which is camera-1 depth ONLY under that default); a registered
    non-identity camera-1 pose must test depth in ITS frame or the vote
    picks mirrored candidates.

    ``n_valid`` (traced scalar): rows >= n_valid are bucket padding and
    are excluded from the vote, so the winner is exactly invariant to the
    point-axis bucket size (advisor r4: cyclic-repeat padding alone leaves
    the vote's per-point weighting floor-dependent, which can flip
    near-tie picks across platforms with different bucket floors)."""
    if R1 is None:
        z1_ok = points[..., 2] > 0
    else:
        c1 = jnp.zeros((3,), points.dtype) if C1 is None else C1.reshape(3)
        z1_ok = jnp.einsum(
            "j,pnj->pn", R1[2], points - c1, precision=HI) > 0
    r3 = Rs[:, 2, :]                                 # (4, 3)
    v = points - Cs[:, None, :]
    z2_ok = jnp.einsum("pj,pnj->pn", r3, v, precision=HI) > 0
    ok = z1_ok & z2_ok
    if n_valid is not None:
        ok = ok & (jnp.arange(points.shape[1]) < n_valid)[None, :]
    return jnp.sum(ok, axis=-1)


def disambiguate_pose(
    K: jnp.ndarray,
    Cs: jnp.ndarray, Rs: jnp.ndarray,
    pts1: jnp.ndarray, pts2: jnp.ndarray,
    R1: jnp.ndarray = None, T1: jnp.ndarray = None,
    n_valid: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Triangulate under all 4 candidate poses (camera 1 at R1/T1) and pick
    the cheirality winner.  Returns (X (N,3), C, R, all_points (4,N,3), idx).
    ``n_valid`` masks bucket-padding rows out of the cheirality vote (pass
    a device scalar, not a Python int, so the bucketed programs stay
    shape-keyed).
    """
    if R1 is None:
        R1 = jnp.eye(3, dtype=K.dtype)
    if T1 is None:
        T1 = jnp.zeros((3,), K.dtype)

    def tri(args):
        C, R = args
        T2 = -jnp.matmul(R, C.reshape(3, 1), precision=HI)
        return triangulate_linear(K, R1, T1, R, T2, pts1, pts2)

    all_points = jax.lax.map(tri, (Cs, Rs))          # (4, N, 3)
    # camera 1's center for its depth test (C1 = -R1^T T1)
    C1 = -jnp.matmul(R1.T, T1.reshape(3, 1), precision=HI).reshape(3)
    counts = cheirality_counts(all_points, Cs, Rs, R1=R1, C1=C1,
                               n_valid=n_valid)
    best = jnp.argmax(counts)
    return all_points[best], Cs[best], Rs[best], all_points, best


def _point_residual(X, K, R1, C1, R2, C2, pt1, pt2):
    """4-vector reprojection residual, camera-CENTER convention
    (Triangulation.py:270-304)."""
    P1 = projection_matrix_RC(K, R1, C1)
    P2 = projection_matrix_RC(K, R2, C2)
    p1 = project(P1, X)
    p2 = project(P2, X)
    return jnp.concatenate([p1 - pt1, p2 - pt2])


@functools.partial(jax.jit, static_argnames=("n_iters",))
def triangulate_nonlinear(
    K: jnp.ndarray,
    R1: jnp.ndarray, C1: jnp.ndarray,
    R2: jnp.ndarray, C2: jnp.ndarray,
    pts1: jnp.ndarray, pts2: jnp.ndarray,
    X0: jnp.ndarray,
    n_iters: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point LM refinement, vmapped over all points in one launch.

    Returns (X_opt (N,3), initial squared errors (N,), final (N,)) — the
    per-point sum-of-squared residuals the reference prints the means of
    (Triangulation.py:327-329).
    """

    def refine(pt1, pt2, x0):
        fn = lambda X: _point_residual(
            X, K, R1, C1.reshape(3), R2, C2.reshape(3), pt1, pt2
        )
        return levenberg_marquardt(fn, x0, n_iters=n_iters)

    return jax.vmap(refine)(pts1, pts2, X0)


def triangulate_pair_bucketed(
    K, R1, C1, R2, C2, pts1_np, pts2_np, n_iters: int = 20,
):
    """Host wrapper: pad the point count to the next power of two, run the
    batched DLT + vmapped LM refinement, slice back — one accelerator
    compile per size bucket instead of one per (pair, count) shape
    (mirrors ransac_fundamental_bucketed; padding duplicates the LAST row
    (np.pad mode='edge'), whose result is discarded).  C1/C2 are camera CENTERS.  Returns
    (X_linear (n,3), X_refined (n,3)).

    The refinement runs from TWO inits — the parity DLT solution and the
    closed-form ray midpoint (:func:`triangulate_midpoint`) — in EVERY
    dtype: the f32 DLT init occasionally sends the LM into the
    at-infinity flat valley (|X| ~ 1e6; see the midpoint docstring), and
    inconsistent observations (wrong-but-epipolar matches) do the same
    even in f64, which at incremental-SfM scale poisons the PnP
    correspondence sets of every later camera.

    Per-point pick between the two refinements:

    - the midpoint-init result wins outright when its final residual is
      MEANINGFULLY lower (1% relative margin), so healthy points — both
      inits converge to the same optimum, residuals equal to ~ulp — keep
      the DLT-init output bit-for-bit (parity with the unbucketed path,
      pinned by test_triangulate_pair_bucketed_matches_unbucketed);
    - residual margin alone provably cannot catch the flat valley: at
      ~2-degree parallax the at-infinity solution fits the 4 nearly
      parallel-ray residuals as well as (sometimes better than) the true
      point, so a SCALE discriminant breaks near-ties — when the DLT-init
      point sits >100x farther from camera 1 than the midpoint-init point
      AND the midpoint residual is within 4x, the candidates disagree by
      two orders of magnitude in depth at comparable fit, which is the
      divergence signature and never fires for healthy points (there the
      two candidates coincide, ratio == 1)."""
    import numpy as np

    n = len(pts1_np)
    bucket = pow2_bucket(n)
    pad = bucket - n
    p1 = np.pad(np.asarray(pts1_np), ((0, pad), (0, 0)), mode="edge")
    p2 = np.pad(np.asarray(pts2_np), ((0, pad), (0, 0)), mode="edge")
    Kj = jnp.asarray(K)
    R1j, R2j = jnp.asarray(R1), jnp.asarray(R2)
    C1n = np.asarray(C1).reshape(3)
    C2n = np.asarray(C2).reshape(3)
    T1 = jnp.asarray(-np.asarray(R1) @ C1n)
    T2 = jnp.asarray(-np.asarray(R2) @ C2n)
    X_lin = triangulate_linear(
        Kj, R1j, T1, R2j, T2, jnp.asarray(p1), jnp.asarray(p2))
    C1j, C2j = jnp.asarray(C1n), jnp.asarray(C2n)
    p1j, p2j = jnp.asarray(p1), jnp.asarray(p2)
    X_a, _, fin_a = triangulate_nonlinear(
        Kj, R1j, C1j, R2j, C2j, p1j, p2j, X_lin, n_iters=n_iters,
    )
    X_mid = triangulate_midpoint(Kj, R1j, C1j, R2j, C2j, p1j, p2j)
    X_b, _, fin_b = triangulate_nonlinear(
        Kj, R1j, C1j, R2j, C2j, p1j, p2j, X_mid, n_iters=n_iters,
    )
    # best-of-two pick (see the docstring): 1% residual margin preserves
    # bit-parity for healthy points; the 100x camera-distance ratio is the
    # flat-valley discriminant residual margin alone cannot provide
    Xa = np.asarray(X_a)
    Xb = np.asarray(X_b)
    fa = np.asarray(fin_a)
    fb = np.asarray(fin_b)
    fa = np.where(np.isfinite(fa) & np.isfinite(Xa).all(axis=1), fa, np.inf)
    fb = np.where(np.isfinite(fb) & np.isfinite(Xb).all(axis=1), fb, np.inf)
    da = np.linalg.norm(Xa - C1n, axis=1)
    db = np.linalg.norm(Xb - C1n, axis=1)
    da = np.where(np.isfinite(da), da, np.inf)
    implausible_a = (da > 100.0 * np.maximum(db, 1e-9)) & (fb <= 4.0 * fa)
    pick_b = (fb < 0.99 * fa) | implausible_a
    X_opt = np.where(pick_b[:, None], Xb, Xa)
    return np.asarray(X_lin)[:n], X_opt[:n]


def reprojection_errors(
    K: jnp.ndarray, R: jnp.ndarray, C: jnp.ndarray,
    X: jnp.ndarray, pts: jnp.ndarray,
) -> jnp.ndarray:
    """Per-point squared reprojection error, camera-center convention —
    ``reprojection_error`` of Utils.py:86-106, batched."""
    P = projection_matrix_RC(K, R, C)
    proj = project(P, X)
    return jnp.sum((proj - pts) ** 2, axis=-1)


@functools.partial(jax.jit, static_argnames=("cleanup", "convention"))
def relative_pose_pairs(
    K: jnp.ndarray,
    F: jnp.ndarray,        # (P, 3, 3) fundamental matrices
    pts1: jnp.ndarray,     # (P, B, 2) matches, bucket-padded per pair
    pts2: jnp.ndarray,     # (P, B, 2)
    n_valid: jnp.ndarray,  # (P,) true match counts (masks the vote)
    cleanup: bool = True,
    convention: str = "hz",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pair-axis batched relative pose from F: E = K^T F K (-> optional
    essential cleanup) -> 4-candidate decomposition -> cheirality-voted
    disambiguation, vmapped over the pair axis.

    Why this exists: the global-init pose-graph build (sfm/pipeline.py)
    originally looped these ops per pair — ~6 eager dispatches x n_pairs,
    each paying the relay's round trip on a tunneled accelerator (measured
    round 5: 1,270 s of the 200-camera TPU pipeline's 2,864 s total was
    this loop over 1,373 pairs; the CPU control paid a similar 1,288 s in
    host dispatch overhead).  One batched call per (pair-chunk, match-
    bucket) replaces ~6 x chunk dispatches.  No reference counterpart
    (global averaging is an ADDITION; the per-pair ops it composes are
    cited at their definitions).  Results match the per-pair path to
    platform rounding (pinned by test_relative_pose_pairs_matches_loop).

    Returns (C_rel (P, 3), R_rel (P, 3, 3)).
    """
    from sfm_nerf_tpu.ops.epipolar import (
        cleanup_essential,
        decompose_essential,
        essential_from_fundamental,
    )

    def one(Fij, p1, p2, nv):
        E = essential_from_fundamental(K, Fij)
        if cleanup:
            E = cleanup_essential(E)
        Cs, Rs = decompose_essential(E, convention)
        _, C, R, _, _ = disambiguate_pose(K, Cs, Rs, p1, p2, n_valid=nv)
        return C, R

    return jax.vmap(one)(F, pts1, pts2, n_valid)
