"""Perspective-n-Point: linear DLT, RANSAC, quaternion LM refinement.

Parity with Phase1/PnP.py, TPU-shaped:

- LinearPnP (PnP.py:6-66): K^-1-normalized 2D points, 2Nx12 DLT system,
  orthonormalize R via SVD (R = U V^T), flip R when det<0 (the reference
  flips ONLY R, not T — replicated), scale-recover T = p4 / sigma_0,
  C = -R^T T.  Batched over hypothesis sets for RANSAC.
- PnPRANSAC (PnP.py:160-196): 10,000 iterations x 6-point samples; per-point
  SQUARED-pixel-error threshold 10 (i.e. ~3.16 px).  The reference's bare
  ``except:`` around degenerate samples becomes finite-ness masking.
- NonlinearPnP (PnP.py:198-245): 7-parameter (quaternion [x,y,z,w] +
  camera center) LM on per-point (err_x, err_y) residuals with the
  camera-center projection convention; quaternion renormalized inside the
  residual, exactly like the reference's scipy closure.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sfm_nerf_tpu.utils.buckets import pow2_bucket

from sfm_nerf_tpu.ops.linalg import (
    HI,
    homogenize,
    matrix_to_quat,
    quat_to_matrix,
    smallest_eigvec_of_normal,
)
from sfm_nerf_tpu.ops.lm import levenberg_marquardt
from sfm_nerf_tpu.ops.triangulation import (
    projection_matrix_RC,
    project,
    reprojection_errors,
)


def _dlt_projection(X3d, x2d, K, null_vec_fn):
    """Shared DLT body of both linear-PnP paths: K^-1 normalization of the
    2D side, Hartley conditioning of the 3D side, 2Nx12 row assembly, null
    vector via ``null_vec_fn``, denormalization, and majority-depth sign
    canonicalization.  Returns the projective (..., 3, 4) P; callers
    differ only in how they orthogonalize P[:, :3] into R.

    Conditioning (centroid -> origin, RMS radius -> 1): the raw DLT
    normal matrix reaches condition ~1e10 and in f32 BOTH eigensolvers
    return ~35 px poses (0.2% of minimal samples usable — measured; the
    round-1 "f32 PnP initialization" accuracy gap).  P is denormalized
    below, so callers see the same camera, just solved in a well-scaled
    basis.

    Sign: the null vector's global sign is arbitrary and C inherits it —
    the reference (Phase1/PnP.py:6-66) takes whatever sign LAPACK
    returns, and its R-only det-flip quirk (kept by both callers) is
    independent of this global sign.  DEVIATION, both paths, no switch:
    canonicalize by majority projective depth of the sample points, so
    every hypothesis (and the winner re-solve) is cheirality-consistent.
    eigh/Jacobi pick different — sometimes systematically unlucky —
    signs; a mirrored hypothesis scores ~0 inliers, and a mirrored
    winner re-solve poisons nonlinear PnP and the downstream BA rounds
    (the round-2 "BA mirror-flip divergence" fix).
    """
    Kinv = jnp.linalg.inv(K)
    xn = jnp.einsum("ij,...nj->...ni", Kinv, homogenize(x2d), precision=HI)
    x, y = xn[..., 0], xn[..., 1]
    cen = jnp.mean(X3d, axis=-2, keepdims=True)
    scale = jnp.sqrt(jnp.mean(
        jnp.sum((X3d - cen) ** 2, -1), -1, keepdims=True))
    scale = jnp.maximum(scale, 1e-12)
    Xn = (X3d - cen) / scale[..., None]
    X, Y, Z = Xn[..., 0], Xn[..., 1], Xn[..., 2]
    one = jnp.ones_like(X)
    zero = jnp.zeros_like(X)
    row1 = jnp.stack(
        [X, Y, Z, one, zero, zero, zero, zero, -x * X, -x * Y, -x * Z, -x], -1
    )
    row2 = jnp.stack(
        [zero, zero, zero, zero, X, Y, Z, one, -y * X, -y * Y, -y * Z, -y], -1
    )
    A = jnp.concatenate([row1, row2], axis=-2)      # (..., 2N, 12)
    p = null_vec_fn(A)
    P = p.reshape(*p.shape[:-1], 3, 4)
    # denormalize: X_norm_h = M X_h with M = [[I/s, -c/s], [0, 1]] -> P @ M
    Pl = P[..., :, :3] / scale[..., None, :]
    P = jnp.concatenate(
        [Pl, (P[..., :, 3] - jnp.einsum(
            "...ij,...j->...i", Pl, cen[..., 0, :], precision=HI))[..., None]],
        axis=-1)
    depth = jnp.einsum(
        "...j,...nj->...n", P[..., 2, :], homogenize(X3d), precision=HI)
    flip = jnp.sum(jnp.sign(depth), -1) < 0
    return jnp.where(flip[..., None, None], -P, P)


def linear_pnp(
    X3d: jnp.ndarray,    # (..., N, 3)
    x2d: jnp.ndarray,    # (..., N, 2) pixel coords
    K: jnp.ndarray,      # (3, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DLT pose -> (C (...,3), R (...,3,3)).  Batched over leading dims."""
    P = _dlt_projection(X3d, x2d, K, smallest_eigvec_of_normal)
    R_est = P[..., :, :3]
    U, D, Vt = jnp.linalg.svd(R_est)
    R = jnp.einsum("...ij,...jk->...ik", U, Vt, precision=HI)
    neg = jnp.linalg.det(R) < 0
    R = jnp.where(neg[..., None, None], -R, R)      # reference flips R only
    T = P[..., :, 3] / D[..., 0:1]                  # scale recovery
    C = -jnp.einsum("...ji,...j->...i", R, T, precision=HI)  # -R^T T
    return C, R


def linear_pnp_fast(
    X3d: jnp.ndarray, x2d: jnp.ndarray, K: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``linear_pnp`` on the fixed-sweep Jacobi path (hypothesis scoring
    only; the RANSAC winner re-solves with the LAPACK-grade version).  The
    12x12 null vector comes from jacobi_eigh_small and the R
    orthogonalization becomes the polar factor R_est V diag(1/sigma) V^T
    from eigh(R_est^T R_est) — no SVD call (XLA eigh/svd dominate the PnP
    hypothesis budget the same way they did F-RANSAC's, PERFORMANCE.md)."""
    from sfm_nerf_tpu.ops.linalg import (
        jacobi_eigh_small, smallest_eigvec_of_normal_fast,
    )

    P = _dlt_projection(X3d, x2d, K, smallest_eigvec_of_normal_fast)
    R_est = P[..., :, :3]
    RtR = jnp.einsum("...ji,...jk->...ik", R_est, R_est, precision=HI)
    evals, V = jacobi_eigh_small(RtR, sweeps=6)     # 3x3
    sigma = jnp.sqrt(jnp.maximum(evals, 0.0))
    # R = R_est V diag(1/sigma) V^T == U V^T (polar factor); a singular
    # hypothesis yields inf/nan here and is dropped by the finite mask
    Vs = V / jnp.maximum(sigma[..., None, :], 1e-30)
    Rp = jnp.einsum("...ij,...jk,...lk->...il", R_est, Vs, V, precision=HI)
    det = (
        Rp[..., 0, 0] * (Rp[..., 1, 1] * Rp[..., 2, 2]
                         - Rp[..., 1, 2] * Rp[..., 2, 1])
        - Rp[..., 0, 1] * (Rp[..., 1, 0] * Rp[..., 2, 2]
                           - Rp[..., 1, 2] * Rp[..., 2, 0])
        + Rp[..., 0, 2] * (Rp[..., 1, 0] * Rp[..., 2, 1]
                           - Rp[..., 1, 1] * Rp[..., 2, 0])
    )
    R = jnp.where((det < 0)[..., None, None], -Rp, Rp)  # reference R-only flip
    d0 = jnp.max(sigma, axis=-1)                    # largest singular value
    T = P[..., :, 3] / d0[..., None]
    C = -jnp.einsum("...ji,...j->...i", R, T, precision=HI)
    return C, R


class PnPRansacResult(NamedTuple):
    R: jnp.ndarray
    C: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _pnp_score_chunk_body(ck, X3d, x2d, K, threshold, scoring, n_pts,
                          n_valid, valid, chunk):
    """THE PnP-RANSAC chunk scorer — the single body behind the fixed path
    (``pnp_ransac``'s lax.map) and the adaptive driver
    (``_pnp_ransac_score_chunk``); mirrors
    ops/epipolar.py:_score_chunk_body.  Returns ``(scores (chunk,),
    gated squared reprojection errors (chunk, N))``.

    Duplicate-free draws (reference: np.random.choice replace=False,
    PnP.py:166): a repeated row makes the 12-unknown DLT underdetermined
    yet FINITE, so it scored normally — at a bucketed n_valid=8, 92% of
    with-replacement 6-draws contained a repeat, collapsing the effective
    iteration count ~13x."""
    from sfm_nerf_tpu.ops.epipolar import _ransac_score, draw_minimal_samples

    idx_chunk = draw_minimal_samples(ck, chunk, 6, n_pts, n_valid)
    C, R = linear_pnp_fast(X3d[idx_chunk], x2d[idx_chunk], K)  # Jacobi
    # per-point squared reprojection error under each hypothesis —
    # vmapped: one broadcasted (chunk, N) evaluation, not a sequential
    # per-hypothesis scan
    e = jax.vmap(
        lambda Ci, Ri: reprojection_errors(K, Ri, Ci, X3d, x2d)
    )(C, R)                                       # (chunk, N)
    e = jnp.where(valid, e, jnp.inf)
    score = _ransac_score(e, threshold, scoring)
    ok = (
        jnp.all(jnp.isfinite(C), axis=-1)
        & jnp.all(jnp.isfinite(R.reshape(R.shape[0], -1)), axis=-1)
    )
    return jnp.where(ok, score, -jnp.inf), e


def _pnp_winner(idx_best, X3d, x2d, K, threshold, valid):
    """Shared winner tail: LAPACK-grade re-solve of the winning minimal
    sample and its inlier set (fixed and adaptive paths)."""
    C, R = linear_pnp(X3d[idx_best], x2d[idx_best], K)
    e = reprojection_errors(K, R, C, X3d, x2d)
    inliers = (e < threshold) & valid
    return R, C, inliers


@functools.partial(jax.jit, static_argnames=("n_iters", "chunk", "scoring"))
def pnp_ransac(
    key: jax.Array,
    X3d: jnp.ndarray,     # (N, 3)
    x2d: jnp.ndarray,     # (N, 2)
    K: jnp.ndarray,
    n_iters: int = 10000,
    threshold: float = 10.0,
    chunk: int = 512,
    n_valid=None,         # dynamic true row count (rows >= n_valid = padding)
    scoring: str = "msac",
) -> PnPRansacResult:
    """Batched-hypothesis PnP RANSAC in one jitted call.

    ``n_valid`` supports shape bucketing (pnp_ransac_bucketed): with padded
    inputs, sampling draws only from the first ``n_valid`` rows and padded
    rows never count as inliers — bit-identical to the unpadded call.

    ``scoring='msac'`` ranks hypotheses by truncated-loss sum instead of
    the reference's raw count (PnP.py:160-180, ``'count'``) — raw counts
    leave near-ties that platform rounding flips; see
    ops/epipolar.py:_ransac_score."""
    n_pts = X3d.shape[0]
    valid = (
        jnp.ones((n_pts,), bool) if n_valid is None
        else jnp.arange(n_pts) < n_valid
    )
    n_chunks = (n_iters + chunk - 1) // chunk
    total = n_chunks * chunk
    chunk_keys = jax.random.split(key, n_chunks)

    def score_chunk(ck):
        scores, _ = _pnp_score_chunk_body(
            ck, X3d, x2d, K, threshold, scoring, n_pts, n_valid,
            valid, chunk)
        return scores

    scores = jax.lax.map(score_chunk, chunk_keys).reshape(total)
    best = jnp.argmax(scores)
    from sfm_nerf_tpu.ops.epipolar import draw_minimal_samples

    idx_best = draw_minimal_samples(
        chunk_keys[best // chunk], chunk, 6, n_pts, n_valid)[best % chunk]
    R, C, inliers = _pnp_winner(idx_best, X3d, x2d, K, threshold, valid)
    return PnPRansacResult(R, C, inliers, jnp.sum(inliers))


@functools.partial(jax.jit, static_argnames=("chunk", "scoring"))
def _pnp_ransac_score_chunk(
    ck, X3d, x2d, K, threshold, n_valid,
    chunk: int = 512, scoring: str = "msac",
):
    """One hypothesis chunk of PnP RANSAC for the adaptive driver —
    shares ``_pnp_score_chunk_body`` with the fixed path (same draw
    stream for the same per-chunk key).  Returns (best score,
    argmax-in-chunk, inlier count of the chunk best); mirrors
    ops/epipolar.py:_ransac_fundamental_score_chunk."""
    n_pts = X3d.shape[0]
    valid = (
        jnp.ones((n_pts,), bool) if n_valid is None
        else jnp.arange(n_pts) < n_valid
    )
    score, e = _pnp_score_chunk_body(
        ck, X3d, x2d, K, threshold, scoring, n_pts, n_valid, valid, chunk)
    b = jnp.argmax(score)
    count = jnp.sum(e[b] < threshold)
    return score[b], b, count


@functools.partial(jax.jit, static_argnames=("chunk",))
def _pnp_ransac_finalize(
    ck, best_in_chunk, X3d, x2d, K, threshold, n_valid, chunk: int = 512,
):
    """Winner re-solve (LAPACK-grade linear_pnp) for the adaptive driver."""
    from sfm_nerf_tpu.ops.epipolar import draw_minimal_samples

    n_pts = X3d.shape[0]
    valid = (
        jnp.ones((n_pts,), bool) if n_valid is None
        else jnp.arange(n_pts) < n_valid
    )
    idx_best = draw_minimal_samples(
        ck, chunk, 6, n_pts, n_valid)[best_in_chunk]
    R, C, inliers = _pnp_winner(idx_best, X3d, x2d, K, threshold, valid)
    return R, C, inliers, jnp.sum(inliers)


def pnp_ransac_adaptive(
    key: jax.Array,
    X3d: jnp.ndarray,
    x2d: jnp.ndarray,
    K: jnp.ndarray,
    confidence: float = 0.999,
    max_iters: int = 10000,
    threshold: float = 10.0,
    chunk: int = 512,
    n_valid=None,
    scoring: str = "msac",
    min_iters=None,
):
    """PnP RANSAC with the confidence-based early exit (H&Z Alg. 4.5) —
    the production alternative to the reference's fixed iteration count
    (PnP.py:160-180).  Same host-driven chunk structure, stopping rule,
    and prefix-of-the-fixed-path draw-stream property as
    ops/epipolar.py:ransac_fundamental_adaptive (sample size 6).

    Returns ``(result, iters_scored)``."""
    import numpy as np

    from sfm_nerf_tpu.ops.epipolar import adaptive_trials_needed

    n_chunks = max(1, (max_iters + chunk - 1) // chunk)
    chunk_keys = jax.random.split(key, n_chunks)
    if min_iters is None:
        min_iters = min(2 * chunk, n_chunks * chunk)
    nv = X3d.shape[0] if n_valid is None else int(n_valid)
    nv_arr = None if n_valid is None else jnp.asarray(n_valid)

    best_score, best_iter = -np.inf, 0
    needed = float(max_iters)
    done = 0
    for c in range(n_chunks):
        s, b, cnt = _pnp_ransac_score_chunk(
            chunk_keys[c], X3d, x2d, K, threshold, nv_arr,
            chunk=chunk, scoring=scoring,
        )
        s = float(s)
        done += chunk
        if s > best_score:
            best_score = s
            best_iter = c * chunk + int(b)
            needed = adaptive_trials_needed(int(cnt), nv, 6, confidence)
        if done >= max(needed, min_iters):
            break

    R, C, inliers, n_inl = _pnp_ransac_finalize(
        chunk_keys[best_iter // chunk], best_iter % chunk,
        X3d, x2d, K, threshold, nv_arr, chunk=chunk,
    )
    # report at most the cap (see ransac_fundamental_adaptive)
    return PnPRansacResult(R, C, inliers, n_inl), min(done, max_iters)


@functools.partial(
    jax.jit, static_argnames=("max_iters", "chunk", "scoring")
)
def pnp_ransac_adaptive_device(
    key: jax.Array,
    X3d: jnp.ndarray,
    x2d: jnp.ndarray,
    K: jnp.ndarray,
    confidence: float = 0.999,
    max_iters: int = 10000,
    threshold: float = 10.0,
    chunk: int = 512,
    n_valid=None,
    scoring: str = "msac",
    min_iters=None,
) -> Tuple[PnPRansacResult, jnp.ndarray]:
    """Adaptive PnP RANSAC with the H&Z confidence exit INSIDE the launch
    (``lax.while_loop`` over fixed-shape hypothesis chunks) — the
    device-side counterpart of :func:`pnp_ransac_adaptive`, mirroring
    ops/epipolar.py:ransac_fundamental_adaptive_device: one static-shaped
    program instead of one tunnel round-trip per chunk.  Same chunk-key
    stream, scorer, update rule and stopping comparison as the host
    driver, so winners match for the same key (pinned by test).  Returns
    ``(result, iters_scored — traced scalar)``."""
    from sfm_nerf_tpu.ops.epipolar import (
        _adaptive_trials_needed_device, draw_minimal_samples,
    )

    n_pts = X3d.shape[0]
    valid = (
        jnp.ones((n_pts,), bool) if n_valid is None
        else jnp.arange(n_pts) < n_valid
    )
    n_chunks = max(1, (max_iters + chunk - 1) // chunk)
    chunk_keys = jax.random.split(key, n_chunks)
    if min_iters is None:
        min_iters = min(2 * chunk, n_chunks * chunk)
    ftype = jnp.asarray(0.0).dtype        # f64 under x64, else f32
    nv = jnp.asarray(n_pts if n_valid is None else n_valid)
    min_iters_f = jnp.asarray(float(min_iters), ftype)
    sdt = X3d.dtype

    def cond(st):
        c, bs, bi, nd = st
        done = (c * chunk).astype(ftype)
        return (c < n_chunks) & (done < jnp.maximum(nd, min_iters_f))

    def body(st):
        c, bs, bi, nd = st
        score, e = _pnp_score_chunk_body(
            chunk_keys[c], X3d, x2d, K, threshold, scoring, n_pts,
            None if n_valid is None else nv, valid, chunk)
        b = jnp.argmax(score)
        s = score[b]
        cnt = jnp.sum(e[b] < threshold)
        improved = s > bs
        bi = jnp.where(improved, c * chunk + b.astype(jnp.int32), bi)
        nd = jnp.where(
            improved,
            _adaptive_trials_needed_device(cnt, nv, confidence, ftype,
                                           sample_size=6), nd)
        return c + 1, jnp.maximum(s, bs), bi, nd

    init = (jnp.asarray(0, jnp.int32), jnp.asarray(-jnp.inf, sdt),
            jnp.asarray(0, jnp.int32), jnp.asarray(float(max_iters), ftype))
    c_fin, _, best_iter, _ = jax.lax.while_loop(cond, body, init)
    iters_scored = jnp.minimum(c_fin * chunk, max_iters)

    idx_best = draw_minimal_samples(
        chunk_keys[best_iter // chunk], chunk, 6, n_pts,
        None if n_valid is None else nv)[best_iter % chunk]
    R, C, inliers = _pnp_winner(idx_best, X3d, x2d, K, threshold, valid)
    return (PnPRansacResult(R, C, inliers, jnp.sum(inliers)), iters_scored)


def pnp_ransac_bucketed(
    key: jax.Array,
    X3d_np, x2d_np, K,
    n_iters: int = 10000,
    threshold: float = 10.0,
    chunk: int = 512,
    scoring: str = "msac",
    confidence: float = 0.0,
    iters_out=None,
    adaptive_device=None,
) -> PnPRansacResult:
    """Host wrapper: pad the correspondence count to the next power of two
    and call the jitted core with the true count — one accelerator compile
    per size bucket instead of one per registered camera (remote compiles
    cost minutes; mirrors ransac_fundamental_bucketed).

    ``confidence > 0`` routes to the adaptive driver with ``n_iters`` as
    the cap; ``iters_out`` (optional list) receives the scored count.
    ``adaptive_device`` picks host chunk loop vs device ``lax.while_loop``
    (``None`` auto-selects the device loop on non-CPU backends), exactly
    as in ransac_fundamental_bucketed."""
    import numpy as np

    n = len(X3d_np)
    bucket = pow2_bucket(n)
    pad = bucket - n
    X = np.pad(np.asarray(X3d_np), ((0, pad), (0, 0)), mode="edge")
    x = np.pad(np.asarray(x2d_np), ((0, pad), (0, 0)), mode="edge")
    if confidence > 0.0:
        if adaptive_device is None:
            adaptive_device = jax.default_backend() != "cpu"
        if adaptive_device:
            res, used = pnp_ransac_adaptive_device(
                key, jnp.asarray(X), jnp.asarray(x), jnp.asarray(K),
                confidence=confidence, max_iters=n_iters,
                threshold=threshold, chunk=chunk,
                n_valid=jnp.asarray(n), scoring=scoring,
            )
            used = int(used)
        else:
            res, used = pnp_ransac_adaptive(
                key, jnp.asarray(X), jnp.asarray(x), jnp.asarray(K),
                confidence=confidence, max_iters=n_iters,
                threshold=threshold, chunk=chunk, n_valid=n,
                scoring=scoring,
            )
        if iters_out is not None:
            iters_out.append(used)
    else:
        res = pnp_ransac(
            key, jnp.asarray(X), jnp.asarray(x), jnp.asarray(K),
            n_iters=n_iters, threshold=threshold, chunk=chunk,
            n_valid=jnp.asarray(n), scoring=scoring,
        )
    return PnPRansacResult(res.R, res.C, res.inliers[:n], res.n_inliers)


def _pnp_dlt_np(X3d, x2d, K):
    """Numpy-f64 twin of ``_dlt_projection`` (same conditioning, null
    vector, denormalization, and majority-depth sign canonicalization) —
    for the host rescue path, which must be float64 regardless of the
    process-wide ``jax_enable_x64`` state (flipping that flag mid-process
    on an accelerator run is unsupported).  Batched over leading dims."""
    import numpy as np

    Kinv = np.linalg.inv(K)
    xh = np.concatenate([x2d, np.ones_like(x2d[..., :1])], axis=-1)
    xn = np.einsum("ij,...nj->...ni", Kinv, xh)
    x, y = xn[..., 0], xn[..., 1]
    cen = np.mean(X3d, axis=-2, keepdims=True)
    scale = np.sqrt(np.mean(
        np.sum((X3d - cen) ** 2, -1), -1, keepdims=True))
    scale = np.maximum(scale, 1e-12)
    Xn = (X3d - cen) / scale[..., None]
    X, Y, Z = Xn[..., 0], Xn[..., 1], Xn[..., 2]
    one = np.ones_like(X)
    zero = np.zeros_like(X)
    row1 = np.stack(
        [X, Y, Z, one, zero, zero, zero, zero, -x * X, -x * Y, -x * Z, -x], -1
    )
    row2 = np.stack(
        [zero, zero, zero, zero, X, Y, Z, one, -y * X, -y * Y, -y * Z, -y], -1
    )
    A = np.concatenate([row1, row2], axis=-2)       # (..., 2N, 12)
    p = np.linalg.svd(A)[2][..., -1, :]
    P = p.reshape(*p.shape[:-1], 3, 4)
    Pl = P[..., :, :3] / scale[..., None, :]
    P = np.concatenate(
        [Pl, (P[..., :, 3] - np.einsum(
            "...ij,...j->...i", Pl, cen[..., 0, :]))[..., None]],
        axis=-1)
    Xh = np.concatenate([X3d, np.ones_like(X3d[..., :1])], axis=-1)
    depth = np.einsum("...j,...nj->...n", P[..., 2, :], Xh)
    flip = np.sum(np.sign(depth), -1) < 0
    return np.where(flip[..., None, None], -P, P)


def _decompose_P_np(P):
    """Numpy twin of ``linear_pnp``'s P -> (C, R) tail (SVD
    orthonormalization, reference R-only det flip, sigma_0 scale
    recovery)."""
    import numpy as np

    U, D, Vt = np.linalg.svd(P[..., :, :3])
    R = U @ Vt
    neg = np.linalg.det(R) < 0
    R = np.where(neg[..., None, None], -R, R)
    T = P[..., :, 3] / D[..., 0:1]
    C = -np.einsum("...ji,...j->...i", R, T)
    return C, R


def _reproj_sq_np(K, R, C, X3d, x2d):
    """Squared pixel reprojection error under KR[I|-C], numpy twin of
    ``reprojection_errors``.  R (..., 3, 3), C (..., 3) -> (..., N)."""
    import numpy as np

    KR = np.einsum("ij,...jk->...ik", K, R)
    t = -np.einsum("...ij,...j->...i", KR, C)
    proj = np.einsum("...ij,nj->...ni", KR, X3d) + t[..., None, :]
    uv = proj[..., :2] / np.where(
        np.abs(proj[..., 2:3]) > 1e-300, proj[..., 2:3], np.inf)
    return np.sum((uv - x2d) ** 2, axis=-1)


def pnp_ransac_f64_host(
    seed: int, X3d_np, x2d_np, K,
    n_iters: int = 10000, threshold: float = 10.0, scoring: str = "msac",
    chunk: int = 2048,
) -> PnPRansacResult:
    """Pure-numpy float64 PnP RANSAC — the host RESCUE path for the
    measured f32 consensus collapses at scale (198/200 and 492/500
    registered in PERFORMANCE.md's round-5 tables: the DLT hypothesis
    space degrades in f32 for a handful of deep-chain cameras and the
    inlier gate fails).  Runs in f64 regardless of backend/x64 state, so
    an accelerator pipeline can fall back per-camera at host cost (~1-2 s
    for 10k iterations) instead of losing the camera.  Same algorithm as
    ``pnp_ransac`` (reference PnPRANSAC, Phase1/PnP.py:160-196): 6-point
    duplicate-free samples, squared-px threshold, MSAC/count scoring,
    LAPACK winner re-solve."""
    import numpy as np

    X = np.asarray(X3d_np, np.float64)
    x = np.asarray(x2d_np, np.float64)
    Kn = np.asarray(K, np.float64)
    n = len(X)
    if n < 6:
        z = np.zeros(n, bool)
        return PnPRansacResult(np.eye(3), np.zeros(3), z, np.asarray(0))
    rng = np.random.default_rng(seed)
    if n == 6:
        idx = np.arange(6)[None]
    else:
        idx = np.argpartition(rng.random((n_iters, n)), 6, axis=1)[:, :6]
    best_score, best_iter = -np.inf, 0
    for s in range(0, len(idx), chunk):
        sl = idx[s:s + chunk]
        P = _pnp_dlt_np(X[sl], x[sl], Kn)
        C, R = _decompose_P_np(P)
        e = _reproj_sq_np(Kn, R, C, X, x)           # (chunk, N)
        e = np.where(np.isnan(e), np.inf, e)
        if scoring == "msac":
            score = -np.minimum(e, threshold).sum(-1)
        else:
            score = (e < threshold).sum(-1).astype(np.float64)
        finite = (np.isfinite(C).all(-1)
                  & np.isfinite(R.reshape(len(R), -1)).all(-1))
        score = np.where(finite, score, -np.inf)
        b = int(np.argmax(score))
        if score[b] > best_score:
            best_score, best_iter = float(score[b]), s + b
    Pw = _pnp_dlt_np(X[idx[best_iter]], x[idx[best_iter]], Kn)
    Cw, Rw = _decompose_P_np(Pw)
    ew = _reproj_sq_np(Kn, Rw, Cw, X, x)
    inl = np.where(np.isnan(ew), np.inf, ew) < threshold
    return PnPRansacResult(Rw, Cw, inl, np.asarray(int(inl.sum())))


def nonlinear_pnp_bucketed(
    K, R_init, C_init, X3d_np, x2d_np, weights_np, n_iters: int = 50,
):
    """Bucketed quaternion-LM refinement: padded rows get weight 0, which
    the masked residual already supports — bit-identical to unpadded."""
    import numpy as np

    n = len(X3d_np)
    bucket = pow2_bucket(n)
    pad = bucket - n
    X = np.pad(np.asarray(X3d_np), ((0, pad), (0, 0)), mode="edge")
    x = np.pad(np.asarray(x2d_np), ((0, pad), (0, 0)), mode="edge")
    w = np.pad(np.asarray(weights_np), (0, pad))
    return nonlinear_pnp(
        jnp.asarray(K), R_init, C_init, jnp.asarray(X), jnp.asarray(x),
        weights=jnp.asarray(w), n_iters=n_iters,
    )


def reprojection_error_mean_px(K, R, C, X3d, x2d, weights=None) -> jnp.ndarray:
    """Mean EUCLIDEAN pixel error (reprojectionErrorPnP, PnP.py:132-158)."""
    P = projection_matrix_RC(K, R, C)
    proj = project(P, X3d)
    err = jnp.linalg.norm(proj - x2d, axis=-1)
    if weights is None:
        return jnp.mean(err)
    w = weights.astype(err.dtype)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def nonlinear_pnp(
    K: jnp.ndarray,
    R_init: jnp.ndarray,
    C_init: jnp.ndarray,
    X3d: jnp.ndarray,
    x2d: jnp.ndarray,
    weights: jnp.ndarray = None,
    n_iters: int = 50,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quaternion+center LM pose refinement -> (C, R, rms_px).

    ``weights`` (N,) 0/1 restricts the residual to RANSAC inliers with static
    shapes (the reference passes the inlier subset; masked residuals are the
    fixed-shape equivalent).
    """
    if weights is None:
        weights = jnp.ones(X3d.shape[0], X3d.dtype)
    q0 = matrix_to_quat(R_init)
    params0 = jnp.concatenate([q0, C_init.reshape(3)])

    def residual(params):
        q = params[:4]
        C = params[4:]
        R = quat_to_matrix(q)                         # renormalizes q
        P = projection_matrix_RC(K, R, C)
        proj = project(P, X3d)
        r = (proj - x2d) * weights[:, None]
        return r.reshape(-1)

    params, _, final_cost = levenberg_marquardt(
        residual, params0, n_iters=n_iters
    )
    q, C = params[:4], params[4:]
    R = quat_to_matrix(q)
    n_eff = jnp.maximum(jnp.sum(weights), 1.0)
    rms = jnp.sqrt(final_cost / (2.0 * n_eff))
    return C, R, rms
