"""Epipolar geometry: 8-point fundamental matrix, Sampson scoring, RANSAC,
essential matrix, pose decomposition.

Algorithmic parity with Phase1/Fundamental.py, re-shaped for TPU:

- the reference's 50,000-iteration Python RANSAC loop (Fundamental.py:95-129,
  two LAPACK SVDs per iteration) becomes a handful of device launches:
  hypothesis minimal-sample gathers are batched, the 8-point solve is a
  batched 9x9 eigendecomposition, and Sampson scoring is one
  (chunk, N) broadcast per hypothesis chunk (lax.map bounds peak memory);
- the constraint row layout [x1x2, x1y2, x1, y1x2, y1y2, y1, x2, y2, 1]
  (Fundamental.py:20) and the Sampson variant with pre-normalized epipolar
  lines (Fundamental.py:104-116) are replicated exactly, quirks included;
- minimal samples are drawn WITHOUT replacement (vectorized sparse
  Fisher-Yates, see draw_minimal_samples), matching the reference's
  ``np.random.choice(..., replace=False)``; a repeated-row sample would
  solve a rank-deficient system whose null vector is finite garbage that
  scores normally, so replacement draws silently wasted ~13% of
  hypotheses at N=200 (92% at a bucketed n_valid=8).  Residual
  degeneracies (non-finite F) are additionally masked to -inf.
- ``ransac_fundamental_adaptive`` adds the H&Z Alg. 4.5 confidence-based
  early exit (host-driven at chunk granularity; the device program stays
  static-shaped) — the production alternative to the reference's fixed
  50,000 iterations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sfm_nerf_tpu.utils.buckets import pow2_bucket

from sfm_nerf_tpu.ops.linalg import HI, homogenize, smallest_eigvec_of_normal


def draw_minimal_samples(key, n_hyp: int, k: int, n_pts: int, n_valid=None):
    """(n_hyp, k) duplicate-free minimal-sample indices into rows
    ``[0, n_valid)`` — the batched analog of the reference's
    ``np.random.choice(N, k, replace=False)`` (Fundamental.py:99,
    PnP.py:166).  A repeated-row sample would solve a rank-deficient
    system whose null vector is finite garbage that scores normally, so
    with-replacement draws silently wasted ~13% of hypotheses at N=200
    (92% at a bucketed n_valid=8).

    Vectorized SPARSE FISHER-YATES: per hypothesis, k randints
    ``j_i ~ U[i, n_valid)`` plus an O(k^2) register-resident virtual-swap
    map (the classic ``m[j] = m.get(i, i)`` reservoir trick, unrolled —
    k <= 8, so the "map" is k compare/selects per lookup).  Exactly
    uniform over k-permutations, hence over k-subsets.  Cost is
    independent of the point-set size N; the first masked-top-k
    implementation generated (n_hyp, N) uniforms per chunk and cost 43x
    more at the 1024-bucket (57 ms vs 1.3 ms per 1024-hypothesis chunk
    on CPU — it dominated the whole refine stage, 362 s vs 70 s recorded
    pipeline total).

    BUCKET-INVARIANT BY CONSTRUCTION: the draw shape depends only on
    (n_hyp, k) and the values only on ``n_valid``, so padding the point
    set to a bucket size cannot change which rows a hypothesis samples.
    Valid rows must form a PREFIX (rows [0, n_valid)) — which is how
    every bucketed wrapper pads.  Degenerate ``n_valid < k`` draws from
    the first k rows (the minimal solve is underdetermined there anyway;
    the reference's np.random.choice would raise)."""
    nv = jnp.asarray(n_pts if n_valid is None else n_valid, jnp.int32)
    nv = jnp.maximum(nv, k)
    lo = jnp.arange(k, dtype=jnp.int32)
    j = jax.random.randint(key, (n_hyp, k), lo, nv)

    def lookup(pos, mpos, mval):
        # current a[pos] under the recorded swaps; later slots win (they
        # are more recent writes), never-written slots hold pos == -1
        v = pos
        for t in range(k):
            v = jnp.where(mpos[:, t] == pos, mval[:, t], v)
        return v

    mpos = jnp.full((n_hyp, k), -1, jnp.int32)
    mval = jnp.zeros((n_hyp, k), jnp.int32)
    outs = []
    for i in range(k):
        # randint is int64 under x64 — cast at the write sites (values are
        # < 2^31 row indices) so the int32 swap-map scatters stay exact
        ji = j[:, i].astype(jnp.int32)
        outs.append(lookup(ji, mpos, mval))          # out[i] = a[j]
        ai = lookup(jnp.full_like(ji, i), mpos, mval).astype(jnp.int32)
        mpos = mpos.at[:, i].set(ji)                 # a[j] = a[i]
        mval = mval.at[:, i].set(ai)
    return jnp.stack(outs, axis=-1)


def normalization_matrix(
    points: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Similarity transform: centroid -> origin, RMS distance -> sqrt(2)
    (Phase1/Fundamental.py:39-58).  ``points[..., N, 2]`` -> ``[..., 3, 3]``.
    ``mask[..., N]`` restricts the statistics to valid rows (padded input)."""
    if mask is None:
        centroid = jnp.mean(points, axis=-2)
        d2 = jnp.sum((points - centroid[..., None, :]) ** 2, axis=-1)
        rms = jnp.sqrt(jnp.mean(d2, axis=-1))
    else:
        w = mask.astype(points.dtype)
        n = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
        centroid = jnp.sum(points * w[..., None], axis=-2) / n[..., None]
        d2 = jnp.sum((points - centroid[..., None, :]) ** 2, axis=-1) * w
        rms = jnp.sqrt(jnp.sum(d2, axis=-1) / n)
    s = jnp.sqrt(2.0) / rms
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, zero, -s * centroid[..., 0]], -1),
            jnp.stack([zero, s, -s * centroid[..., 1]], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    return T


def _constraint_rows(pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 9) epipolar constraint matrix, STANDARD row layout fitting
    h2^T F h1 = 0: [x2x1, x2y1, x2, y2x1, y2y1, y2, x1, y1, 1].

    DOCUMENTED DEVIATION from the reference: Fundamental.py:20 builds the
    TRANSPOSED layout (fitting h1^T F h2 = 0) while its own Sampson scorer
    (:104-116, d = (h2 . F h1)^2) and denormalization (:135-137,
    T2^T F T1) assume the standard form — an internal inconsistency that is
    benign on the reference's near-pure-translation dataset (F^T ~ -F there)
    but produces 50-70 px reprojection errors on general motion (measured on
    synthetic scenes with ~17 deg relative yaw, vs 2-3 px for the consistent
    form).  We implement the form the rest of the reference assumes.
    """
    x1, y1 = pts1[..., 0], pts1[..., 1]
    x2, y2 = pts2[..., 0], pts2[..., 1]
    one = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], -1
    )


def eight_point(pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """Least-squares F from ``pts1/pts2 [..., N, 2]`` with rank-2 enforcement
    and F[2,2]=1 normalization (Fundamental.py:4-37).  Batched over leading
    dims."""
    A = _constraint_rows(pts1, pts2)
    f = smallest_eigvec_of_normal(A)
    F = f.reshape(*f.shape[:-1], 3, 3)
    # rank-2: zero the smallest singular value (batched 3x3 SVD)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    F = jnp.einsum("...ij,...j,...jk->...ik", U, S, Vt, precision=HI)
    return F / F[..., 2:3, 2:3]


def eight_point_fast(pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """``eight_point`` with both decompositions on the fixed-sweep Jacobi
    path (ops/linalg.py:jacobi_eigh_small): the 9x9 null vector AND the
    rank-2 enforcement, which becomes F - (F v3) v3^T with v3 the smallest
    right-singular vector from eigh(F^T F) — no SVD call.  XLA's general
    eigh/svd cost ~18.8 ms per 1024-hypothesis chunk on v5e (89% of the
    F-RANSAC budget, PERFORMANCE.md); this path exists for the
    hypothesis-scoring loops, the winner re-estimation keeps the
    LAPACK-grade ``eight_point``."""
    from sfm_nerf_tpu.ops.linalg import (
        jacobi_eigh_small, smallest_eigvec_of_normal_fast,
    )

    A = _constraint_rows(pts1, pts2)
    f = smallest_eigvec_of_normal_fast(A)
    F = f.reshape(*f.shape[:-1], 3, 3)
    FtF = jnp.einsum("...ji,...jk->...ik", F, F, precision=HI)
    evals, V = jacobi_eigh_small(FtF, sweeps=6)
    sel = jax.nn.one_hot(jnp.argmin(evals, -1), 3, dtype=V.dtype)
    v3 = jnp.einsum("...ij,...j->...i", V, sel, precision=HI)  # no bf16
    Fv3 = jnp.einsum("...ij,...j->...i", F, v3, precision=HI)
    F = F - Fv3[..., :, None] * v3[..., None, :]
    return F / F[..., 2:3, 2:3]


def weighted_eight_point(
    pts1: jnp.ndarray, pts2: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """F from a weighted point set — used to re-estimate on RANSAC inliers
    with static shapes (0/1 weights select the subset; the normal matrix of
    the masked rows equals the subset's)."""
    A = _constraint_rows(pts1, pts2) * weights[..., None]
    f = smallest_eigvec_of_normal(A)
    F = f.reshape(*f.shape[:-1], 3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    F = jnp.einsum("...ij,...j,...jk->...ik", U, S, Vt, precision=HI)
    return F / F[..., 2:3, 2:3]


def sampson_distance(
    F: jnp.ndarray, h1: jnp.ndarray, h2: jnp.ndarray
) -> jnp.ndarray:
    """Reference's Sampson variant (Fundamental.py:104-116): epipolar lines
    Fx1 = F h1^T and Fx2 = F h2^T are first L2-normalized over their first
    two components, then d = (h2 . Fx1)^2 / (Fx1_0^2+Fx1_1^2+Fx2_0^2+Fx2_1^2)
    — the denominator equals 2 after normalization; formula replicated
    verbatim (consistent with our standard h2^T F h1 = 0 fit; see
    _constraint_rows for the reference's layout inconsistency).

    ``F[...,3,3]``, ``h1/h2[N,3]`` -> ``[..., N]``.
    """
    Fx1 = jnp.einsum("...ij,nj->...ni", F, h1, precision=HI)   # lines in img2 coords
    Fx2 = jnp.einsum("...ij,nj->...ni", F, h2, precision=HI)
    n1 = jnp.linalg.norm(Fx1[..., :2], axis=-1, keepdims=True)
    n2 = jnp.linalg.norm(Fx2[..., :2], axis=-1, keepdims=True)
    Fx1 = Fx1 / (n1 + 1e-32)
    Fx2 = Fx2 / (n2 + 1e-32)
    num = jnp.sum(h2 * Fx1, axis=-1) ** 2
    den = (
        Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Fx2[..., 0] ** 2 + Fx2[..., 1] ** 2
    )
    return num / den


def _ransac_score(d: jnp.ndarray, threshold: float, scoring: str) -> jnp.ndarray:
    """Per-hypothesis score (HIGHER is better) from gated residuals
    ``d[..., N]``.  'msac': negative sum of threshold-truncated residuals
    (padded rows carry gate(d)=inf -> truncated to the constant
    ``threshold``, a hypothesis-independent offset).  'count': the
    reference's raw inlier count (Fundamental.py:125-129)."""
    if scoring == "msac":
        # NaN residuals (0/0 Sampson on degenerate rows) count as outliers
        # rather than poisoning the hypothesis sum
        d = jnp.where(jnp.isnan(d), jnp.inf, d)
        return -jnp.sum(jnp.minimum(d, threshold), axis=-1)
    if scoring == "count":
        return jnp.sum(d < threshold, axis=-1).astype(d.dtype)
    raise ValueError(f"unknown RANSAC scoring '{scoring}'")


class RansacResult(NamedTuple):
    F: jnp.ndarray            # (3,3) denormalized fundamental matrix
    inliers: jnp.ndarray      # (N,) bool mask
    n_inliers: jnp.ndarray    # scalar int
    best_iter: jnp.ndarray    # scalar int (winning hypothesis index)


def _ransac_prep(pts1, pts2, normalize, valid):
    """Shared head of every F-RANSAC entry point: Hartley-normalize (or
    not) and homogenize.  Returns (T1, T2, p1, p2, h1, h2)."""
    if normalize:
        T1 = normalization_matrix(pts1, valid)
        T2 = normalization_matrix(pts2, valid)
        h1 = jnp.matmul(homogenize(pts1), T1.T, precision=HI)
        h2 = jnp.matmul(homogenize(pts2), T2.T, precision=HI)
        p1, p2 = h1[..., :2], h2[..., :2]
    else:
        T1 = T2 = jnp.eye(3, dtype=pts1.dtype)
        p1, p2 = pts1, pts2
        h1, h2 = homogenize(pts1), homogenize(pts2)
    return T1, T2, p1, p2, h1, h2


def _ransac_winner(idx_best, T1, T2, p1, p2, h1, h2, threshold,
                   normalize, valid):
    """Shared tail of every F-RANSAC entry point: LAPACK-grade re-solve of
    the winning minimal sample, inlier set, all-inlier re-estimation
    (Fundamental.py:133-137), denormalization."""
    Fb = eight_point(p1[idx_best], p2[idx_best])
    d = sampson_distance(Fb, h1, h2)
    d = d if valid is None else jnp.where(valid, d, jnp.inf)
    inliers = d < threshold
    F = weighted_eight_point(p1, p2, inliers.astype(p1.dtype))
    if normalize:
        F = jnp.matmul(jnp.matmul(T2.T, F, precision=HI), T1, precision=HI)
    return F, inliers


def _score_chunk_body(ck, p1, p2, h1, h2, threshold, scoring, n_pts,
                      n_valid, valid, chunk):
    """THE F-RANSAC chunk scorer — the single body behind the fixed path
    (``ransac_fundamental``'s lax.map), the adaptive driver
    (``_ransac_fundamental_score_chunk``), and the hypothesis-sharded path
    (parallel/ransac.py).  One copy is what keeps the documented
    adaptive-is-a-prefix-of-the-fixed-run and sharded-bit-equality
    properties robust to future edits (both are also pinned by tests).
    Returns ``(scores (chunk,), gated Sampson distances (chunk, N))``."""
    idx_chunk = draw_minimal_samples(ck, chunk, 8, n_pts, n_valid)
    F = eight_point_fast(p1[idx_chunk], p2[idx_chunk])  # Jacobi path
    d = sampson_distance(F, h1, h2)                     # (chunk, N)
    d = d if valid is None else jnp.where(valid, d, jnp.inf)
    score = _ransac_score(d, threshold, scoring)
    # belt-and-braces mask: draws are duplicate-free now, but other
    # degeneracies (collinear samples at pathological precision) can
    # still produce non-finite F
    ok = jnp.all(jnp.isfinite(F.reshape(F.shape[0], -1)), axis=-1)
    return jnp.where(ok, score, -jnp.inf), d


@functools.partial(
    jax.jit, static_argnames=("n_iters", "normalize", "chunk", "scoring")
)
def ransac_fundamental(
    key: jax.Array,
    pts1: jnp.ndarray,        # (N, 2) pixel coords
    pts2: jnp.ndarray,        # (N, 2)
    n_iters: int = 50000,
    threshold: float = 5e-4,
    normalize: bool = True,
    chunk: int = 1024,
    n_valid: Optional[jnp.ndarray] = None,
    scoring: str = "msac",
) -> RansacResult:
    """RANSAC F-estimation (Fundamental.py:60-139), one jitted call.

    Scoring runs in ``chunk``-sized hypothesis batches under lax.map so peak
    memory is (chunk x N) instead of (n_iters x N).  After the argmax, F is
    re-estimated on all inliers of the best hypothesis and denormalized
    ``T2^T F T1`` (Fundamental.py:133-137).

    ``n_valid`` (traced scalar) enables shape bucketing on accelerators:
    pass pts padded to a bucket size and the true count — minimal samples
    draw only from valid rows, padded rows can't score as inliers, and the
    compiled program is reused across pairs of different sizes.

    ``scoring='msac'`` (default) ranks hypotheses by the sum of
    THRESHOLD-TRUNCATED Sampson distances (Torr & Zisserman's MSAC)
    instead of the reference's raw inlier count (Fundamental.py:125-129,
    ``scoring='count'``).  Raw counts leave dozens of near-tied hypotheses
    at the top, so one ulp of cross-platform rounding flips the argmax
    winner — measured swings of 506-574 final inliers on the SAME pair /
    key between TPU and CPU runs of the bundled data.  The truncated-loss
    sum is continuous in the residuals, so near-tied counts are broken by
    inlier quality and the winner is platform-stable (and strictly better
    ranked).  Reporting is unchanged: ``inliers``/``n_inliers`` remain
    simple threshold counts of the re-estimated winner.
    """
    n_pts = pts1.shape[0]
    valid = None if n_valid is None else jnp.arange(n_pts) < n_valid
    T1, T2, p1, p2, h1, h2 = _ransac_prep(pts1, pts2, normalize, valid)

    n_chunks = (n_iters + chunk - 1) // chunk
    total = n_chunks * chunk
    chunk_keys = jax.random.split(key, n_chunks)

    def score_chunk(ck):
        scores, _ = _score_chunk_body(
            ck, p1, p2, h1, h2, threshold, scoring, n_pts, n_valid,
            valid, chunk)
        return scores

    scores = jax.lax.map(score_chunk, chunk_keys).reshape(total)
    best = jnp.argmax(scores)

    # recompute the winning hypothesis' draw (deterministic from its
    # chunk key), then its F and inlier set
    idx_best = draw_minimal_samples(
        chunk_keys[best // chunk], chunk, 8, n_pts, n_valid)[best % chunk]
    F, inliers = _ransac_winner(
        idx_best, T1, T2, p1, p2, h1, h2, threshold, normalize, valid)
    return RansacResult(F, inliers, jnp.sum(inliers), best)


@functools.partial(
    jax.jit, static_argnames=("chunk", "normalize", "scoring")
)
def _ransac_fundamental_score_chunk(
    ck, pts1, pts2, threshold, n_valid,
    chunk: int = 1024, normalize: bool = True, scoring: str = "msac",
):
    """One hypothesis chunk of F-RANSAC, compiled standalone for the
    adaptive (early-terminating) driver: draws ``chunk`` minimal samples
    from ``ck``, scores them, and returns the chunk's
    (best score, argmax-in-chunk, inlier count of the chunk best) — the
    count feeds the host-side confidence stopping rule.  Shares
    ``_score_chunk_body`` with the fixed path (same draw stream for the
    same per-chunk key), one compile per (bucket, chunk) shape."""
    n_pts = pts1.shape[0]
    valid = None if n_valid is None else jnp.arange(n_pts) < n_valid
    T1, T2, p1, p2, h1, h2 = _ransac_prep(pts1, pts2, normalize, valid)

    score, d = _score_chunk_body(
        ck, p1, p2, h1, h2, threshold, scoring, n_pts, n_valid,
        valid, chunk)
    b = jnp.argmax(score)
    count = jnp.sum(d[b] < threshold)
    return score[b], b, count


@functools.partial(jax.jit, static_argnames=("chunk", "normalize"))
def _ransac_fundamental_finalize(
    ck, best_in_chunk, pts1, pts2, threshold, n_valid,
    chunk: int = 1024, normalize: bool = True,
):
    """Winner re-estimation for the adaptive driver: recompute the winning
    chunk's draw from its key and run the shared LAPACK-grade tail."""
    n_pts = pts1.shape[0]
    valid = None if n_valid is None else jnp.arange(n_pts) < n_valid
    T1, T2, p1, p2, h1, h2 = _ransac_prep(pts1, pts2, normalize, valid)
    idx_best = draw_minimal_samples(
        ck, chunk, 8, n_pts, n_valid)[best_in_chunk]
    F, inliers = _ransac_winner(
        idx_best, T1, T2, p1, p2, h1, h2, threshold, normalize, valid)
    return F, inliers, jnp.sum(inliers)


def adaptive_trials_needed(
    n_inliers: int, n_points: int, sample_size: int, confidence: float
) -> float:
    """Classic adaptive-RANSAC stopping bound (Hartley & Zisserman
    Alg. 4.5; what COLMAP/OpenCV do): the number of minimal-sample draws
    for a ``confidence`` chance that at least one is all-inlier, given the
    best-so-far inlier ratio.  Returns +inf when the ratio rounds to 0."""
    import math

    w = min(max(n_inliers / max(n_points, 1), 0.0), 0.999999)
    p_all_inlier = w ** sample_size
    if p_all_inlier <= 0.0:
        return float("inf")
    if p_all_inlier >= 1.0:
        return 0.0
    return math.log(max(1.0 - confidence, 1e-300)) / math.log1p(
        -p_all_inlier)


def _adaptive_trials_needed_device(cnt, nv, confidence, ftype,
                                   sample_size: int = 8):
    """``adaptive_trials_needed`` as traced arithmetic (same formula,
    vectorizes over a pair axis) for the device-side while_loop drivers
    (sample size 8 for F, 6 for PnP)."""
    one = jnp.asarray(1.0, ftype)
    w = jnp.clip(cnt.astype(ftype) / jnp.maximum(nv.astype(ftype), one),
                 0.0, 0.999999)
    p = w ** sample_size
    log1mc = jnp.log(jnp.maximum(
        jnp.asarray(1.0 - confidence, ftype), jnp.finfo(ftype).tiny))
    return jnp.where(
        p <= 0.0, jnp.asarray(jnp.inf, ftype),
        jnp.where(p >= 1.0, jnp.asarray(0.0, ftype),
                  log1mc / jnp.log1p(-p)))


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "normalize", "chunk", "scoring"),
)
def ransac_fundamental_adaptive_device(
    key: jax.Array,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    confidence: float = 0.999,
    max_iters: int = 50000,
    threshold: float = 5e-4,
    normalize: bool = True,
    chunk: int = 1024,
    n_valid: Optional[jnp.ndarray] = None,
    scoring: str = "msac",
    min_iters: Optional[int] = None,
) -> Tuple[RansacResult, jnp.ndarray]:
    """Adaptive F-RANSAC with the H&Z confidence exit INSIDE the launch —
    a ``lax.while_loop`` over fixed-shape hypothesis chunks, so the early
    exit costs zero host round-trips.  The host-driven
    :func:`ransac_fundamental_adaptive` pays one tunnel RTT per chunk on
    the remote TPU attachment, which erased its ~25x hypothesis saving
    (PERFORMANCE.md round-3 finding: TPU users had to run fixed-count);
    this version keeps one static-shaped program and stops on device.

    Same chunk-key stream, same scorer (``_score_chunk_body``), same
    update rule and stopping comparison as the host driver, so for the
    same ``key`` it scores the same prefix of the fixed path's draw
    sequence and returns the same winner (pinned by test; the stop count
    can differ only if libm ulp differences in the confidence bound flip
    a boundary comparison).  Returns ``(result, iters_scored)`` with
    ``iters_scored`` a traced scalar."""
    n_pts = pts1.shape[0]
    valid = None if n_valid is None else jnp.arange(n_pts) < n_valid
    T1, T2, p1, p2, h1, h2 = _ransac_prep(pts1, pts2, normalize, valid)

    n_chunks = max(1, (max_iters + chunk - 1) // chunk)
    chunk_keys = jax.random.split(key, n_chunks)
    if min_iters is None:
        min_iters = min(2 * chunk, n_chunks * chunk)
    ftype = jnp.asarray(0.0).dtype        # f64 under x64, else f32
    nv = jnp.asarray(n_pts if n_valid is None else n_valid)
    min_iters_f = jnp.asarray(float(min_iters), ftype)
    sdt = p1.dtype

    def cond(st):
        c, bs, bi, nd = st
        done = (c * chunk).astype(ftype)
        return (c < n_chunks) & (done < jnp.maximum(nd, min_iters_f))

    def body(st):
        c, bs, bi, nd = st
        score, d = _score_chunk_body(
            chunk_keys[c], p1, p2, h1, h2, threshold, scoring, n_pts,
            None if n_valid is None else nv, valid, chunk)
        b = jnp.argmax(score)
        s = score[b]
        cnt = jnp.sum(d[b] < threshold)
        improved = s > bs
        bi = jnp.where(improved, c * chunk + b.astype(jnp.int32), bi)
        nd = jnp.where(
            improved,
            _adaptive_trials_needed_device(cnt, nv, confidence, ftype), nd)
        return c + 1, jnp.maximum(s, bs), bi, nd

    init = (jnp.asarray(0, jnp.int32), jnp.asarray(-jnp.inf, sdt),
            jnp.asarray(0, jnp.int32), jnp.asarray(float(max_iters), ftype))
    c_fin, _, best_iter, _ = jax.lax.while_loop(cond, body, init)
    iters_scored = jnp.minimum(c_fin * chunk, max_iters)

    idx_best = draw_minimal_samples(
        chunk_keys[best_iter // chunk], chunk, 8, n_pts,
        None if n_valid is None else nv)[best_iter % chunk]
    F, inliers = _ransac_winner(
        idx_best, T1, T2, p1, p2, h1, h2, threshold, normalize, valid)
    return (RansacResult(F, inliers, jnp.sum(inliers), best_iter),
            iters_scored)


def ransac_fundamental_adaptive(
    key: jax.Array,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    confidence: float = 0.999,
    max_iters: int = 50000,
    threshold: float = 5e-4,
    normalize: bool = True,
    chunk: int = 1024,
    n_valid: Optional[int] = None,
    scoring: str = "msac",
    min_iters: Optional[int] = None,
) -> Tuple[RansacResult, int]:
    """F-RANSAC with the standard confidence-based early exit — the
    production alternative to the reference's FIXED 50,000 iterations
    (Fundamental.py:95-129): stop once the draws made would contain an
    all-inlier sample with probability ``confidence`` under the
    best-so-far inlier ratio.  At the bundled data's ~50-70% inlier
    ratios this is 400-1800 draws instead of 50,000 (~25x less scoring
    work) with the same winner quality.

    Host-driven at CHUNK granularity: each chunk is one compiled device
    launch (``_ransac_fundamental_score_chunk``, reused across pairs via
    shape bucketing) and only three scalars come back per launch, so the
    early exit costs no compiled-graph dynamism — the TPU program stays
    static-shaped.  The per-chunk key stream is the split used by
    ``ransac_fundamental``, so a run that stops after ``c`` chunks scores
    EXACTLY the first ``c * chunk`` hypotheses of the fixed path's draw
    sequence (same key): an adaptive run is a prefix of the fixed run.

    Returns ``(result, iters_scored)``.
    """
    import numpy as np

    n_chunks = max(1, (max_iters + chunk - 1) // chunk)
    chunk_keys = jax.random.split(key, n_chunks)
    if min_iters is None:
        min_iters = min(2 * chunk, n_chunks * chunk)
    nv = pts1.shape[0] if n_valid is None else int(n_valid)
    nv_arr = None if n_valid is None else jnp.asarray(n_valid)

    best_score, best_iter = -np.inf, 0
    needed = float(max_iters)
    done = 0
    for c in range(n_chunks):
        s, b, cnt = _ransac_fundamental_score_chunk(
            chunk_keys[c], pts1, pts2, threshold, nv_arr,
            chunk=chunk, normalize=normalize, scoring=scoring,
        )
        s = float(s)
        done += chunk
        if s > best_score:
            best_score = s
            best_iter = c * chunk + int(b)
            needed = adaptive_trials_needed(int(cnt), nv, 8, confidence)
        if done >= max(needed, min_iters):
            break

    F, inliers, n_inl = _ransac_fundamental_finalize(
        chunk_keys[best_iter // chunk], best_iter % chunk,
        pts1, pts2, threshold, nv_arr, chunk=chunk, normalize=normalize,
    )
    res = RansacResult(F, inliers, n_inl, jnp.asarray(best_iter))
    # the last chunk may overshoot a non-chunk-multiple cap; report at
    # most the cap (the fixed path's effective count is identically
    # ceil-rounded, so a fixed run at n_iters=<reported> regenerates the
    # same chunk count and draw sequence)
    return res, min(done, max_iters)


def ransac_fundamental_bucketed(
    key: jax.Array,
    pts1_np, pts2_np,
    n_iters: int = 50000,
    threshold: float = 5e-4,
    normalize: bool = True,
    chunk: int = 1024,
    scoring: str = "msac",
    mesh=None,
    axis: str = "data",
    confidence: float = 0.0,
    iters_out: Optional[list] = None,
    adaptive_device: Optional[bool] = None,
) -> RansacResult:
    """Host wrapper: pad the match count to the next power of two and call
    the jitted core with the true count — one compile per bucket instead of
    one per pair (remote accelerator compiles cost minutes; a 10-pair run
    collapses from ~10 compiles to ~3).

    ``mesh``: optional device mesh — routes to the hypothesis-sharded core
    (parallel/ransac.py) with the same bucket policy, so the pad+slice
    logic lives HERE for both paths.

    ``confidence > 0``: route to the adaptive driver with ``n_iters`` as
    the cap (mutually exclusive with ``mesh`` — adaptive already cuts the
    work ~25x, sharding the remainder isn't worth the divergent draw
    sequence).  ``adaptive_device`` picks the driver: the host loop (one
    launch per chunk; right on a local backend) or the device
    ``lax.while_loop`` (one launch total; right behind a per-launch-RTT
    tunnel) — ``None`` auto-selects the device loop on any non-CPU
    backend.  ``iters_out``: optional list the adaptive path appends its
    scored-iteration count to (for stage logging)."""
    import numpy as np

    n = len(pts1_np)
    # floored=False: the F-RANSAC executables are the pipeline's largest
    # and their per-process relay cost scales sharply with the bucket —
    # keep natural pow2 buckets here (see utils/buckets.py:pow2_bucket)
    bucket = pow2_bucket(n, floored=False)
    pad = bucket - n
    p1 = jnp.asarray(np.pad(np.asarray(pts1_np, np.float64), ((0, pad), (0, 0))))
    p2 = jnp.asarray(np.pad(np.asarray(pts2_np, np.float64), ((0, pad), (0, 0))))
    if confidence > 0.0:
        if mesh is not None:
            raise ValueError(
                "adaptive RANSAC (confidence > 0) and hypothesis sharding "
                "(mesh) are mutually exclusive — drop --ransac_devices or "
                "--ransac_confidence"
            )
        if adaptive_device is None:
            adaptive_device = jax.default_backend() != "cpu"
        if adaptive_device:
            res, used = ransac_fundamental_adaptive_device(
                key, p1, p2, confidence=confidence, max_iters=n_iters,
                threshold=threshold, normalize=normalize, chunk=chunk,
                n_valid=jnp.asarray(n), scoring=scoring,
            )
            used = int(used)
        else:
            res, used = ransac_fundamental_adaptive(
                key, p1, p2, confidence=confidence, max_iters=n_iters,
                threshold=threshold, normalize=normalize, chunk=chunk,
                n_valid=n, scoring=scoring,
            )
        if iters_out is not None:
            iters_out.append(used)
        return RansacResult(
            res.F, res.inliers[:n], res.n_inliers, res.best_iter
        )
    if mesh is not None:
        from sfm_nerf_tpu.parallel.ransac import ransac_fundamental_sharded

        res = ransac_fundamental_sharded(
            key, p1, p2, jnp.asarray(n), mesh=mesh, axis=axis,
            n_iters=n_iters, threshold=threshold, normalize=normalize,
            chunk=chunk, scoring=scoring,
        )
    else:
        res = ransac_fundamental(
            key, p1, p2,
            n_iters=n_iters, threshold=threshold, normalize=normalize,
            chunk=chunk, n_valid=jnp.asarray(n), scoring=scoring,
        )
    return RansacResult(
        res.F, res.inliers[:n], res.n_inliers, res.best_iter
    )


# ---------------------------------------------------------------------------
# Pair-axis batched F-RANSAC: every image pair's RANSAC in ONE device launch.
#
# The per-pair host loop (sfm/pipeline.py:refine_all_matches) pays one relay
# round-trip + dispatch per pair; on the tunneled TPU attachment that RTT —
# not the compute — dominated the ransac stage (PERFORMANCE.md: 135 s of the
# 50-camera run).  After shape bucketing the pairs are shape-identical, so
# the whole stage is ONE vmapped program with a leading pair axis.  Per-pair
# keys keep each pair's draw stream IDENTICAL to the sequential path
# (draw_minimal_samples is bucket-invariant and the key stream is per-pair),
# so batched results are bit-equal to the loop's (pinned by test).


@functools.partial(
    jax.jit, static_argnames=("n_iters", "normalize", "chunk", "scoring")
)
def ransac_fundamental_pairs(
    keys: jax.Array,          # (P,) per-pair keys (the loop's key stream)
    pts1: jnp.ndarray,        # (P, N, 2) bucket-padded pixel coords
    pts2: jnp.ndarray,        # (P, N, 2)
    n_valid: jnp.ndarray,     # (P,) true match counts
    n_iters: int = 50000,
    threshold: float = 5e-4,
    normalize: bool = True,
    chunk: int = 1024,
    scoring: str = "msac",
) -> RansacResult:
    """Fixed-iteration F-RANSAC over a pair axis — bit-equal per pair to
    ``ransac_fundamental(keys[p], pts1[p], pts2[p], n_valid=n_valid[p])``
    (same draws, same scores, same winner), in one launch."""
    run = lambda k, a, b, nv: ransac_fundamental(
        k, a, b, n_iters=n_iters, threshold=threshold, normalize=normalize,
        chunk=chunk, n_valid=nv, scoring=scoring)
    return jax.vmap(run)(keys, pts1, pts2, n_valid)


@functools.partial(
    jax.jit, static_argnames=("chunk", "normalize", "scoring")
)
def _ransac_pairs_score_chunk(
    cks, pts1, pts2, threshold, n_valid,
    chunk: int = 1024, normalize: bool = True, scoring: str = "msac",
):
    """(P,)-batched `_ransac_fundamental_score_chunk` for the batched
    adaptive driver: one launch scores chunk hypotheses of EVERY pair."""
    run = lambda k, a, b, nv: _ransac_fundamental_score_chunk(
        k, a, b, threshold, nv, chunk=chunk, normalize=normalize,
        scoring=scoring)
    return jax.vmap(run)(cks, pts1, pts2, n_valid)


@functools.partial(jax.jit, static_argnames=("chunk", "normalize"))
def _ransac_pairs_finalize(
    cks, best_in_chunk, pts1, pts2, threshold, n_valid,
    chunk: int = 1024, normalize: bool = True,
):
    run = lambda k, b, a1, a2, nv: _ransac_fundamental_finalize(
        k, b, a1, a2, threshold, nv, chunk=chunk, normalize=normalize)
    return jax.vmap(run)(cks, best_in_chunk, pts1, pts2, n_valid)


def ransac_fundamental_pairs_adaptive(
    keys: jax.Array,
    pts1: jnp.ndarray,        # (P, N, 2)
    pts2: jnp.ndarray,
    n_valid,                  # (P,) ints
    confidence: float = 0.999,
    max_iters: int = 50000,
    threshold: float = 5e-4,
    normalize: bool = True,
    chunk: int = 1024,
    scoring: str = "msac",
) -> Tuple[RansacResult, int]:
    """Adaptive F-RANSAC over a pair axis: the H&Z confidence exit runs on
    the SLOWEST pair (chunks are scored for all pairs together, so the
    stage stops when every pair's bound is met).  Each pair's draw stream
    is the sequential adaptive path's (prefix-stable key split), so the
    result per pair is bit-equal to the FIXED path truncated at this run's
    stop count — pairs whose own bound was met earlier simply score extra
    chunks, which can only keep or improve their winner.

    Returns ``(batched result, iters scored per pair)``."""
    import numpy as np

    P = pts1.shape[0]
    n_chunks = max(1, (max_iters + chunk - 1) // chunk)
    # (P, n_chunks) per-pair chunk keys — column c is the sequential
    # path's chunk_keys[c] for that pair's key (split is prefix-stable)
    chunk_keys = jax.vmap(lambda k: jax.random.split(k, n_chunks))(keys)
    min_iters = min(2 * chunk, n_chunks * chunk)
    nv_host = np.asarray(n_valid, np.int64)
    nv_arr = jnp.asarray(n_valid)

    best_score = np.full(P, -np.inf)
    best_iter = np.zeros(P, np.int64)
    needed = np.full(P, float(max_iters))
    done = 0
    for c in range(n_chunks):
        s, b, cnt = _ransac_pairs_score_chunk(
            chunk_keys[:, c], pts1, pts2, threshold, nv_arr,
            chunk=chunk, normalize=normalize, scoring=scoring)
        s, b, cnt = np.asarray(s), np.asarray(b), np.asarray(cnt)
        done += chunk
        improved = s > best_score
        best_score = np.where(improved, s, best_score)
        best_iter = np.where(improved, c * chunk + b, best_iter)
        for p in np.flatnonzero(improved):
            needed[p] = adaptive_trials_needed(
                int(cnt[p]), int(nv_host[p]), 8, confidence)
        if done >= max(float(np.max(needed)), min_iters):
            break

    bc = jnp.asarray(best_iter // chunk, jnp.int32)
    F, inliers, n_inl = _ransac_pairs_finalize(
        jnp.take_along_axis(chunk_keys, bc[:, None], axis=1)[:, 0],
        jnp.asarray(best_iter % chunk), pts1, pts2, threshold, nv_arr,
        chunk=chunk, normalize=normalize)
    res = RansacResult(F, inliers, n_inl, jnp.asarray(best_iter))
    return res, min(done, max_iters)


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "normalize", "chunk", "scoring"),
)
def ransac_fundamental_pairs_adaptive_device(
    keys: jax.Array,
    pts1: jnp.ndarray,        # (P, N, 2)
    pts2: jnp.ndarray,
    n_valid: jnp.ndarray,     # (P,)
    confidence: float = 0.999,
    max_iters: int = 50000,
    threshold: float = 5e-4,
    normalize: bool = True,
    chunk: int = 1024,
    scoring: str = "msac",
) -> Tuple[RansacResult, jnp.ndarray]:
    """Pair-axis adaptive F-RANSAC with the confidence exit INSIDE the
    launch: one ``lax.while_loop`` scores a chunk of hypotheses for EVERY
    pair per iteration and stops when the slowest pair's H&Z bound is met
    — the whole refine stage becomes one device program with zero
    per-chunk tunnel RTT (the host-driven
    :func:`ransac_fundamental_pairs_adaptive` pays one RTT per chunk,
    which on the remote TPU erased adaptivity's ~25x hypothesis saving).
    Same keys/draws/update rule as the host driver, so winners match for
    the same key stream (pinned by test).  Returns
    ``(batched result, iters scored — traced scalar, same for all pairs)``.
    """
    P, N = pts1.shape[0], pts1.shape[1]
    n_chunks = max(1, (max_iters + chunk - 1) // chunk)
    chunk_keys = jax.vmap(lambda k: jax.random.split(k, n_chunks))(keys)
    min_iters = min(2 * chunk, n_chunks * chunk)
    ftype = jnp.asarray(0.0).dtype        # f64 under x64, else f32
    nv = jnp.asarray(n_valid)
    valid = jnp.arange(N)[None, :] < nv[:, None]          # (P, N)
    T1, T2, p1, p2, h1, h2 = jax.vmap(
        lambda a, b, v: _ransac_prep(a, b, normalize, v))(pts1, pts2, valid)
    min_iters_f = jnp.asarray(float(min_iters), ftype)
    sdt = p1.dtype

    def score_pair(ck, p1p, p2p, h1p, h2p, vp, nvp):
        return _score_chunk_body(
            ck, p1p, p2p, h1p, h2p, threshold, scoring, N, nvp, vp, chunk)

    def cond(st):
        c, bs, bi, nd = st
        done = (c * chunk).astype(ftype)
        return (c < n_chunks) & (done < jnp.maximum(
            jnp.max(nd), min_iters_f))

    def body(st):
        c, bs, bi, nd = st
        score, d = jax.vmap(score_pair)(
            chunk_keys[:, c], p1, p2, h1, h2, valid, nv)
        b = jnp.argmax(score, axis=1)                      # (P,)
        s = jnp.take_along_axis(score, b[:, None], axis=1)[:, 0]
        db = jnp.take_along_axis(d, b[:, None, None], axis=1)[:, 0, :]
        cnt = jnp.sum(db < threshold, axis=1)
        improved = s > bs
        bi = jnp.where(improved, c * chunk + b.astype(jnp.int32), bi)
        nd = jnp.where(
            improved,
            _adaptive_trials_needed_device(cnt, nv, confidence, ftype), nd)
        return c + 1, jnp.maximum(s, bs), bi, nd

    init = (jnp.asarray(0, jnp.int32),
            jnp.full((P,), -jnp.inf, sdt),
            jnp.zeros((P,), jnp.int32),
            jnp.full((P,), float(max_iters), ftype))
    c_fin, _, best_iter, _ = jax.lax.while_loop(cond, body, init)
    iters_scored = jnp.minimum(c_fin * chunk, max_iters)

    def fin(ckrow, bi_p, T1p, T2p, p1p, p2p, h1p, h2p, vp, nvp):
        idx = draw_minimal_samples(
            ckrow[bi_p // chunk], chunk, 8, N, nvp)[bi_p % chunk]
        return _ransac_winner(
            idx, T1p, T2p, p1p, p2p, h1p, h2p, threshold, normalize, vp)

    F, inliers = jax.vmap(fin)(
        chunk_keys, best_iter, T1, T2, p1, p2, h1, h2, valid, nv)
    res = RansacResult(F, inliers, jnp.sum(inliers, axis=1), best_iter)
    return res, iters_scored


def ransac_fundamental_pairs_bucketed(
    items,                    # sequence of (key, pts1_np, pts2_np)
    n_iters: int = 50000,
    threshold: float = 5e-4,
    normalize: bool = True,
    chunk: int = 1024,
    scoring: str = "msac",
    confidence: float = 0.0,
    iters_out: Optional[list] = None,
    max_pairs_per_launch: int = 64,
    adaptive_device: Optional[bool] = None,
):
    """Host wrapper for the whole refine stage: group pairs by their pow2
    bucket (same padding rule as ``ransac_fundamental_bucketed``, so draws
    match the sequential path exactly), run ONE batched launch per bucket
    group, and return per-item ``RansacResult``s in input order.

    ``confidence > 0`` routes groups through the batched adaptive driver
    (stage-level early exit on the slowest pair); ``iters_out`` gets one
    scored-iteration count appended PER ITEM (the group's shared count).
    ``adaptive_device`` picks the adaptive driver exactly as in
    ``ransac_fundamental_bucketed``: host chunk loop vs device
    ``lax.while_loop`` (``None`` auto-selects device on non-CPU backends).

    ``max_pairs_per_launch`` splits oversized bucket groups (a 200-camera
    run puts hundreds of pairs in one bucket; the per-launch score tensor
    is pairs x chunk x bucket, so the cap is scaled by 1024/bucket to hold
    the launch at the same ~0.5 GB f64 ceiling at EVERY bucket size — 64
    pairs at the 1024-bucket, 16 at 4096 — while still amortizing the
    dispatch RTT).  Per-pair results are unaffected (the pair axis is
    vmapped)."""
    import numpy as np

    items = list(items)
    groups: dict = {}
    for pos, (k, a, b) in enumerate(items):
        # floored=False: natural buckets for the big F-RANSAC programs
        # (utils/buckets.py:pow2_bucket — the merged 4096 executable's
        # per-process relay cost measured ~12x the natural-bucket set)
        groups.setdefault(
            pow2_bucket(len(a), floored=False), []).append((pos, k, a, b))
    out = [None] * len(items)
    used_per_item = [0] * len(out)
    split_groups = []
    for bucket, members in sorted(groups.items()):
        per_launch = max(1, (max_pairs_per_launch * 1024) // max(bucket, 1024))
        for s in range(0, len(members), per_launch):
            split_groups.append((bucket, members[s:s + per_launch]))
    for bucket, members in split_groups:
        keys = jnp.stack([k for _, k, _, _ in members])
        p1 = np.zeros((len(members), bucket, 2))
        p2 = np.zeros((len(members), bucket, 2))
        nv = np.zeros(len(members), np.int64)
        for m, (_, _, a, b) in enumerate(members):
            p1[m, : len(a)] = np.asarray(a, np.float64)
            p2[m, : len(b)] = np.asarray(b, np.float64)
            nv[m] = len(a)
        p1j, p2j = jnp.asarray(p1), jnp.asarray(p2)
        if confidence > 0.0:
            dev = (adaptive_device if adaptive_device is not None
                   else jax.default_backend() != "cpu")
            if dev:
                # confidence exit inside the launch: zero per-chunk RTT
                res, used = ransac_fundamental_pairs_adaptive_device(
                    keys, p1j, p2j, jnp.asarray(nv), confidence=confidence,
                    max_iters=n_iters, threshold=threshold,
                    normalize=normalize, chunk=chunk, scoring=scoring)
                used = int(used)
            else:
                res, used = ransac_fundamental_pairs_adaptive(
                    keys, p1j, p2j, nv, confidence=confidence,
                    max_iters=n_iters, threshold=threshold,
                    normalize=normalize, chunk=chunk, scoring=scoring)
        else:
            res, used = ransac_fundamental_pairs(
                keys, p1j, p2j, jnp.asarray(nv), n_iters=n_iters,
                threshold=threshold, normalize=normalize, chunk=chunk,
                scoring=scoring), n_iters
        F = np.asarray(res.F)
        inl = np.asarray(res.inliers)
        n_inl = np.asarray(res.n_inliers)
        bi = np.asarray(res.best_iter)
        for m, (pos, _, a, _) in enumerate(members):
            out[pos] = RansacResult(
                F[m], inl[m, : len(a)], n_inl[m], bi[m])
            used_per_item[pos] = used
    # fixed-count mode leaves iters_out untouched, matching the sequential
    # ransac_fundamental_bucketed (a non-empty iters_out means "adaptive
    # early exit ran" to the pipeline's log line)
    if iters_out is not None and confidence > 0.0:
        iters_out.extend(used_per_item)
    return out


def essential_from_fundamental(K: jnp.ndarray, F: jnp.ndarray) -> jnp.ndarray:
    """E = K^T F K (Fundamental.py:141-147; no (1,1,0) singular-value cleanup,
    matching the reference's omission — documented in SURVEY §2.1)."""
    # HIGHEST: bf16-demoted 3x3 conjugation corrupts E by ~0.2%
    return jnp.matmul(jnp.matmul(K.T, F, precision=HI), K, precision=HI)


def cleanup_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Project E onto the essential manifold (singular values -> (1,1,0)).

    The reference SKIPS this despite its report describing it (SURVEY §2.1,
    Fundamental.py:141-147); on the bundled data the dirty-E pose costs a
    few px of linear-triangulation error (measured 7.7 vs 5.1 after
    cleanup+center fix)."""
    U, _, Vt = jnp.linalg.svd(E)
    S = jnp.asarray([1.0, 1.0, 0.0], E.dtype)
    return jnp.einsum("ij,j,jk->ik", U, S, Vt, precision=HI)


def decompose_essential(
    E: jnp.ndarray, center_convention: str = "reference"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Four candidate (C, R) pairs from E (Fundamental.py:149-173).

    Returns (Cs (4,3), Rs (4,3,3)).  Candidate order matches the reference:
    [(C,+W), (-C,+W), (C,+W^T), (-C,+W^T)], each sign-fixed so det(R)>0
    (when det<0 BOTH C and R are negated, as in Fundamental.py:167-170).

    ``center_convention='reference'`` keeps the reference's quirk: U[:,2] is
    interpreted directly as the camera CENTER (the H&Z recipe makes it the
    translation; the center would be -R^T U[:,2]).  Under nonzero relative
    rotation this biases the linear two-view pose by a few px of
    reprojection error — which cheirality, the nonlinear stages, and bundle
    adjustment absorb, and which is exactly where the reference's reported
    1.93 px linear-triangulation error comes from (BASELINE Table I).
    ``'hz'`` computes the proper center C = -R^T (+-U[:,2]).
    """
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    C = U[:, 2]
    R_a = jnp.matmul(jnp.matmul(U, W, precision=HI), Vt, precision=HI)
    R_b = jnp.matmul(jnp.matmul(U, W.T, precision=HI), Vt, precision=HI)
    Cs = jnp.stack([C, -C, C, -C])
    Rs = jnp.stack([R_a, R_a, R_b, R_b])
    neg = jnp.linalg.det(Rs) < 0
    Cs = jnp.where(neg[:, None], -Cs, Cs)
    Rs = jnp.where(neg[:, None, None], -Rs, Rs)
    if center_convention == "hz":
        Cs = -jnp.einsum("nji,nj->ni", Rs, Cs, precision=HI)  # -R^T t
    elif center_convention != "reference":
        raise ValueError(f"unknown center convention {center_convention!r}")
    return Cs, Rs
