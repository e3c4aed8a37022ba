"""Hypothesis-parallel F-RANSAC over a device mesh.

RANSAC is embarrassingly parallel over hypotheses: each device scores an
equal slice of the minimal-sample draws against the (replicated) match
set, and only the per-hypothesis SCORES are exchanged (one all-gather of
``total_iters`` f32 — bytes, not megabytes).  This is the
SPMD shape of the reference's 50,000-iteration Python loop
(Phase1/Fundamental.py:95-129) at multi-chip scale: hypothesis draws,
scoring math, and the winning-hypothesis re-estimation are IDENTICAL to
``ops.epipolar.ransac_fundamental`` — same key -> same draws -> bit-equal
winner — so the sharded path is a pure wall-clock lever.  Caveat: the
per-device iteration count is padded to whole chunks, so bit-equality
with the single-device path holds exactly when the DEVICE COUNT divides
the chunk count ceil(n_iters/chunk) (e.g. 50k iters / 1024-chunk = 49
chunks: equal on 1 or 7 devices; on 4 devices the chunk count rounds up
to 52, the draw sequence changes, and the winner may differ by a
near-tie).  The config.py field documents this.

Single-chip callers should keep using ``ransac_fundamental``; the driver
switches here when ``--ransac_devices > 1``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from sfm_nerf_tpu.ops.epipolar import (
    RansacResult,
    _ransac_prep,
    _ransac_winner,
    _score_chunk_body,
    draw_minimal_samples,
)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "n_iters", "normalize", "chunk",
                     "scoring"),
)
def ransac_fundamental_sharded(
    key: jax.Array,
    pts1: jnp.ndarray,        # (N, 2) pixel coords
    pts2: jnp.ndarray,        # (N, 2)
    n_valid: Optional[jnp.ndarray] = None,
    *,
    mesh,
    axis: str = "data",
    n_iters: int = 50000,
    threshold: float = 5e-4,
    normalize: bool = True,
    chunk: int = 1024,
    scoring: str = "msac",
) -> RansacResult:
    """``ransac_fundamental`` with the hypothesis axis sharded over
    ``mesh[axis]``.  The chunk count is rounded up to a device multiple, so
    the EFFECTIVE iteration count is ``ceil(ceil(n_iters/chunk)/n_dev) *
    n_dev * chunk`` — pass an n_iters whose chunk count is a MULTIPLE of
    the device count to match the single-device draw sequence exactly."""
    n_pts = pts1.shape[0]
    valid = None if n_valid is None else jnp.arange(n_pts) < n_valid
    T1, T2, p1, p2, h1, h2 = _ransac_prep(pts1, pts2, normalize, valid)

    n_dev = mesh.shape[axis]
    n_chunks = (n_iters + chunk - 1) // chunk
    n_chunks = ((n_chunks + n_dev - 1) // n_dev) * n_dev
    # per-chunk keys split exactly as the single-device path, so equal
    # chunk counts -> identical draws -> bit-equal winner
    chunk_keys = jax.random.split(key, n_chunks)

    def score_shard(keys_shard, p1r, p2r, h1r, h2r, thr):
        # keys_shard: (n_chunks/n_dev,) — this device's hypothesis chunks;
        # the scorer is the shared single-device body (ops/epipolar.py)
        def score_chunk(ck):
            scores, _ = _score_chunk_body(
                ck, p1r, p2r, h1r, h2r, thr, scoring, n_pts, n_valid,
                valid, chunk)
            return scores

        return jax.lax.map(score_chunk, keys_shard).reshape(-1)

    rep = P(*([None] * 2))
    scores = shard_map(
        score_shard,
        mesh=mesh,
        in_specs=(P(axis), rep, rep, rep, rep, P()),
        out_specs=P(axis),
    )(chunk_keys, p1, p2, h1, h2, jnp.asarray(threshold, p1.dtype))
    best = jnp.argmax(scores)

    # winning hypothesis re-drawn (deterministic from its chunk key),
    # re-scored + re-estimated on its inliers via the shared tail,
    # exactly as the single-device path (ops/epipolar.py)
    idx_best = draw_minimal_samples(
        chunk_keys[best // chunk], chunk, 8, n_pts, n_valid)[best % chunk]
    F, inliers = _ransac_winner(
        idx_best, T1, T2, p1, p2, h1, h2, threshold, normalize, valid)
    return RansacResult(F, inliers, jnp.sum(inliers), best)
