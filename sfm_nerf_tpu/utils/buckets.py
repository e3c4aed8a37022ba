"""Power-of-two shape buckets for host wrappers around jitted geometry ops.

On remote/tunneled accelerators every distinct input shape costs a fresh
compile (minutes); the bucketed wrappers pad inputs to ``pow2_bucket(n)``
and pass the true count, so a whole pipeline run compiles each op for a
handful of sizes.  ONE definition — the bucket policy must agree across
ops or the compile-count multiplies (review finding, round 2).
"""

from __future__ import annotations

import numpy as np

# Process-wide override for the POINT-axis bucket floor (the calls that use
# the default floor=64).  On a relay-attached accelerator every distinct
# executable pays a one-time per-process load (~0.1-0.2 s each over the
# tunnel; PERFORMANCE.md "resident steady state"), so a run that would
# compile 3-4 point-size buckets per op (512/1024/2048/4096 on the bundled
# data) merges them into ONE by raising the floor to cover the dataset's
# match counts.  Result-invariant by construction: every bucketed core
# (incl. the disambiguate_pose cheirality vote, n_valid-masked since the
# advisor-r4 fix — cyclic-repeat padding alone left the vote's per-point
# weighting floor-dependent) takes the true count (n_valid) as data — RANSAC draws are U[i, n_valid) and
# scoring masks padded rows, so the winning iteration and inlier set are
# identical across bucket sizes and the fitted model agrees to rounding
# (longer padded reductions reassociate; pinned by
# test_bucket_floor_invariance).  Camera-axis buckets
# (explicit floor=8) are never touched — padding a camera axis to 4096
# would explode the BA system.
_POINT_FLOOR = 64
# "auto" floor policy: resolved LAZILY at the first pow2_bucket call, not
# when it is requested (advisor r4: resolving in SfMPipeline.__init__
# called jax.default_backend() at construction, eagerly initializing the
# relay TPU backend even for runs that force CPU later — the platform
# choice is only final once ops actually dispatch)
_AUTO = False


def set_point_bucket_floor(floor: int | None) -> None:
    """Raise (or reset, with None/0) the minimum point-axis bucket.

    Process-wide policy by design (ONE bucket policy per process or the
    compile count multiplies); ``floor=-1`` selects the backend-dependent
    auto policy (4096 on accelerators, natural on CPU), deferred to first
    use so no backend is initialized here."""
    global _POINT_FLOOR, _AUTO
    if floor == -1:
        _AUTO, _POINT_FLOOR = True, 64
        return
    _AUTO = False
    _POINT_FLOOR = max(64, int(floor)) if floor else 64


def _resolve_auto() -> None:
    global _POINT_FLOOR, _AUTO
    import jax

    _POINT_FLOOR = 4096 if jax.default_backend() != "cpu" else 64
    _AUTO = False


def pow2_bucket(n: int, floor: int = 64, *, floored: bool = True) -> int:
    """Smallest power of two >= max(n, floor).  Calls that leave ``floor``
    at its default participate in the point-axis floor override above;
    ``floored=False`` opts a call site out.

    The F-RANSAC cores opt OUT: their compiled artifacts are the largest
    in the pipeline and their per-process relay cost scales sharply with
    the point bucket (measured on the v5e tunnel: the refine stage's
    first-touch went 19.3 s at natural 256..2048 buckets -> ~230 s at a
    merged 4096 bucket, for BOTH the pair-axis and single-pair adaptive
    programs, warm persistent cache) — merging buckets there trades a
    second small program for one giant one and loses.  The small
    registration-side programs (PnP, triangulation, BA glue) win from
    merging: registration stage 20.6 -> 10.6 s warm new-process."""
    if floored and floor == 64:
        if _AUTO:
            _resolve_auto()
        floor = _POINT_FLOOR
    return 1 << max(int(np.ceil(np.log2(max(n, floor)))), int(np.log2(floor)))
