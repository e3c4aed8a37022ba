"""Power-of-two shape buckets for host wrappers around jitted geometry ops.

On remote/tunneled accelerators every distinct input shape costs a fresh
compile (minutes); the bucketed wrappers pad inputs to ``pow2_bucket(n)``
and pass the true count, so a whole pipeline run compiles each op for a
handful of sizes.  ONE definition — the bucket policy must agree across
ops or the compile-count multiplies (review finding, round 2).
"""

from __future__ import annotations

import numpy as np


def pow2_bucket(n: int, floor: int = 64) -> int:
    """Smallest power of two >= max(n, floor)."""
    return 1 << max(int(np.ceil(np.log2(max(n, floor)))), int(np.log2(floor)))
