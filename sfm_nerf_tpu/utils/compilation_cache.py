"""Persistent XLA compilation cache across processes.

On the tunneled TPU attachment every program shape costs a REMOTE compile
(minutes for the big kernels, seconds for each of the dozens of small
geometry programs the SfM driver dispatches) and nothing persists between
processes unless a cache dir is set — the reference's torch stack has no
analog (eager CUDA), but for this framework cold-start wall-clock is
dominated by compiles, not compute (PERFORMANCE.md "Full SfM on TPU").

``enable_compilation_cache()`` is called by every CLI entry point and
bench.  Opt out with SFM_NERF_JAX_CACHE=0; point elsewhere with
SFM_NERF_JAX_CACHE=/path; an explicit JAX_COMPILATION_CACHE_DIR (JAX's
own env var) always wins and is left untouched.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/sfm_nerf_tpu/jax")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compilation cache at a local
    directory.  Returns the directory in effect (None if disabled)."""
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    env = os.environ.get("SFM_NERF_JAX_CACHE")
    if env == "0":
        return None
    if cache_dir is None:
        cache_dir = env or _DEFAULT
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: the SfM host loop dispatches dozens of
        # small programs whose REMOTE round-trips are seconds each
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:   # very old jax or read-only FS: run uncached
        return None
    return cache_dir
