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

The cache path is suffixed with a HOST FINGERPRINT (CPU model + feature
flags): CPU executables are AOT-compiled for the *detected* host features,
and reloading an entry written on a different machine is a SIGSEGV/SIGILL,
not an error (observed in-session: the container migrated hosts and every
jit under test_train segfaulted inside cache deserialization).  A migrated
container now lands in a fresh subdirectory instead of the poisoned one.
"""

from __future__ import annotations

import hashlib
import os

_ROOT = os.path.expanduser("~/.cache/sfm_nerf_tpu")


def _host_fingerprint(extra: str = "") -> str:
    """Stable id of the host's CPU model + feature flags (the inputs that
    determine XLA CPU-AOT code generation), plus any caller-supplied
    ``extra`` discriminator (the accelerator runtime build — see
    ``enable_compilation_cache``).  Falls back to platform info where
    /proc/cpuinfo is unavailable."""
    text = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    text += line
                    if text.count("\n") >= 2:
                        break
    except OSError:
        pass
    if not text:
        import platform

        text = f"{platform.machine()} {platform.processor()}"
    return hashlib.sha1((text + extra).encode()).hexdigest()[:12]


def _backend_version() -> str:
    """The active backend's runtime build string (libtpu build for TPU) —
    part of the cache fingerprint because a cached TPU executable
    AOT-compiled under one libtpu build is rejected (FAILED_PRECONDITION,
    'client and terminal must use the same libtpu build') or silently
    divergent under another; rolling libtpu upgrades on the shared
    terminal are observed in practice (round-1 MULTICHIP artifact)."""
    try:
        import jax.extend as jex

        return str(getattr(jex.backend.get_backend(), "platform_version", ""))
    except Exception:
        return ""


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compilation cache at a local
    host-fingerprinted directory.  Returns the directory in effect (None
    if disabled).  An explicitly-passed/env directory is used verbatim
    (the caller owns its lifecycle).

    The default cache is enabled on EVERY backend, including CPU: a warm
    ``Phase1/Wrapper.py --platform cpu`` run drops 149 s -> 42 s (the
    cold run spends 118 s of 159 s inside backend_compile, cProfile'd) —
    the SfM driver dispatches ~490 programs per run.  CPU caching was
    briefly default-off here after two full-suite segfaults inside
    ``executable.serialize()``; those were later root-caused to
    vm.max_map_count exhaustion (the suite holds ~63k JIT mappings and
    serialization maps more — see tests/conftest.py), not to the cache:
    every caller of this function is a bounded CLI/bench process holding
    a few hundred programs, two orders of magnitude below that ceiling.
    Opt out with SFM_NERF_JAX_CACHE=0."""
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    env = os.environ.get("SFM_NERF_JAX_CACHE")
    if env == "0":
        return None

    if cache_dir is None and not env:
        cache_dir = os.path.join(
            _ROOT, f"jax-{_host_fingerprint(_backend_version())}"
        )
    elif cache_dir is None:
        cache_dir = env
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
