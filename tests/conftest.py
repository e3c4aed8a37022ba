"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports.

Multi-chip sharding correctness (psum grads == single-device grads, pjit
train-step compilation over a real Mesh) is validated here without TPU pods,
per SURVEY §4's build requirement.  Benchmarks (bench.py) run on real TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the 'axon' TPU backend and selects
# it programmatically, overriding the env var — force CPU here, before any
# backend initialization.
jax.config.update("jax_platforms", "cpu")

# Geometry ops are dtype-polymorphic; SfM oracle tests run them in float64
# (the reference is float64 NumPy/SciPy throughout Phase1).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: a warm full suite runs in ~9.5 min vs
# ~23 min cold (measured; 285 entries, deterministic results, no new
# segfaults — the historical in-suite SIGSEGV was vm.max_map_count
# exhaustion, handled below, not cache serialization).  Same opt-out as
# the CLIs: SFM_NERF_JAX_CACHE=0.
from sfm_nerf_tpu.utils.compilation_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The full suite compiles O(10k) XLA CPU executables in one process; each
# keeps an LLVM-JIT (code, rodata, data) anonymous mapping triple alive, and
# the kernel's default vm.max_map_count (65530) is exhausted right around
# test_train — mmap then fails inside XLA compilation and the process dies
# with wandering SIGSEGVs (observed at 95% on three full-suite runs; a
# 15s-cadence watch showed 61k maps at 75%).  Raise the limit when we can
# (containers run the suite as root); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _map_count = int(_f.read())
    if _map_count < 262144:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("262144")
except OSError:
    pass


@pytest.fixture(autouse=True, scope="module")
def _reclaim_jit_mappings():
    """Per-module jax.clear_caches(): frees roughly half the dead
    executables' JIT mappings (measured) and bounds in-process growth —
    defense in depth for hosts where the map-count limit can't be raised."""
    yield
    jax.clear_caches()


REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
