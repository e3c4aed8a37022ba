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

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
