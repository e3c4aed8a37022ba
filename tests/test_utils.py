"""Profiling / debugging utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_nerf_tpu.utils.debug import assert_all_finite, nan_debugging
from sfm_nerf_tpu.utils.metrics import mse, psnr, psnr_from_mse
from sfm_nerf_tpu.utils.profiling import StepTimer, device_memory_stats


def test_step_timer_separates_compile_from_steady():
    t = StepTimer()
    import time

    with t:
        time.sleep(0.05)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["compile_call_s"] >= 0.05
    assert 0.005 < s["steady_mean_s"] < 0.05
    assert s["n_steady"] == 3


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": jnp.asarray([1.0, np.nan])}, "bad")


def test_nan_debugging_context_traps_and_restores():
    prev = jax.config.jax_debug_nans
    with nan_debugging():
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    assert jax.config.jax_debug_nans == prev


def test_psnr_relationships():
    a = jnp.zeros((4, 4, 3))
    b = jnp.full((4, 4, 3), 0.1)
    m = mse(a, b)
    np.testing.assert_allclose(float(m), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)
    np.testing.assert_allclose(
        float(psnr_from_mse(m)), float(psnr(a, b)), rtol=1e-6
    )


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1
