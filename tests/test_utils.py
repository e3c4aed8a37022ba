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


def _ssim_oracle(p, t, max_val=1.0, sigma=1.5, radius=5):
    """Independent direct (non-separable) windowed SSIM: explicit 2D
    gaussian weights, one window at a time."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g1 = np.exp(-0.5 * (x / sigma) ** 2)
    w2 = np.outer(g1, g1)
    w2 = w2 / w2.sum()
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    h, w, c = p.shape
    vals = []
    for ch in range(c):
        for i in range(radius, h - radius):
            for j in range(radius, w - radius):
                wp = p[i - radius:i + radius + 1,
                       j - radius:j + radius + 1, ch]
                wt = t[i - radius:i + radius + 1,
                       j - radius:j + radius + 1, ch]
                mp, mt = (w2 * wp).sum(), (w2 * wt).sum()
                vp = (w2 * wp * wp).sum() - mp ** 2
                vt = (w2 * wt * wt).sum() - mt ** 2
                cov = (w2 * wp * wt).sum() - mp * mt
                vals.append(((2 * mp * mt + c1) * (2 * cov + c2))
                            / ((mp ** 2 + mt ** 2 + c1) * (vp + vt + c2)))
    return float(np.mean(vals))


def test_ssim_oracle_and_properties():
    from sfm_nerf_tpu.utils.metrics import ssim

    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (24, 20, 3))
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _ssim_oracle(a, b), atol=2e-5)
    # identity, symmetry, ordering under increasing noise
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.9999
    np.testing.assert_allclose(
        got, float(ssim(jnp.asarray(b), jnp.asarray(a))), atol=1e-6)
    worse = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1)
    assert float(ssim(jnp.asarray(a), jnp.asarray(worse))) < got
    # grayscale (H, W) input path
    assert float(ssim(jnp.asarray(a[..., 0]), jnp.asarray(a[..., 0]))) > 0.9999


def test_compilation_cache_dir_is_host_fingerprinted(monkeypatch, tmp_path):
    """The default cache dir must differ across host CPUs: loading a
    CPU-AOT cache entry written on another machine is a SIGSEGV, not an
    error (observed after a container host migration)."""
    import sfm_nerf_tpu.utils.compilation_cache as cc

    # an inherited explicit dir (e.g. a cached CI/suite run) wins by
    # design — clear it so the DEFAULT path is what's under test
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)

    fp = cc._host_fingerprint()
    assert fp and len(fp) == 12
    # deterministic on the same host
    assert cc._host_fingerprint() == fp

    # explicit env dir is used verbatim (caller owns its lifecycle),
    # even on CPU backends
    monkeypatch.setenv("SFM_NERF_JAX_CACHE", str(tmp_path / "explicit"))
    assert cc.enable_compilation_cache() == str(tmp_path / "explicit")
    monkeypatch.delenv("SFM_NERF_JAX_CACHE")

    # explicit opt-out
    monkeypatch.setenv("SFM_NERF_JAX_CACHE", "0")
    assert cc.enable_compilation_cache() is None
    monkeypatch.delenv("SFM_NERF_JAX_CACHE")

    # the default path embeds the fingerprint on EVERY backend (CPU
    # included — a warm Phase1 CPU run is 3.6x faster cached), and the
    # fingerprint includes the backend runtime build (libtpu rolls change
    # it: a cached executable from another build is rejected or divergent)
    import jax

    try:
        got = cc.enable_compilation_cache()
        fp_ver = cc._host_fingerprint(cc._backend_version())
        assert got is not None and got.endswith(f"jax-{fp_ver}")
        assert cc._backend_version()  # real backend reports a build string
        assert fp_ver != fp  # the runtime build participates
    finally:
        # the suite itself stays uncached: it holds O(10k) JIT mappings
        # near the vm.max_map_count ceiling (see conftest) and cache
        # serialization maps more
        jax.config.update("jax_compilation_cache_dir", None)
