"""Hierarchical sampling: importance samples concentrate where coarse
weights are; fine render matches plain render when weights are uniform."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.config import RenderConfig
from sfm_nerf_tpu.ops.render import (
    render_rays_hierarchical,
    sample_pdf,
)


def test_sample_pdf_concentrates_on_peak():
    n, s = 8, 64
    bins = jnp.linspace(2.0, 6.0, s - 1)[None].repeat(n, 0)
    w = np.full((n, s - 2), 1e-4, np.float32)
    w[:, 30:34] = 10.0                       # sharp peak near z ~ 4
    z = np.asarray(sample_pdf(jax.random.key(0), bins, jnp.asarray(w), 128))
    assert z.shape == (n, 128)
    frac_near_peak = ((z > 3.7) & (z < 4.4)).mean()
    assert frac_near_peak > 0.9, frac_near_peak


def test_sample_pdf_deterministic_mode():
    bins = jnp.linspace(0.0, 1.0, 9)[None]
    w = jnp.ones((1, 7))
    z = np.asarray(sample_pdf(None, bins, w, 16))
    assert (np.diff(z[0]) >= -1e-6).all()    # monotone under linspace u
    assert z.min() >= 0.0 and z.max() <= 1.0


def test_hierarchical_render_runs_and_improves_peak_capture():
    """A density spike narrower than the coarse spacing: fine pass must see
    it with many more samples than the coarse pass alone."""
    cfg = RenderConfig(n_sample=32, near=2.0, far=6.0, perturb=False)

    hits = {"coarse": 0, "fine": 0}

    def model(pts, dirs, tag):
        z = jnp.linalg.norm(pts, axis=-1)
        # thin shell at radius 4.0 (width 0.02)
        density = 50.0 * jnp.exp(-((z - 4.0) / 0.02) ** 2)[..., None]
        rgb = jnp.ones_like(pts) * 0.5
        hits[tag] = int(np.sum(np.abs(np.asarray(z) - 4.0) < 0.03))
        return density, rgb

    o = jnp.zeros((16, 3))
    d = np.zeros((16, 3), np.float32)
    d[:, 2] = 1.0
    d = jnp.asarray(d)
    out_f, out_c = render_rays_hierarchical(
        lambda p, dd: model(p, dd, "coarse"),
        lambda p, dd: model(p, dd, "fine"),
        o, d, cfg, n_importance=64, key=jax.random.key(1),
    )
    assert out_f.shape == (16, 3)
    assert np.isfinite(np.asarray(out_f)).all()
    assert hits["fine"] > hits["coarse"] * 2, hits
