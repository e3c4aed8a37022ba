"""Volume-rendering ops against closed-form and numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.config import RenderConfig
from sfm_nerf_tpu.ops.render import (
    composite,
    render_rays,
    render_rays_chunked,
    stratified_samples,
)


def test_stratified_train_variant_bounds():
    cfg = RenderConfig(n_sample=64, near=2.0, far=6.0, perturb=True)
    z = np.asarray(stratified_samples(jax.random.key(0), 16, cfg))
    assert z.shape == (16, 64)
    assert (z >= 2.0 - 1e-6).all() and (z <= 6.0 + 1e-6).all()
    assert (np.diff(z, axis=-1) > 0).all()  # stratified: still sorted


def test_stratified_no_perturb_is_linspace():
    cfg = RenderConfig(n_sample=8, near=1.0, far=3.0, perturb=False)
    z = np.asarray(stratified_samples(None, 2, cfg))
    np.testing.assert_allclose(z[0], np.linspace(1.0, 3.0, 8), rtol=1e-6)


def test_stratified_legacy_bins():
    cfg = RenderConfig(n_sample=10, near=1.0, far=11.0, perturb=True,
                       variant="legacy")
    z = np.asarray(stratified_samples(jax.random.key(1), 32, cfg))
    # each sample must stay within its own bin: z_i in [near+i, near+i+1)
    lower = 1.0 + np.arange(10)
    assert ((z >= lower) & (z < lower + 1.0)).all()


def test_stratified_lindisp_uniform_in_inverse_depth():
    """--lindisp: no-perturb samples are exactly linspace in 1/z, stay in
    [near, far] sorted, and concentrate near the near plane."""
    cfg = RenderConfig(n_sample=64, near=0.2, far=57.0, perturb=False,
                      lindisp=True)
    z = np.asarray(stratified_samples(None, 2, cfg))
    np.testing.assert_allclose(
        1.0 / z[0], np.linspace(1 / 0.2, 1 / 57.0, 64), rtol=1e-5
    )
    cfg_p = RenderConfig(n_sample=64, near=0.2, far=57.0, perturb=True,
                         lindisp=True)
    zp = np.asarray(stratified_samples(jax.random.key(0), 16, cfg_p))
    assert (zp >= 0.2 - 1e-6).all() and (zp <= 57.0 + 1e-6).all()
    assert (np.diff(zp, axis=-1) > 0).all()
    # a 285x depth range: uniform-in-z would put the median sample at ~28;
    # inverse-depth sampling keeps it below 1
    assert np.median(zp) < 1.0


def test_stratified_lindisp_legacy_variant_bins():
    """Legacy per-bin jitter composes with the lindisp map: each sample
    stays inside its own (inverse-depth) bin."""
    cfg = RenderConfig(n_sample=10, near=1.0, far=11.0, perturb=True,
                      variant="legacy", lindisp=True)
    z = np.asarray(stratified_samples(jax.random.key(1), 32, cfg))
    t_edges = np.arange(11) / 10.0
    z_edges = 1.0 / (1.0 / 1.0 * (1 - t_edges) + 1.0 / 11.0 * t_edges)
    assert ((z >= z_edges[:-1]) & (z < z_edges[1:])).all()
    assert (np.diff(z, axis=-1) > 0).all()


def _np_composite(density, rgb, z, variant):
    pad = 1e-3 if variant == "train" else 1.0
    dists = np.concatenate(
        [z[..., 1:] - z[..., :-1], np.full_like(z[..., :1], pad)], -1
    )
    alpha = 1.0 - np.exp(-density[..., 0] * dists)
    cp = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
    if variant == "train":
        trans = np.concatenate([np.ones_like(cp[..., :1]), cp[..., :-1]], -1)
    else:
        trans = cp
    w = alpha * trans
    return (w[..., None] * rgb).sum(-2), w


def test_composite_matches_numpy_oracle_both_variants(rng):
    density = rng.uniform(0, 5, (8, 32, 1)).astype(np.float32)
    rgb = rng.uniform(0, 1, (8, 32, 3)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, (8, 32)).astype(np.float32), axis=-1)
    for variant in ("train", "legacy"):
        cfg = RenderConfig(n_sample=32, variant=variant)
        out, w, acc = composite(
            jnp.asarray(density), jnp.asarray(rgb), jnp.asarray(z), cfg
        )
        exp_rgb, exp_w = _np_composite(density, rgb, z, variant)
        np.testing.assert_allclose(np.asarray(out), exp_rgb, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), exp_w, rtol=1e-4, atol=1e-5)


def test_composite_opaque_surface():
    """A single opaque sample should dominate the output color."""
    cfg = RenderConfig(n_sample=16, variant="train")
    density = np.zeros((1, 16, 1), np.float32)
    density[0, 5, 0] = 1e6            # opaque wall at sample 5
    rgb = np.zeros((1, 16, 3), np.float32)
    rgb[0, 5] = [0.2, 0.5, 0.9]
    z = np.linspace(2, 6, 16, dtype=np.float32)[None]
    out, w, acc = composite(jnp.asarray(density), jnp.asarray(rgb), jnp.asarray(z), cfg)
    np.testing.assert_allclose(np.asarray(out)[0], [0.2, 0.5, 0.9], atol=1e-5)
    assert float(acc[0]) > 0.999


def test_chunked_render_equals_unchunked(rng):
    cfg = RenderConfig(n_sample=24, perturb=False)

    def toy_model(pts, dirs):
        density = jnp.sum(pts**2, -1, keepdims=True) * 0.3
        rgb = jax.nn.sigmoid(pts + 0.1 * dirs)
        return density, rgb

    o = jnp.asarray(rng.normal(size=(333, 3)).astype(np.float32))
    d = rng.normal(size=(333, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    full = render_rays(toy_model, o, d, cfg)
    chunked = render_rays_chunked(toy_model, o, d, cfg, chunk_rays=64)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# auxiliary maps (depth / disparity / acc) — ADDITION, no reference analog
# ---------------------------------------------------------------------------

def test_weight_maps_opaque_surface_depth():
    """An opaque wall at sample k should put the depth map at z[k]."""
    from sfm_nerf_tpu.ops.render import weight_maps

    cfg = RenderConfig(n_sample=16, variant="train")
    density = np.zeros((1, 16, 1), np.float32)
    density[0, 5, 0] = 1e6
    rgb = np.zeros((1, 16, 3), np.float32)
    z = np.linspace(2, 6, 16, dtype=np.float32)[None]
    _, w, acc = composite(jnp.asarray(density), jnp.asarray(rgb),
                          jnp.asarray(z), cfg)
    depth, disp = weight_maps(np.asarray(w), jnp.asarray(z), acc)
    np.testing.assert_allclose(float(depth[0]), z[0, 5], atol=1e-4)
    np.testing.assert_allclose(float(disp[0]), 1.0 / z[0, 5], rtol=1e-4)


def test_weight_maps_numpy_oracle(rng):
    from sfm_nerf_tpu.ops.render import weight_maps

    w = rng.uniform(0, 0.1, (6, 32)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, (6, 32)).astype(np.float32), -1)
    acc = w.sum(-1)
    depth, disp = weight_maps(jnp.asarray(w), jnp.asarray(z), jnp.asarray(acc))
    exp_depth = (w * z).sum(-1)
    np.testing.assert_allclose(np.asarray(depth), exp_depth, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(disp), 1.0 / np.maximum(1e-10, exp_depth / acc), rtol=1e-4)


def test_chunked_aux_matches_unchunked(rng):
    from sfm_nerf_tpu.ops.render import render_rays_aux, render_rays_chunked_aux

    cfg = RenderConfig(n_sample=24, perturb=False)

    def toy_model(pts, dirs):
        density = jnp.sum(pts**2, -1, keepdims=True) * 0.3
        rgb = jax.nn.sigmoid(pts + 0.1 * dirs)
        return density, rgb

    o = jnp.asarray(rng.normal(size=(133, 3)).astype(np.float32))
    d = rng.normal(size=(133, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    rgb_f, depth_f, disp_f, acc_f = render_rays_aux(toy_model, o, d, cfg)
    rgb_c, depth_c, disp_c, acc_c = render_rays_chunked_aux(
        toy_model, o, d, cfg, chunk_rays=32)
    # rgb also must match the rgb-only path exactly
    rgb_plain = render_rays(toy_model, o, d, cfg)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_plain),
                               rtol=1e-6, atol=1e-7)
    for a, b in ((rgb_c, rgb_f), (depth_c, depth_f), (disp_c, disp_f),
                 (acc_c, acc_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_hierarchical_aux_rgb_matches_plain(rng):
    from sfm_nerf_tpu.ops.render import (
        render_rays_hierarchical, render_rays_hierarchical_aux,
    )

    cfg = RenderConfig(n_sample=16, perturb=True)

    def toy_model(pts, dirs):
        density = jnp.sum(pts**2, -1, keepdims=True) * 0.3
        rgb = jax.nn.sigmoid(pts + 0.1 * dirs)
        return density, rgb

    o = jnp.asarray(rng.normal(size=(21, 3)).astype(np.float32))
    d = rng.normal(size=(21, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    key = jax.random.key(3)
    rgb_f, _ = render_rays_hierarchical(toy_model, toy_model, o, d, cfg, 8, key)
    rgb_a, depth, disp, acc = render_rays_hierarchical_aux(
        toy_model, toy_model, o, d, cfg, 8, key)
    np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_f),
                               rtol=1e-6, atol=1e-7)
    z = np.asarray(depth)
    assert z.shape == (21,) and np.isfinite(z).all()
    assert (z >= cfg.near - 1e-5).all() and (z <= cfg.far + 1e-5).all()
    assert np.isfinite(np.asarray(disp)).all()
    assert (np.asarray(acc) >= 0).all()
