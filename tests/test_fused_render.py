"""Fused Pallas render kernel vs the pure-JAX reference path (interpret mode
on CPU; the same kernel compiles on TPU — exercised by bench/verify runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_nerf_tpu.config import NeRFModelConfig, RenderConfig
from sfm_nerf_tpu.kernels.fused_render import (
    fused_render_rays,
    pack_active_params,
)
from sfm_nerf_tpu.models import init_nerf_params, nerf_apply
from sfm_nerf_tpu.ops.render import render_rays, stratified_samples


@pytest.mark.parametrize("n_rays", [96, 130])
def test_fused_kernel_matches_xla_path(n_rays):
    mcfg = NeRFModelConfig(arch="active")
    rcfg = RenderConfig(n_sample=64, near=2.0, far=6.0, perturb=False)
    params = init_nerf_params(jax.random.key(0), mcfg)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), params)

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1, 1, (n_rays, 3)), jnp.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, n_rays, rcfg).astype(jnp.float32)

    # reference: XLA path with the same fixed z
    def model_fn(p, dd):
        return nerf_apply(params, p, dd, mcfg)

    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    density, rgb = model_fn(pts, dirs)
    from sfm_nerf_tpu.ops.render import composite

    expected, _, _ = composite(density, rgb, z, rcfg)

    packed = pack_active_params(params, dtype=jnp.float32)
    out = fused_render_rays(
        packed, o, d, z, mcfg, rcfg,
        ray_tile=32, sample_chunk=16, tiles_per_program=2, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=2e-3, atol=2e-3
    )


def test_fused_kernel_bf16_weights_close(rng):
    mcfg = NeRFModelConfig(arch="active")
    rcfg = RenderConfig(n_sample=32, perturb=False)
    params = init_nerf_params(jax.random.key(1), mcfg)
    o = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, 64, rcfg).astype(jnp.float32)

    out32 = fused_render_rays(
        pack_active_params(params, jnp.float32), o, d, z, mcfg, rcfg,
        ray_tile=32, sample_chunk=16, tiles_per_program=2, interpret=True,
    )
    out16 = fused_render_rays(
        pack_active_params(params, jnp.bfloat16), o, d, z, mcfg, rcfg,
        ray_tile=32, sample_chunk=16, tiles_per_program=2, interpret=True,
    )
    # bf16 weights cost <1% absolute rgb error on a random init
    assert np.abs(np.asarray(out16) - np.asarray(out32)).max() < 1e-2


def test_fused_kernel_legacy_variant(rng):
    """Legacy (gif) compositor: inclusive transmittance + 1.0 tail pad."""
    from sfm_nerf_tpu.ops.render import composite

    mcfg = NeRFModelConfig(arch="active")
    rcfg = RenderConfig(n_sample=32, near=1.0, far=10.0, perturb=False,
                        variant="legacy")
    params = init_nerf_params(jax.random.key(3), mcfg)
    o = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, 64, rcfg).astype(jnp.float32)

    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    density, rgb = nerf_apply(params, pts, dirs, mcfg)
    expected, _, _ = composite(density, rgb, z, rcfg)

    out = fused_render_rays(
        pack_active_params(params, jnp.float32), o, d, z, mcfg, rcfg,
        ray_tile=32, sample_chunk=16, tiles_per_program=2, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=2e-3, atol=2e-3
    )


def test_fused_kernel_white_background(rng):
    from sfm_nerf_tpu.ops.render import composite

    mcfg = NeRFModelConfig(arch="active")
    rcfg = RenderConfig(n_sample=32, perturb=False, white_background=True)
    params = init_nerf_params(jax.random.key(5), mcfg)
    o = jnp.asarray(rng.uniform(-1, 1, (32, 3)), jnp.float32)
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, 32, rcfg).astype(jnp.float32)
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    density, rgb = nerf_apply(params, pts, dirs, mcfg)
    expected, _, _ = composite(density, rgb, z, rcfg)
    out = fused_render_rays(
        pack_active_params(params, jnp.float32), o, d, z, mcfg, rcfg,
        ray_tile=32, sample_chunk=16, tiles_per_program=1, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=2e-3, atol=2e-3
    )
    # legacy + white is rejected (weights don't telescope)
    with pytest.raises(NotImplementedError):
        fused_render_rays(
            pack_active_params(params, jnp.float32), o, d, z, mcfg,
            RenderConfig(n_sample=32, variant="legacy", white_background=True),
            ray_tile=32, sample_chunk=16, tiles_per_program=1, interpret=True,
        )


def test_render_image_fused_option_interpret(monkeypatch, tmp_path):
    """make_render_image(use_fused_kernel=True) routes through the kernel
    (interpret on CPU) and matches the XLA path."""
    from sfm_nerf_tpu.config import NeRFPipelineConfig
    import sfm_nerf_tpu.kernels.fused_render as fr
    from sfm_nerf_tpu.train.nerf_trainer import make_render_image

    # force interpret + small chunks inside the render path
    orig = fr.fused_render_rays

    def interp(*a, **kw):
        kw.update(interpret=True, sample_chunk=32, ray_tile=32,
                  tiles_per_program=1)
        return orig(*a, **kw)

    monkeypatch.setattr(fr, "fused_render_rays", interp)
    # the render path gates the kernel off on CPU backends; pretend TPU so
    # the interpret-mode kernel route is exercised
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    cfg_x = NeRFPipelineConfig(
        model=NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1),
        render=RenderConfig(n_sample=128, perturb=False),
    )
    cfg_f = NeRFPipelineConfig(
        model=cfg_x.model,
        render=RenderConfig(n_sample=128, perturb=False,
                            use_fused_kernel=True),
    )
    params = init_nerf_params(jax.random.key(0), cfg_x.model)
    K = jnp.asarray([[30.0, 0, 8], [0, 30.0, 8], [0, 0, 1.0]], jnp.float32)
    pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    img_x = np.asarray(make_render_image(cfg_x)(params, K, pose, 16, 16))
    img_f = np.asarray(make_render_image(cfg_f)(params, K, pose, 16, 16))
    np.testing.assert_allclose(img_f, img_x, rtol=5e-2, atol=5e-3)


def test_ext_features_layout_oracle():
    """pe_trig_matrices_ext + the kernels' lane select must reproduce
    [x ++ PE(x) ++ 0] exactly: identity lanes carry x bit-for-bit (the
    FMA against the identity columns is x0*1 + x1*0 + x2*0), trig lanes
    match positional_encoding's column order, the pad lane is zero."""
    from sfm_nerf_tpu.kernels.fused_render import pe_trig_matrices_ext
    from sfm_nerf_tpu.kernels.fused_train import _ext_features
    from sfm_nerf_tpu.ops.encoding import positional_encoding

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(17, 3)) * 4, jnp.float32)
    for L in (1, 4, 10):
        mat, phase = pe_trig_matrices_ext(L)
        assert mat.shape == (3, 4 + 6 * L)
        ext = np.asarray(_ext_features(x, jnp.asarray(mat),
                                       jnp.asarray(phase)))
        # identity lanes: exact
        np.testing.assert_array_equal(ext[:, :3], np.asarray(x))
        # pad lane: exactly zero
        np.testing.assert_array_equal(ext[:, -1], np.zeros(x.shape[0]))
        # trig lanes: match the XLA-path encoding (fast_sin vs jnp.sin
        # agree to ~1e-6 over this phase range)
        oracle = np.asarray(positional_encoding(x, L))  # [x, trig]
        np.testing.assert_allclose(
            ext[:, 3:-1], oracle[:, 3:], atol=2e-6, rtol=0)


@pytest.mark.parametrize("variant", ["train", "legacy"])
def test_fused_kernel_legacy_arch(rng, variant):
    """Legacy ARCHITECTURE (the Sequential variant every shipped reference
    .pth serializes) through the fused kernel: block2_2 runs as the packed
    densfeat layer with relu (not softplus) density."""
    from sfm_nerf_tpu.kernels.fused_render import pack_nerf_params
    from sfm_nerf_tpu.ops.render import composite

    mcfg = NeRFModelConfig(arch="legacy", hidden=64)
    rcfg = RenderConfig(n_sample=32, near=1.0, far=10.0, perturb=False,
                        variant=variant)
    params = init_nerf_params(jax.random.key(5), mcfg)
    o = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, 64, rcfg).astype(jnp.float32)

    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    density, rgb = nerf_apply(params, pts, dirs, mcfg)
    expected, _, _ = composite(density, rgb, z, rcfg)

    out = fused_render_rays(
        pack_nerf_params(params, mcfg, jnp.float32), o, d, z, mcfg, rcfg,
        ray_tile=32, sample_chunk=16, tiles_per_program=2, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=2e-3, atol=2e-3
    )


def test_fused_kernel_no_pos_encoding(rng):
    """The PE-ablation layout (reference checkpoints_no_pos_encoding):
    skip-less legacy net fed raw 3-d coords — ext degenerates to
    [x ++ pad] and fc1/rgb1 carry the 3->4 input-row pad."""
    from sfm_nerf_tpu.kernels.fused_render import pack_nerf_params
    from sfm_nerf_tpu.ops.render import composite

    mcfg = NeRFModelConfig(arch="legacy", hidden=64, pos_encoding=False,
                           has_skip=False, n_block1_layers=5)
    rcfg = RenderConfig(n_sample=32, near=1.0, far=10.0, perturb=False,
                        variant="legacy")
    params = init_nerf_params(jax.random.key(6), mcfg)
    o = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, 64, rcfg).astype(jnp.float32)

    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    density, rgb = nerf_apply(params, pts, dirs, mcfg)
    expected, _, _ = composite(density, rgb, z, rcfg)

    out = fused_render_rays(
        pack_nerf_params(params, mcfg, jnp.float32), o, d, z, mcfg, rcfg,
        ray_tile=32, sample_chunk=16, tiles_per_program=2, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("path", [
    "/root/reference/Phase2/checkpoints/chair/final_model.pth",
    "/root/reference/Phase2/checkpoints_no_pos_encoding/final_model.pth",
])
def test_fused_kernel_chair_checkpoint(rng, path):
    """The real shipped .pth checkpoints (chair + the no-PE ablation)
    through convert -> pack -> fused kernel (interpret) vs the XLA legacy
    path — pins the exact artifact route the gif CLI now takes on TPU."""
    import os

    if not os.path.exists(path):
        pytest.skip("reference checkpoint not available")
    from sfm_nerf_tpu.kernels.fused_render import pack_nerf_params
    from sfm_nerf_tpu.models.convert import convert_pth
    from sfm_nerf_tpu.ops.render import composite

    params, mcfg = convert_pth(path)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params)
    rcfg = RenderConfig(n_sample=32, near=2.0, far=6.0, perturb=False,
                        variant="legacy")
    o = jnp.asarray(rng.uniform(-0.5, 0.5, (32, 3)), jnp.float32)
    o = o.at[:, 2].add(-4.0)
    d = rng.normal(size=(32, 3)).astype(np.float32) + np.array([0, 0, 1.0],
                                                               np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, 32, rcfg).astype(jnp.float32)

    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    density, rgb = nerf_apply(params, pts, dirs, mcfg)
    expected, _, _ = composite(density, rgb, z, rcfg)

    out = fused_render_rays(
        pack_nerf_params(params, mcfg, jnp.float32), o, d, z, mcfg, rcfg,
        ray_tile=32, sample_chunk=16, tiles_per_program=1, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=2e-3, atol=2e-3
    )


def test_fused_weights_output_matches_composite(rng):
    """fused_render_rays_weights' second output == composite()'s per-sample
    weights (the sample_pdf / weight_maps inputs)."""
    from sfm_nerf_tpu.kernels.fused_render import (
        fused_render_rays_weights, pack_nerf_params,
    )
    from sfm_nerf_tpu.ops.render import composite

    mcfg = NeRFModelConfig(arch="active", hidden=64)
    rcfg = RenderConfig(n_sample=32, perturb=False)
    params = init_nerf_params(jax.random.key(7), mcfg)
    o = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, 64, rcfg).astype(jnp.float32)

    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    density, rgb = nerf_apply(params, pts, dirs, mcfg)
    exp_rgb, exp_w, _ = composite(density, rgb, z, rcfg)

    out_rgb, out_w = fused_render_rays_weights(
        pack_nerf_params(params, mcfg, jnp.float32), o, d, z, mcfg, rcfg,
        ray_tile=32, sample_chunk=16, tiles_per_program=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(exp_rgb),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(exp_w),
                               rtol=2e-3, atol=2e-3)


def _force_interpret_kernels(monkeypatch):
    import sfm_nerf_tpu.kernels.fused_render as fr

    for fname in ("fused_render_rays", "fused_render_rays_weights"):
        orig = getattr(fr, fname)

        def interp(*a, _orig=orig, **kw):
            kw.update(interpret=True, sample_chunk=32, ray_tile=32,
                      tiles_per_program=1)
            return _orig(*a, **kw)

        monkeypatch.setattr(fr, fname, interp)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def test_render_image_fused_hierarchical_interpret(monkeypatch):
    """Hierarchical make_render_image routes through the fused
    coarse(weights) -> sample_pdf -> fused fine chain and matches the XLA
    hierarchical path."""
    from sfm_nerf_tpu.config import NeRFPipelineConfig
    from sfm_nerf_tpu.train.nerf_trainer import make_render_image

    _force_interpret_kernels(monkeypatch)
    mcfg = NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1)
    cfg_x = NeRFPipelineConfig(
        model=mcfg,
        render=RenderConfig(n_sample=128, n_importance=128, perturb=False),
    )
    cfg_f = NeRFPipelineConfig(
        model=mcfg,
        render=RenderConfig(n_sample=128, n_importance=128, perturb=False,
                            use_fused_kernel=True),
    )
    params = {
        "coarse": init_nerf_params(jax.random.key(0), mcfg),
        "fine": init_nerf_params(jax.random.key(1), mcfg),
    }
    K = jnp.asarray([[30.0, 0, 8], [0, 30.0, 8], [0, 0, 1.0]], jnp.float32)
    pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    img_x = np.asarray(make_render_image(cfg_x)(params, K, pose, 16, 16))
    img_f = np.asarray(make_render_image(cfg_f)(params, K, pose, 16, 16))
    np.testing.assert_allclose(img_f, img_x, rtol=5e-2, atol=5e-3)


def test_render_image_aux_fused_interpret(monkeypatch):
    """make_render_image_aux routes fused (flat AND hierarchical) and its
    depth/disp/acc maps match the XLA aux renderers."""
    from sfm_nerf_tpu.config import NeRFPipelineConfig
    from sfm_nerf_tpu.train.nerf_trainer import make_render_image_aux

    _force_interpret_kernels(monkeypatch)
    mcfg = NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1)
    K = jnp.asarray([[30.0, 0, 8], [0, 30.0, 8], [0, 0, 1.0]], jnp.float32)
    pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)

    # flat
    cfg_x = NeRFPipelineConfig(
        model=mcfg, render=RenderConfig(n_sample=128, perturb=False))
    cfg_f = NeRFPipelineConfig(
        model=mcfg, render=RenderConfig(n_sample=128, perturb=False,
                                        use_fused_kernel=True))
    params = init_nerf_params(jax.random.key(0), mcfg)
    out_x = make_render_image_aux(cfg_x)(params, K, pose, 16, 16)
    out_f = make_render_image_aux(cfg_f)(params, K, pose, 16, 16)
    for a, b in zip(out_f, out_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)

    # hierarchical
    cfg_xh = NeRFPipelineConfig(
        model=mcfg,
        render=RenderConfig(n_sample=128, n_importance=128, perturb=False))
    cfg_fh = NeRFPipelineConfig(
        model=mcfg,
        render=RenderConfig(n_sample=128, n_importance=128, perturb=False,
                            use_fused_kernel=True))
    params_h = {
        "coarse": init_nerf_params(jax.random.key(0), mcfg),
        "fine": init_nerf_params(jax.random.key(1), mcfg),
    }
    out_x = make_render_image_aux(cfg_xh)(params_h, K, pose, 16, 16)
    out_f = make_render_image_aux(cfg_fh)(params_h, K, pose, 16, 16)
    for a, b in zip(out_f, out_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)


@pytest.mark.parametrize("variant", ["train", "legacy"])
def test_fused_kernel_sample_padding(variant):
    """n_sample NOT a chunk multiple: zero-dist duplicate padding must be
    an exact no-op for BOTH compositor variants, and the weights output
    must come back trimmed to the caller's width."""
    from sfm_nerf_tpu.kernels.fused_render import fused_render_rays_weights
    from sfm_nerf_tpu.ops.render import composite

    mcfg = NeRFModelConfig(arch="active", hidden=32, n_pos_freq=4,
                           n_dir_freq=2)
    rcfg = RenderConfig(n_sample=24, near=2.0, far=6.0, perturb=False,
                        variant=variant)                # 24 % 16 != 0
    params = init_nerf_params(jax.random.key(0), mcfg)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), params)
    rng = np.random.default_rng(3)
    n_rays = 32
    o = jnp.asarray(rng.uniform(-1, 1, (n_rays, 3)), jnp.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, n_rays, rcfg).astype(jnp.float32)

    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    density, rgb = nerf_apply(params, pts, dirs, mcfg)
    expected, w_xla, _ = composite(density, rgb, z, rcfg)

    packed = pack_active_params(params, dtype=jnp.float32)
    out, w = fused_render_rays_weights(
        packed, o, d, z, mcfg, rcfg,
        ray_tile=32, sample_chunk=16, tiles_per_program=1, interpret=True,
    )
    assert w.shape == z.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_xla),
                               rtol=5e-4, atol=1e-6)
