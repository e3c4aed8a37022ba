"""Hand-written fused backward vs jax.grad of the XLA path (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.config import NeRFModelConfig, RenderConfig
from sfm_nerf_tpu.kernels.fused_render import pack_active_params
from sfm_nerf_tpu.kernels.fused_train import fused_render_train
from sfm_nerf_tpu.models import init_nerf_params, nerf_apply
from sfm_nerf_tpu.ops.render import composite, stratified_samples


def setup(n_rays=32, n_sample=32, hidden=32, seed=0):
    mcfg = NeRFModelConfig(arch="active", hidden=hidden, n_pos_freq=4,
                           n_dir_freq=2)
    rcfg = RenderConfig(n_sample=n_sample, near=2.0, far=6.0, perturb=False)
    params = init_nerf_params(jax.random.key(seed), mcfg)
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-1, 1, (n_rays, 3)), jnp.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, n_rays, rcfg).astype(jnp.float32)
    target = jnp.asarray(rng.uniform(0, 1, (n_rays, 3)), jnp.float32)
    return mcfg, rcfg, params, o, d, z, target


def xla_loss(params, mcfg, rcfg, o, d, z, target):
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    density, rgb = nerf_apply(params, pts, dirs, mcfg)
    out, _, _ = composite(density, rgb, z, rcfg)
    return jnp.mean((out - target) ** 2)


def kernel_loss(params, mcfg, rcfg, o, d, z, target):
    packed = pack_active_params(params, jnp.float32)
    out = fused_render_train(
        packed, o, d, z, mcfg, rcfg,
        ray_tile=16, sample_chunk=16, tiles_per_program=1, interpret=True,
    )
    return jnp.mean((out - target) ** 2)


def test_fused_train_forward_matches_xla():
    mcfg, rcfg, params, o, d, z, target = setup()
    lx = float(xla_loss(params, mcfg, rcfg, o, d, z, target))
    lk = float(kernel_loss(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lk, lx, rtol=1e-4)


def test_fused_train_grads_match_xla():
    mcfg, rcfg, params, o, d, z, target = setup()
    gx = jax.grad(xla_loss)(params, mcfg, rcfg, o, d, z, target)
    gk = jax.grad(kernel_loss)(params, mcfg, rcfg, o, d, z, target)
    for (pathx, lx), (pathk, lk) in zip(
        jax.tree_util.tree_flatten_with_path(gx)[0],
        jax.tree_util.tree_flatten_with_path(gk)[0],
    ):
        assert pathx == pathk
        a, b = np.asarray(lx), np.asarray(lk)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=5e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pathx)}",
        )


def test_fused_training_loss_path(monkeypatch, tmp_path):
    """make_loss_fn routes through the fused custom-VJP path and a training
    step reduces the loss (interpret mode, CPU)."""
    import os

    import optax

    import sfm_nerf_tpu.kernels.fused_train as ft
    from sfm_nerf_tpu.config import (
        NeRFPipelineConfig, TrainConfig,
    )
    from sfm_nerf_tpu.io.blender import load_blender_dataset
    from sfm_nerf_tpu.train import nerf_trainer as nt
    from util_synthetic import make_blender_dataset

    orig = ft.fused_render_train
    orig_merged = ft.fused_mse_loss

    def interp(packed, o, d, z, mcfg, rcfg, **kw):
        return orig(packed, o, d, z, mcfg, rcfg,
                    ray_tile=16, sample_chunk=16, tiles_per_program=1,
                    interpret=True)

    def interp_merged(packed, o, d, z, target, mcfg, rcfg, **kw):
        return orig_merged(packed, o, d, z, target, mcfg, rcfg,
                           ray_tile=16, sample_chunk=16, tiles_per_program=1,
                           interpret=True)

    monkeypatch.setattr(ft, "fused_render_train", interp)
    monkeypatch.setattr(ft, "fused_mse_loss", interp_merged)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    root = make_blender_dataset(str(tmp_path / "d"), n_frames=2,
                                height=16, width=16)
    images, poses, cam = load_blender_dataset(root, "train")
    cfg = NeRFPipelineConfig(
        model=NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1),
        render=RenderConfig(n_sample=128, perturb=False,
                            use_fused_kernel=True),
        train=TrainConfig(n_rays_batch=64, lrate=5e-3, val_every=0),
    )
    tx = nt.make_optimizer(cfg)
    params = nt.init_nerf_params(jax.random.key(0), cfg.model)
    opt = tx.init(params)
    loss_fn = nt.make_loss_fn(cfg)
    im, po, K = (jnp.asarray(images), jnp.asarray(poses),
                 jnp.asarray(cam.camera_matrix))
    key = jax.random.key(1)
    losses = []
    for i in range(30):
        key, ks, kr = jax.random.split(key, 3)
        loss, grads = jax.value_and_grad(loss_fn)(params, ks, kr, im, po, K)
        up, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, up)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def merged_loss(params, mcfg, rcfg, o, d, z, target):
    from sfm_nerf_tpu.kernels.fused_train import fused_mse_loss

    packed = pack_active_params(params, jnp.float32)
    return fused_mse_loss(
        packed, o, d, z, target, mcfg, rcfg,
        ray_tile=16, sample_chunk=16, tiles_per_program=1, interpret=True,
    )


def test_merged_step_loss_matches_xla():
    mcfg, rcfg, params, o, d, z, target = setup()
    lx = float(xla_loss(params, mcfg, rcfg, o, d, z, target))
    lm = float(merged_loss(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lm, lx, rtol=1e-4)


def test_merged_step_grads_match_xla():
    """The merged fwd+bwd kernel's in-kernel MSE cotangent + stored-
    activation backward produce the same parameter grads as jax.grad of
    the XLA path (and thus as the recompute kernel)."""
    mcfg, rcfg, params, o, d, z, target = setup()
    gx = jax.grad(xla_loss)(params, mcfg, rcfg, o, d, z, target)
    gm = jax.grad(merged_loss)(params, mcfg, rcfg, o, d, z, target)
    for (pathx, lx), (pathk, lk) in zip(
        jax.tree_util.tree_flatten_with_path(gx)[0],
        jax.tree_util.tree_flatten_with_path(gm)[0],
    ):
        assert pathx == pathk
        a, b = np.asarray(lx), np.asarray(lk)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=5e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pathx)}",
        )


def test_merged_step_pads_partial_batch():
    """Ray counts that don't fill the last program: padded rays must not
    leak into loss or grads (the in-kernel cotangent column is zeroed)."""
    mcfg, rcfg, params, o, d, z, target = setup(n_rays=24)
    lx = float(xla_loss(params, mcfg, rcfg, o, d, z, target))
    lm = float(merged_loss(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lm, lx, rtol=1e-4)
    gx = jax.grad(xla_loss)(params, mcfg, rcfg, o, d, z, target)
    gm = jax.grad(merged_loss)(params, mcfg, rcfg, o, d, z, target)
    for (_, lx_), (_, lm_) in zip(
        jax.tree_util.tree_flatten_with_path(gx)[0],
        jax.tree_util.tree_flatten_with_path(gm)[0],
    ):
        a, b = np.asarray(lx_), np.asarray(lm_)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-4 * scale)


def _assert_grads_close(gx, gk, rtol=5e-3, atol_scale=5e-4):
    for (pathx, lx), (pathk, lk) in zip(
        jax.tree_util.tree_flatten_with_path(gx)[0],
        jax.tree_util.tree_flatten_with_path(gk)[0],
    ):
        assert pathx == pathk
        a, b = np.asarray(lx), np.asarray(lk)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=rtol, atol=atol_scale * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pathx)}",
        )


def test_white_background_matches_xla():
    """White-background compositing (reference train.py:268-270) through
    both fused paths: forward adds (1 - sum w), backward shifts the
    compositing cotangent by -sum(g)."""
    import dataclasses

    mcfg, rcfg, params, o, d, z, target = setup()
    rcfg = dataclasses.replace(rcfg, white_background=True)
    lx = float(xla_loss(params, mcfg, rcfg, o, d, z, target))
    lk = float(kernel_loss(params, mcfg, rcfg, o, d, z, target))
    lm = float(merged_loss(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lk, lx, rtol=1e-4)
    np.testing.assert_allclose(lm, lx, rtol=1e-4)
    gx = jax.grad(xla_loss)(params, mcfg, rcfg, o, d, z, target)
    _assert_grads_close(gx, jax.grad(kernel_loss)(
        params, mcfg, rcfg, o, d, z, target))
    _assert_grads_close(gx, jax.grad(merged_loss)(
        params, mcfg, rcfg, o, d, z, target))


def test_scan_composite_matches_xla(monkeypatch):
    """The lane-scan compositing implementation (prefix product + suffix
    sum via pltpu.roll, FUSED_COMPOSITE=scan) matches the XLA reference in
    loss and grads exactly like the tridot formulation."""
    import sfm_nerf_tpu.kernels.fused_train as ft

    monkeypatch.setattr(ft, "COMPOSITE_IMPL", "scan")
    mcfg, rcfg, params, o, d, z, target = setup()
    lx = float(xla_loss(params, mcfg, rcfg, o, d, z, target))
    lm = float(merged_loss(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lm, lx, rtol=1e-4)
    gx = jax.grad(xla_loss)(params, mcfg, rcfg, o, d, z, target)
    _assert_grads_close(gx, jax.grad(merged_loss)(
        params, mcfg, rcfg, o, d, z, target))
    # two-kernel path under scan as well
    _assert_grads_close(gx, jax.grad(kernel_loss)(
        params, mcfg, rcfg, o, d, z, target))


def test_fused_hierarchical_matches_xla():
    """Fused coarse(+weights) -> sample_pdf -> fused fine pipeline: loss and
    grads (both models) match the XLA hierarchical path with detached
    weights (interpret mode)."""
    from sfm_nerf_tpu.kernels.fused_train import (
        fused_mse_loss, fused_mse_loss_weights,
    )
    from sfm_nerf_tpu.ops.render import render_rays_hierarchical, sample_pdf

    mcfg, rcfg, params_c, o, d, z, target = setup(n_rays=16, n_sample=32)
    params_f = init_nerf_params(jax.random.key(9), mcfg)
    params = {"coarse": params_c, "fine": params_f}
    n_imp = 16
    kw = dict(ray_tile=16, sample_chunk=16, tiles_per_program=1,
              interpret=True)

    def fused_loss(params):
        packed_c = pack_active_params(params["coarse"], jnp.float32)
        packed_f = pack_active_params(params["fine"], jnp.float32)
        loss_c, weights = fused_mse_loss_weights(
            packed_c, o, d, z, target, mcfg, rcfg, **kw)
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        z_fine = sample_pdf(None, mids, weights[..., 1:-1], n_imp)
        z_all = jnp.sort(jnp.concatenate([z, z_fine], -1), -1)
        loss_f = fused_mse_loss(
            packed_f, o, d, z_all, target, mcfg, rcfg, **kw)
        return loss_f + loss_c

    def xla_loss_h(params):
        coarse_fn = lambda p, dd: nerf_apply(params["coarse"], p, dd, mcfg)
        fine_fn = lambda p, dd: nerf_apply(params["fine"], p, dd, mcfg)
        rgb_f, rgb_c = render_rays_hierarchical(
            coarse_fn, fine_fn, o, d, rcfg, n_imp, None)
        return jnp.mean((rgb_f - target) ** 2) + jnp.mean(
            (rgb_c - target) ** 2)

    lx, gx = jax.value_and_grad(xla_loss_h)(params)
    lk, gk = jax.value_and_grad(fused_loss)(params)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-4)
    for (pathx, a), (pathk, b) in zip(
        jax.tree_util.tree_flatten_with_path(gx)[0],
        jax.tree_util.tree_flatten_with_path(gk)[0],
    ):
        assert pathx == pathk
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=5e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pathx)}",
        )


def test_saturated_density_matches_xla():
    """Regression: a sample with x = sigma*dist > ~23 (saturated absorber)
    must keep its ~T weight.  The log-drop compositor originally divided
    the unclamped exp(csum) by the FLOORED one_m, collapsing the
    absorber's weight to ~0 — rays rendered black past saturation and
    training exploded once densities grew (loss 7e-4 -> 484 observed)."""
    import jax.tree_util as jtu

    mcfg, rcfg, params, o, d, z, target = setup()
    # crank the density column so softplus(df) * dist saturates hard
    dens_w = params["density"]["w"] * 0.0
    dens_b = params["density"]["b"] + 500.0
    params = dict(params)
    params["density"] = {"w": dens_w, "b": dens_b}
    lx = float(xla_loss(params, mcfg, rcfg, o, d, z, target))
    lm = float(merged_loss(params, mcfg, rcfg, o, d, z, target))
    lk = float(kernel_loss(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lm, lx, rtol=1e-4)
    np.testing.assert_allclose(lk, lx, rtol=1e-4)
    gx = jax.grad(xla_loss)(params, mcfg, rcfg, o, d, z, target)
    _assert_grads_close(gx, jax.grad(merged_loss)(
        params, mcfg, rcfg, o, d, z, target))


def setup_arch(mcfg, n_rays=32, n_sample=32, seed=0):
    rcfg = RenderConfig(n_sample=n_sample, near=2.0, far=6.0, perturb=False)
    params = init_nerf_params(jax.random.key(seed), mcfg)
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-1, 1, (n_rays, 3)), jnp.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = stratified_samples(None, n_rays, rcfg).astype(jnp.float32)
    target = jnp.asarray(rng.uniform(0, 1, (n_rays, 3)), jnp.float32)
    return rcfg, params, o, d, z, target


def merged_loss_generic(params, mcfg, rcfg, o, d, z, target):
    from sfm_nerf_tpu.kernels.fused_render import pack_nerf_params
    from sfm_nerf_tpu.kernels.fused_train import fused_mse_loss

    packed = pack_nerf_params(params, mcfg, jnp.float32)
    return fused_mse_loss(
        packed, o, d, z, target, mcfg, rcfg,
        ray_tile=16, sample_chunk=16, tiles_per_program=1, interpret=True,
    )


def _assert_grads_match(gx, gk):
    for (pathx, lx), (pathk, lk) in zip(
        jax.tree_util.tree_flatten_with_path(gx)[0],
        jax.tree_util.tree_flatten_with_path(gk)[0],
    ):
        assert pathx == pathk
        a, b = np.asarray(lx), np.asarray(lk)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=5e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pathx)}",
        )


def test_merged_step_legacy_arch_grads_match_xla():
    """Legacy arch (the shipped-checkpoint layout: block2_2 as relu densfeat)
    through the merged train kernel: loss AND grads == jax.grad of XLA."""
    mcfg = NeRFModelConfig(arch="legacy", hidden=32, n_pos_freq=4,
                           n_dir_freq=2)
    rcfg, params, o, d, z, target = setup_arch(mcfg)
    lx = float(xla_loss(params, mcfg, rcfg, o, d, z, target))
    lm = float(merged_loss_generic(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lm, lx, rtol=1e-4)
    gx = jax.grad(xla_loss)(params, mcfg, rcfg, o, d, z, target)
    gm = jax.grad(merged_loss_generic)(params, mcfg, rcfg, o, d, z, target)
    _assert_grads_match(gx, gm)


def test_merged_step_no_pe_grads_match_xla():
    """The PE-ablation layout (skip-less legacy, raw 3-d inputs, zero trig
    columns) through the merged train kernel."""
    mcfg = NeRFModelConfig(arch="legacy", hidden=32, pos_encoding=False,
                           has_skip=False, n_block1_layers=4)
    rcfg, params, o, d, z, target = setup_arch(mcfg, seed=1)
    lx = float(xla_loss(params, mcfg, rcfg, o, d, z, target))
    lm = float(merged_loss_generic(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lm, lx, rtol=1e-4)
    gx = jax.grad(xla_loss)(params, mcfg, rcfg, o, d, z, target)
    gm = jax.grad(merged_loss_generic)(params, mcfg, rcfg, o, d, z, target)
    _assert_grads_match(gx, gm)


def test_recompute_path_legacy_arch_grads_match_xla():
    """The two-kernel recompute path (fused_render_train) on the legacy
    arch — general-cotangent backward with recomputed activations."""
    from sfm_nerf_tpu.kernels.fused_render import pack_nerf_params

    mcfg = NeRFModelConfig(arch="legacy", hidden=32, n_pos_freq=4,
                           n_dir_freq=2)
    rcfg, params, o, d, z, target = setup_arch(mcfg, seed=2)

    def loss(params, mcfg, rcfg, o, d, z, target):
        packed = pack_nerf_params(params, mcfg, jnp.float32)
        out = fused_render_train(
            packed, o, d, z, mcfg, rcfg,
            ray_tile=16, sample_chunk=16, tiles_per_program=1,
            interpret=True,
        )
        return jnp.mean((out - target) ** 2)

    lx = float(xla_loss(params, mcfg, rcfg, o, d, z, target))
    lk = float(loss(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lk, lx, rtol=1e-4)
    gx = jax.grad(xla_loss)(params, mcfg, rcfg, o, d, z, target)
    gk = jax.grad(loss)(params, mcfg, rcfg, o, d, z, target)
    _assert_grads_match(gx, gk)


def test_sample_padding_matches_xla():
    """n_sample NOT a chunk multiple: pad_sample_axis appends zero-dist
    duplicate samples, which must be EXACT no-ops — loss and grads equal
    the unpadded XLA computation (merged AND recompute kernels)."""
    mcfg, rcfg, params, o, d, z, target = setup(n_sample=24)  # 24 % 16 != 0
    lx = float(xla_loss(params, mcfg, rcfg, o, d, z, target))
    lm = float(merged_loss(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lm, lx, rtol=1e-4)
    lk = float(kernel_loss(params, mcfg, rcfg, o, d, z, target))
    np.testing.assert_allclose(lk, lx, rtol=1e-4)
    gx = jax.grad(xla_loss)(params, mcfg, rcfg, o, d, z, target)
    gm = jax.grad(merged_loss)(params, mcfg, rcfg, o, d, z, target)
    _assert_grads_close(gx, gm)
    gk = jax.grad(kernel_loss)(params, mcfg, rcfg, o, d, z, target)
    _assert_grads_close(gx, gk)


def test_sample_padding_hierarchical_weights_width():
    """The coarse kernel's emitted weights must come back at the CALLER's
    sample width (pad columns trimmed) and equal the XLA compositor's
    weights, so sample_pdf sees the same histogram either way."""
    from sfm_nerf_tpu.kernels.fused_train import fused_mse_loss_weights
    from sfm_nerf_tpu.ops.render import composite

    mcfg, rcfg, params, o, d, z, target = setup(n_sample=24)
    packed = pack_active_params(params, jnp.float32)
    loss, w = fused_mse_loss_weights(
        packed, o, d, z, target, mcfg, rcfg,
        ray_tile=16, sample_chunk=16, tiles_per_program=1, interpret=True,
    )
    assert w.shape == z.shape
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    density, rgb = nerf_apply(params, pts, dirs, mcfg)
    _, w_xla, _ = composite(density, rgb, z, rcfg)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_xla),
                               rtol=5e-4, atol=1e-6)
