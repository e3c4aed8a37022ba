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

    def interp(packed, o, d, z, mcfg, rcfg, **kw):
        return orig(packed, o, d, z, mcfg, rcfg,
                    ray_tile=16, sample_chunk=16, tiles_per_program=1,
                    interpret=True)

    monkeypatch.setattr(ft, "fused_render_train", interp)
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
