"""Scan-fused multi-step training: same math as the python-loop steps, and
the trainer's fast path preserves log/val cadence."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.config import (
    NeRFModelConfig, NeRFPipelineConfig, RenderConfig, TrainConfig,
)
from sfm_nerf_tpu.io.blender import load_blender_dataset
from sfm_nerf_tpu.models import init_nerf_params
from sfm_nerf_tpu.train.nerf_trainer import (
    NeRFTrainer,
    make_multi_train_step,
    make_optimizer,
    make_train_step,
)

from util_synthetic import make_blender_dataset


def _setup(tmp_path, spc=1):
    root = make_blender_dataset(str(tmp_path / "d"), n_frames=2,
                                height=16, width=16)
    images, poses, cam = load_blender_dataset(root, "train")
    cfg = NeRFPipelineConfig(
        model=NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1),
        render=RenderConfig(n_sample=8),
        train=TrainConfig(n_rays_batch=64, steps_per_call=spc, val_every=0),
        checkpoint_path=os.path.join(str(tmp_path), "ckpt"),
        load_checkpoint=False,
    )
    return cfg, images, poses, cam


def test_multi_step_equals_sequential(tmp_path):
    cfg, images, poses, cam = _setup(tmp_path)
    tx = make_optimizer(cfg)
    params = init_nerf_params(jax.random.key(0), cfg.model)
    opt = tx.init(params)
    im, po, K = (jnp.asarray(images), jnp.asarray(poses),
                 jnp.asarray(cam.camera_matrix))

    step = make_train_step(cfg, tx)
    multi = make_multi_train_step(cfg, tx, 4)

    key = jax.random.key(3)
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    o1 = jax.tree_util.tree_map(jnp.copy, opt)
    seq_losses = []
    for k in jax.random.split(key, 4):
        p1, o1, loss = step(p1, o1, k, im, po, K)
        seq_losses.append(float(loss))

    p2, o2, losses = multi(params, opt, key, im, po, K)
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_trainer_fast_path_step_count(tmp_path):
    cfg, images, poses, cam = _setup(tmp_path, spc=8)
    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    stats = trainer.fit(max_iters=101, progress=False)
    assert stats["steps"] == 101
    # log cadence preserved: loss sampled at every it%100==0 boundary
    assert len(trainer._last_losses) == 2  # it=0 and it=100

def test_fast_path_hits_ckpt_boundaries_and_log_every_zero(tmp_path):
    """save_ckpt_iter boundaries inside a scan block must break the fast
    path (they were silently skipped — the fault-tolerance checkpoints
    never got written), and log_every=0 is a supported 'off' sentinel on
    the slow path too (it used to ZeroDivisionError)."""
    import dataclasses

    from sfm_nerf_tpu.train import checkpoint as ckpt_lib

    cfg, images, poses, cam = _setup(tmp_path, spc=4)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, save_ckpt_iter=10, log_every=0, max_iters=24))
    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    stats = trainer.fit(progress=False)
    assert stats["steps"] == 24
    names = sorted(os.listdir(cfg.checkpoint_path))
    # boundaries 10 and 20 fall inside [8,12) / [20,24) blocks and must
    # still produce checkpoints (plus the final one)
    assert any("10" in n for n in names), names
    assert any("20" in n for n in names), names
    latest = ckpt_lib.latest_checkpoint(cfg.checkpoint_path,
                                        prefer_final=True)
    assert latest is not None


def test_injected_train_step_sees_every_iteration(tmp_path):
    """A caller-injected train_step disables the scan fast path — the
    instrumented step must run ALL iterations, not 1-in-steps_per_call."""
    cfg, images, poses, cam = _setup(tmp_path, spc=4)
    calls = {"n": 0}

    base = make_train_step(cfg, make_optimizer(cfg))

    def counting_step(*args):
        calls["n"] += 1
        return base(*args)

    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix,
                          train_step=counting_step)
    stats = trainer.fit(max_iters=8, progress=False)
    assert stats["steps"] == 8
    assert calls["n"] == 8


def test_fast_path_blocks_may_end_on_boundaries(tmp_path):
    """A block whose LAST step lands exactly on a log/ckpt boundary must
    stay on the fast path (event handling runs after the block).  The old
    gate rejected block-end boundaries, which forced every other block
    into spc single dispatches at log_every=2*spc — measured ~2x step-rate
    loss on the tunneled TPU.  With aligned cadences, only it=0 may
    single-step."""
    import dataclasses

    from sfm_nerf_tpu.config import ParallelConfig

    cfg, images, poses, cam = _setup(tmp_path, spc=4)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, save_ckpt_iter=8, log_every=8, max_iters=17),
        # dp=1: the virtual 8-device conftest would otherwise auto-route to
        # the per-step-dispatch dp path and never build the scan fast path
        parallel=ParallelConfig(dp=1),
    )
    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    singles = {"n": 0}
    base = trainer.train_step

    def counting(*args):
        singles["n"] += 1
        return base(*args)

    trainer.train_step = counting
    stats = trainer.fit(progress=False)
    assert stats["steps"] == 17
    assert singles["n"] == 1, singles     # only it=0 (r==0) single-steps
    # events at block-END boundaries fired: logs at it=0,8,16 and
    # checkpoints at 8 and 16
    assert len(trainer._last_losses) == 3
    names = os.listdir(cfg.checkpoint_path)
    assert any("_000008" in n or "008" in n for n in names), names
    assert any("_000016" in n or "016" in n for n in names), names
