"""Training loop: loss decreases on a tiny synthetic scene; checkpoint
round-trip restores bit-identical state; resume picks numerically-latest."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.config import (
    NeRFModelConfig,
    NeRFPipelineConfig,
    RenderConfig,
    TrainConfig,
)
from sfm_nerf_tpu.io.blender import load_blender_dataset
from sfm_nerf_tpu.train import checkpoint as ckpt_lib
from sfm_nerf_tpu.train.nerf_trainer import NeRFTrainer

from util_synthetic import make_blender_dataset


def tiny_cfg(tmp_path, **train_kw):
    return NeRFPipelineConfig(
        model=NeRFModelConfig(hidden=32, n_pos_freq=4, n_dir_freq=2),
        render=RenderConfig(n_sample=32, near=2.0, far=6.0),
        train=TrainConfig(
            n_rays_batch=256, lrate=5e-3, val_every=0,
            **train_kw,
        ),
        checkpoint_path=os.path.join(str(tmp_path), "ckpt"),
        load_checkpoint=False,
    )


def test_train_loss_decreases(tmp_path):
    root = make_blender_dataset(str(tmp_path / "data"), n_frames=4,
                                height=24, width=24)
    images, poses, cam = load_blender_dataset(root, "train")
    cfg = tiny_cfg(tmp_path)
    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    stats = trainer.fit(max_iters=151, progress=False)
    losses = trainer._last_losses
    assert len(losses) >= 2
    assert losses[-1] < losses[0] * 0.8, f"no learning: {losses}"


def test_checkpoint_roundtrip(tmp_path):
    root = make_blender_dataset(str(tmp_path / "data"), n_frames=2,
                                height=16, width=16)
    images, poses, cam = load_blender_dataset(root, "train")
    cfg = tiny_cfg(tmp_path)
    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    trainer.fit(max_iters=3, progress=False)
    path = ckpt_lib.latest_checkpoint(cfg.checkpoint_path, prefer_final=True)
    assert path is not None

    trainer2 = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    params, opt_state, step = ckpt_lib.load_checkpoint(
        path, trainer2.params, trainer2.opt_state
    )
    assert step == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(trainer.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_numeric_sort(tmp_path):
    """model_9000 must NOT shadow model_10000 (the reference's lexicographic
    resume bug, Phase2/train.py:414; SURVEY §5)."""
    d = str(tmp_path)
    params = {"w": np.zeros(3, np.float32)}
    ckpt_lib.save_checkpoint(d, 9000, params)
    ckpt_lib.save_checkpoint(d, 10000, params)
    latest = ckpt_lib.latest_checkpoint(d)
    assert latest.endswith("model_010000.ckpt.npz")


def test_blender_loader_reference_focal(tmp_path):
    root = make_blender_dataset(str(tmp_path / "d"), n_frames=2,
                                height=20, width=30)
    images, poses, cam = load_blender_dataset(root, "train")
    assert images.shape == (2, 20, 30, 3)
    assert poses.shape == (2, 4, 4)
    cax = 0.6911112070083618
    expected = 0.5 * cax * 30 / np.tan(0.5 * cax)
    np.testing.assert_allclose(cam.camera_matrix[0, 0], expected, rtol=1e-6)
    assert cam.camera_matrix[0, 2] == 15.0 and cam.camera_matrix[1, 2] == 10.0


def test_load_params_untyped_and_infer_config(tmp_path):
    """CLI checkpoint loading without a template (gif path uses this since
    the reference-parity flag set can't describe the architecture)."""
    import jax

    from sfm_nerf_tpu.config import NeRFModelConfig
    from sfm_nerf_tpu.models import init_nerf_params, param_count

    cfg = NeRFModelConfig(hidden=48, n_pos_freq=5, n_dir_freq=3, arch="active")
    params = init_nerf_params(jax.random.key(0), cfg)
    path = ckpt_lib.save_checkpoint(str(tmp_path), 7, params)
    loaded, step = ckpt_lib.load_params_untyped(path)
    assert step == 7
    inferred = ckpt_lib.infer_model_config(loaded)
    assert inferred.hidden == 48
    assert inferred.n_pos_freq == 5
    assert inferred.n_dir_freq == 3
    assert inferred.arch == "active"
    assert param_count(loaded) == param_count(params)
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(loaded[k]["w"]), np.asarray(params[k]["w"])
        )


def test_bf16_training_converges(tmp_path):
    """Mixed-precision (bf16 matmuls, f32 masters) must track f32 training."""
    root = make_blender_dataset(str(tmp_path / "bf"), n_frames=2,
                                height=16, width=16)
    images, poses, cam = load_blender_dataset(root, "train")
    losses = {}
    for dtype in ("float32", "bfloat16"):
        cfg = NeRFPipelineConfig(
            model=NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1),
            render=RenderConfig(n_sample=8),
            train=TrainConfig(n_rays_batch=64, lrate=5e-3, val_every=0,
                              compute_dtype=dtype),
            checkpoint_path=os.path.join(str(tmp_path), "ck_" + dtype),
            load_checkpoint=False,
        )
        tr = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
        tr.fit(max_iters=151, progress=False)
        losses[dtype] = tr._last_losses
    assert losses["bfloat16"][-1] < losses["bfloat16"][0] * 0.8
    # same order of magnitude at convergence
    assert losses["bfloat16"][-1] < max(losses["float32"][-1] * 5, 0.01)


def test_blender_loader_downscale(tmp_path):
    root = make_blender_dataset(str(tmp_path / "ds"), n_frames=2,
                                height=40, width=40)
    img1, _, cam1 = load_blender_dataset(root, "train", downscale=1)
    img2, _, cam2 = load_blender_dataset(root, "train", downscale=2)
    assert img2.shape == (2, 20, 20, 3)
    np.testing.assert_allclose(img2, img1[:, ::2, ::2], atol=1e-7)
    # intrinsics scale with the image
    np.testing.assert_allclose(
        cam2.camera_matrix[0, 0], cam1.camera_matrix[0, 0] / 2, rtol=1e-6
    )


def test_orbax_backend_roundtrip_and_resume(tmp_path):
    """ckpt_backend='orbax': async save commits; resume restores state and
    continues from the saved step."""
    import dataclasses

    root = make_blender_dataset(str(tmp_path / "data"), n_frames=2,
                                height=16, width=16)
    images, poses, cam = load_blender_dataset(root, "train")
    cfg = tiny_cfg(tmp_path, ckpt_backend="orbax", save_ckpt_iter=5)
    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    trainer.fit(max_iters=11, progress=False)
    trainer._orbax.wait()
    assert trainer._orbax.latest_step() == 10

    cfg2 = dataclasses.replace(cfg, load_checkpoint=True)
    trainer2 = NeRFTrainer(cfg2, images, poses, cam.camera_matrix)
    assert trainer2.try_resume()
    assert trainer2.start_iter == 11
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer2.params),
        jax.tree_util.tree_leaves(trainer.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed training keeps running
    trainer2.fit(max_iters=16, progress=False)
    assert trainer2._steps_done == 5


def test_pth_finetune_resume(tmp_path):
    """No native checkpoint + a reference-format .pth in checkpoint_path ->
    try_resume converts it and starts fine-tuning from its weights (step 0,
    fresh optimizer); a mismatched architecture raises loudly instead of
    silently training fresh."""
    import pytest

    from sfm_nerf_tpu.models import init_nerf_params
    from sfm_nerf_tpu.models.convert import export_legacy_to_pth

    root = make_blender_dataset(str(tmp_path / "data"), n_frames=2,
                                height=16, width=16)
    images, poses, cam = load_blender_dataset(root, "train")
    mcfg = NeRFModelConfig(arch="legacy", hidden=32, n_pos_freq=4,
                           n_dir_freq=2)
    cfg = NeRFPipelineConfig(
        model=mcfg,
        render=RenderConfig(n_sample=32, near=2.0, far=6.0),
        train=TrainConfig(n_rays_batch=128, val_every=0),
        checkpoint_path=os.path.join(str(tmp_path), "ckpt"),
        load_checkpoint=True,
    )
    os.makedirs(cfg.checkpoint_path)
    src = init_nerf_params(jax.random.key(7), mcfg)
    export_legacy_to_pth(src, mcfg, os.path.join(cfg.checkpoint_path,
                                                 "final_model.pth"))

    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    assert trainer.try_resume()
    assert trainer.start_iter == 0
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_flatten_with_path(src)[0],
        jax.tree_util.tree_flatten_with_path(trainer.params)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=1e-6, atol=1e-7)
    # and training from the converted weights proceeds
    trainer.fit(max_iters=3, progress=False)

    # arch mismatch: configured active, .pth is legacy -> loud error
    cfg_bad = NeRFPipelineConfig(
        model=NeRFModelConfig(arch="active", hidden=32, n_pos_freq=4,
                              n_dir_freq=2),
        render=cfg.render, train=cfg.train,
        checkpoint_path=cfg.checkpoint_path, load_checkpoint=True,
    )
    # remove the npz checkpoints fit() just wrote so the .pth path triggers
    for f in os.listdir(cfg.checkpoint_path):
        if f.endswith(".npz"):
            os.remove(os.path.join(cfg.checkpoint_path, f))
    trainer_bad = NeRFTrainer(cfg_bad, images, poses, cam.camera_matrix)
    with pytest.raises(ValueError, match="different architecture"):
        trainer_bad.try_resume()

    # hierarchical config (coarse/fine pair): a single-net .pth can never
    # match any flag combination -> skipped with a note, scratch training
    # proceeds (no abort)
    cfg_hier = NeRFPipelineConfig(
        model=mcfg,
        render=RenderConfig(n_sample=32, n_importance=16, near=2.0, far=6.0),
        train=cfg.train,
        checkpoint_path=cfg.checkpoint_path, load_checkpoint=True,
    )
    trainer_hier = NeRFTrainer(cfg_hier, images, poses, cam.camera_matrix)
    assert not trainer_hier.try_resume()
    trainer_hier.fit(max_iters=2, progress=False)
