"""KeyboardInterrupt during training saves a checkpoint (fault-tolerance
parity with the reference's legacy loop, Phase2/Wrapper.py:288-293)."""

import os

import numpy as np
import pytest

from sfm_nerf_tpu.config import (
    NeRFModelConfig, NeRFPipelineConfig, RenderConfig, TrainConfig,
)
from sfm_nerf_tpu.io.blender import load_blender_dataset
from sfm_nerf_tpu.train import checkpoint as ckpt_lib
from sfm_nerf_tpu.train.nerf_trainer import NeRFTrainer

from util_synthetic import make_blender_dataset


def test_keyboard_interrupt_saves_checkpoint(tmp_path):
    root = make_blender_dataset(str(tmp_path / "d"), n_frames=2,
                                height=16, width=16)
    images, poses, cam = load_blender_dataset(root, "train")
    cfg = NeRFPipelineConfig(
        model=NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1),
        render=RenderConfig(n_sample=8),
        train=TrainConfig(n_rays_batch=64, val_every=0),
        checkpoint_path=os.path.join(str(tmp_path), "ckpt"),
        load_checkpoint=False,
    )
    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)

    calls = {"n": 0}
    real_step = trainer.train_step

    def interrupting_step(*args):
        calls["n"] += 1
        if calls["n"] == 5:
            raise KeyboardInterrupt
        return real_step(*args)

    trainer.train_step = interrupting_step
    with pytest.raises(KeyboardInterrupt):
        trainer.fit(max_iters=100, progress=False)

    latest = ckpt_lib.latest_checkpoint(cfg.checkpoint_path)
    assert latest is not None
    _, step = ckpt_lib.load_params_untyped(latest)
    # interrupted on the 5th call: its iteration (it=4) never ran, so the
    # params hold state through it=3 and that is what the stamp must say
    # (resume = step + 1 = 4 re-runs the interrupted iteration instead of
    # silently skipping it)
    assert step == 3


def test_train_step_inputs_survive_dispatch(tmp_path):
    """Train steps must NOT donate params/opt_state: the interrupt-save
    handler reads them while a dispatch is in flight, and donated inputs
    are already deleted then ('Array has been deleted')."""
    import jax

    root = make_blender_dataset(str(tmp_path / "d"), n_frames=2,
                                height=16, width=16)
    images, poses, cam = load_blender_dataset(root, "train")
    cfg = NeRFPipelineConfig(
        model=NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1),
        render=RenderConfig(n_sample=8),
        train=TrainConfig(n_rays_batch=64, val_every=0),
        checkpoint_path=os.path.join(str(tmp_path), "ckpt"),
        load_checkpoint=False,
    )
    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    key = jax.random.key(0)
    out = trainer.train_step(
        trainer.params, trainer.opt_state,
        key, images, poses, cam.camera_matrix,
    )
    jax.block_until_ready(out)
    # inputs still readable after the dispatch consumed them
    for leaf in jax.tree_util.tree_leaves(trainer.params):
        np.asarray(leaf)
    for leaf in jax.tree_util.tree_leaves(trainer.opt_state):
        np.asarray(leaf)
