#!/usr/bin/env python
"""Training-quality demo: held-out PSNR after a short real training run.

Guards the fused kernels' numerics end-to-end (PERFORMANCE.md ablation):
train a small NeRF on a synthetic multi-view scene and report held-out
PSNR + wall time.  Compare BENCH_QUALITY_FUSED=1 (default; merged fused
step) against =0 (XLA autodiff) — they must land within ~0.2 dB.

Usage: python bench_quality.py            (real TPU; ~3-6 min incl. compile)
Prints one JSON line.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sfm_nerf_tpu.config import (
        NeRFModelConfig, NeRFPipelineConfig, RenderConfig, TrainConfig,
    )
    from sfm_nerf_tpu.models import init_nerf_params
    from sfm_nerf_tpu.train.nerf_trainer import (
        make_multi_train_step, make_optimizer, make_render_image,
    )
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from util_synthetic import make_blender_dataset

    from sfm_nerf_tpu.io.blender import load_blender_dataset

    fused = os.environ.get("BENCH_QUALITY_FUSED", "1") != "0"
    steps = int(os.environ.get("BENCH_QUALITY_STEPS", 6000))
    spc = int(os.environ.get("BENCH_QUALITY_SPC", 50))
    res = int(os.environ.get("BENCH_QUALITY_RES", 128))

    import tempfile
    root = make_blender_dataset(
        tempfile.mkdtemp(prefix="nerf_q_"), n_frames=21, height=res,
        width=res)
    images, poses, cam = load_blender_dataset(root, "train")
    # hold out the last view
    im_tr, po_tr = jnp.asarray(images[:-1]), jnp.asarray(poses[:-1])
    im_te, po_te = np.asarray(images[-1]), jnp.asarray(poses[-1])
    K = jnp.asarray(cam.camera_matrix)

    cfg = NeRFPipelineConfig(
        model=NeRFModelConfig(arch="active", hidden=128, n_pos_freq=8,
                              n_dir_freq=3),
        render=RenderConfig(n_sample=128, use_fused_kernel=fused),
        train=TrainConfig(n_rays_batch=4096, lrate=5e-4,
                          lrate_decay_steps=250000),
    )
    tx = make_optimizer(cfg)
    params = init_nerf_params(jax.random.key(0), cfg.model)
    opt = tx.init(params)
    step = make_multi_train_step(cfg, tx, spc)
    render = make_render_image(cfg, chunk_rays=4096)

    key = jax.random.key(1)
    t0 = time.time()
    losses = []
    for _ in range(steps // spc):
        key, sub = jax.random.split(key)
        params, opt, ls = step(params, opt, sub, im_tr, po_tr, K)
        losses.append(float(np.asarray(ls)[-1]))
    wall = time.time() - t0

    pred = np.asarray(render(params, K, po_te, res, res))
    mse = float(((pred - im_te) ** 2).mean())
    psnr = -10 * np.log10(max(mse, 1e-12))
    print(json.dumps({
        "metric": "quality_demo_psnr_db",
        "value": round(psnr, 2),
        "fused": fused, "steps": steps,
        "train_wall_s": round(wall, 1),
        "rays_per_s": round(4096 * steps / wall, 0),
        "final_loss": losses[-1],
    }))


if __name__ == "__main__":
    main()
