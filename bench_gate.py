#!/usr/bin/env python
"""One-command ON-CHIP regression gate (VERDICT r2 weak #4).

CI (.github/workflows/ci.yml) is CPU-only: a Mosaic-lowering regression in
the fused kernels — wrong numerics or lost speed that only manifests on
real TPU hardware — was previously caught by nothing automated.  This
script runs three gates against thresholds recorded in-repo
(bench_gate_thresholds.json) and exits nonzero on any regression:

1. train_throughput   — bench.py's flagship merged-kernel training
                        throughput (rays/s) >= recorded floor.
2. fused_render       — the chair final_model.pth rendered at 400^2
                        through the FUSED legacy-compositor path: PSNR vs
                        the XLA path >= floor (numerics) and ms/frame <=
                        ceiling (speed).
3. fused_train_quality— 300 fused merged-kernel train steps on the first 8
                        views of the committed synth800 scene (downscale 2
                        -> the bench program's exact (8,400,400,3) shape):
                        final loss <= ceiling.  Catches gradient-path
                        regressions that throughput and single-frame
                        parity both miss.

Usage:
    python bench_gate.py            # gate: exit 0 pass / 1 fail
    python bench_gate.py --record   # measure and (re)write thresholds
                                    # with safety margins

Thresholds carry the margins, not the raw measurements; the raw numbers
are stored alongside for provenance.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
THRESHOLDS_PATH = os.path.join(HERE, "bench_gate_thresholds.json")
CHAIR_PTH = "/root/reference/Phase2/checkpoints/chair/final_model.pth"
SYNTH = os.path.join(HERE, "Phase2", "nerf_synthetic", "synth800")
CAMERA_ANGLE_X = 0.6911112070083618


def gate_train_throughput():
    """Run bench.py (subprocess: its watchdog may os._exit) and parse the
    one-line JSON."""
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench.py failed:\n{out.stderr[-800:]}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return {"train_rays_per_sec": float(json.loads(line)["value"])}


def gate_fused_render():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sfm_nerf_tpu.config import NeRFPipelineConfig, RenderConfig
    from sfm_nerf_tpu.io.blender import derive_focal, pose_spherical
    from sfm_nerf_tpu.models.convert import convert_pth
    from sfm_nerf_tpu.train.nerf_trainer import make_render_image

    params, mcfg = convert_pth(CHAIR_PTH)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params)
    H = W = 400
    f = derive_focal(CAMERA_ANGLE_X, W)
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    pose = jnp.asarray(pose_spherical(0.0, -30.0, 4.0), jnp.float32)
    base = NeRFPipelineConfig(
        model=mcfg,
        render=RenderConfig(n_sample=128, near=2.0, far=6.0, perturb=False,
                            variant="legacy", use_fused_kernel=True),
    )
    render_fused = make_render_image(base)
    cfg_xla = dataclasses.replace(base, render=dataclasses.replace(
        base.render, use_fused_kernel=False))
    render_xla = make_render_image(cfg_xla)

    img_f = np.asarray(render_fused(params, K, pose, H, W))   # compile
    img_x = np.asarray(render_xla(params, K, pose, H, W))
    t0 = time.time()
    for _ in range(3):
        img_f = np.asarray(render_fused(params, K, pose, H, W))
    ms = (time.time() - t0) / 3 * 1000.0
    mse = float(np.mean((img_f - img_x) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    if img_f.std() <= 0.02 or img_f.max() <= 0.3:
        raise RuntimeError("fused chair render is a flat field")
    return {"render_fused_psnr_vs_xla": psnr, "render_fused_ms_per_frame": ms}


def gate_fused_train_quality():
    import jax
    import jax.numpy as jnp

    from sfm_nerf_tpu.config import (
        NeRFModelConfig, NeRFPipelineConfig, RenderConfig, TrainConfig,
    )
    from sfm_nerf_tpu.io.blender import load_blender_dataset
    from sfm_nerf_tpu.models import init_nerf_params
    from sfm_nerf_tpu.train.nerf_trainer import (
        make_multi_train_step, make_optimizer,
    )

    images, poses, cam = load_blender_dataset(SYNTH, "train", downscale=2)
    images, poses = images[:8], poses[:8]     # bench.py's (8,400,400,3)
    cfg = NeRFPipelineConfig(
        model=NeRFModelConfig(arch="active"),
        render=RenderConfig(n_sample=256, use_fused_kernel=True),
        train=TrainConfig(n_rays_batch=16384),
    )
    tx = make_optimizer(cfg)
    params = init_nerf_params(jax.random.key(0), cfg.model)
    opt_state = tx.init(params)
    step = make_multi_train_step(cfg, tx, 50)
    key = jax.random.key(1)
    im, po = jnp.asarray(images), jnp.asarray(poses)
    K = jnp.asarray(cam.camera_matrix, jnp.float32)
    losses = None
    for _ in range(6):                         # 300 steps
        key, sub = jax.random.split(key)
        params, opt_state, losses = step(params, opt_state, sub, im, po, K)
    return {"train_quality_loss_300": float(np.asarray(losses)[-1])}


# gate key -> (threshold key, direction, record margin)
GATES = {
    "train_rays_per_sec": ("train_rays_per_sec_min", ">=", 0.95),
    "render_fused_psnr_vs_xla": ("render_fused_psnr_vs_xla_min", ">=", 0.93),
    "render_fused_ms_per_frame": ("render_fused_ms_per_frame_max", "<=", 1.4),
    "train_quality_loss_300": ("train_quality_loss_300_max", "<=", 1.6),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="measure and rewrite bench_gate_thresholds.json")
    ap.add_argument("--skip", default="",
                    help="comma-set of gates to skip (throughput,render,"
                         "quality)")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    from sfm_nerf_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        print("bench_gate: WARNING — no accelerator attached; the fused "
              "envelope will fall back to XLA and the gate is meaningless. "
              "Refusing.", file=sys.stderr)
        return 2

    measured = {}
    if "throughput" not in skip:
        measured.update(gate_train_throughput())
        print(f"  measured train_rays_per_sec = "
              f"{measured['train_rays_per_sec']:.0f}", flush=True)
    if "render" not in skip:
        measured.update(gate_fused_render())
        print(f"  measured render psnr/ms = "
              f"{measured['render_fused_psnr_vs_xla']:.1f} dB / "
              f"{measured['render_fused_ms_per_frame']:.0f} ms", flush=True)
    if "quality" not in skip:
        measured.update(gate_fused_train_quality())
        print(f"  measured 300-step loss = "
              f"{measured['train_quality_loss_300']:.2e}", flush=True)

    if args.record:
        doc = {"_measured": measured, "_backend": backend}
        if os.path.exists(THRESHOLDS_PATH):
            with open(THRESHOLDS_PATH) as f:
                doc = {**json.load(f), "_measured": measured,
                       "_backend": backend}
        for mkey, (tkey, _, margin) in GATES.items():
            if mkey in measured:
                doc[tkey] = measured[mkey] * margin
        with open(THRESHOLDS_PATH, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"recorded thresholds -> {THRESHOLDS_PATH}")
        return 0

    with open(THRESHOLDS_PATH) as f:
        thresholds = json.load(f)
    failed = []
    for mkey, (tkey, op, _) in GATES.items():
        if mkey not in measured:
            continue
        bound = thresholds[tkey]
        ok = measured[mkey] >= bound if op == ">=" else measured[mkey] <= bound
        tag = "ok  " if ok else "FAIL"
        print(f"{tag} {mkey} = {measured[mkey]:.4g} (bound {op} {bound:.4g})")
        if not ok:
            failed.append(mkey)
    if failed:
        print(f"bench_gate: REGRESSION in {failed}", file=sys.stderr)
        return 1
    print("bench_gate: all gates green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
