"""CLI flag parity: every reference flag name must exist with its default
(SURVEY §2.2 flag tables)."""

import importlib.util
import os

REPO = os.path.join(os.path.dirname(__file__), "..")


def load_module(rel):
    spec = importlib.util.spec_from_file_location(
        rel.replace("/", "_"), os.path.join(REPO, rel)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REFERENCE_TRAIN_FLAGS = {
    "data_path": "./Phase2/nerf_synthetic/lego/",
    "mode": "train",
    "lrate": 5e-4,
    "n_pos_freq": 10,
    "n_dirc_freq": 4,
    "n_rays_batch": 32 * 32 * 8,
    "n_sample": 256,
    "max_iters": 200001,
    "logs_path": "./logs/",
    "log_id": "",
    "exp_name": "lego_experiment",
    "checkpoint_path": "./Phase2/checkpoints_new_2/",
    "load_checkpoint": True,
    "save_ckpt_iter": 1000,
    "images_path": "./image/",
    "perturb": True,
    "near": 2.0,
    "far": 6.0,
    "chunk_size": 1024 * 32,
    "hidden_size": 256,
    "lrate_decay": 0.1,
    "lrate_decay_steps": 50000,
}

REFERENCE_WRAPPER_FLAGS = {
    "data_path", "mode", "lrate", "n_pos_freq", "n_dirc_freq",
    "n_rays_batch", "n_sample", "max_iters", "logs_path", "log_id",
    "checkpoint_path", "load_checkpoint", "save_ckpt_iter", "images_path",
}


def test_phase2_train_flags_parity():
    mod = load_module("Phase2/train.py")
    args = mod.configParser().parse_args([])
    for flag, default in REFERENCE_TRAIN_FLAGS.items():
        assert hasattr(args, flag), f"missing --{flag}"
        got = getattr(args, flag)
        # reference declares several defaults as strings and coerces later
        # (train.py:772-779) — compare semantically
        if isinstance(default, (int, float)) and not isinstance(default, bool):
            assert float(got) == float(default), (flag, got, default)
        else:
            assert got == default, (flag, got, default)


def test_phase2_wrapper_flags_parity():
    mod = load_module("Phase2/Wrapper.py")
    args = mod.configParser().parse_args([])
    for flag in REFERENCE_WRAPPER_FLAGS:
        assert hasattr(args, flag), f"missing --{flag}"
    assert float(args.max_iters) == 100001  # Wrapper's own default


def test_build_config_roundtrip():
    mod = load_module("Phase2/train.py")
    args = mod.configParser().parse_args(
        ["--n_rays_batch", "4096", "--hidden_size", "128",
         "--data_path", "x/lego/"]
    )
    cfg = mod.build_config(args)
    assert cfg.train.n_rays_batch == 4096
    assert cfg.model.hidden == 128
    assert cfg.checkpoint_path.endswith("lego")
    assert cfg.render.near == 2.0 and cfg.render.far == 6.0


def test_steps_per_call_flag_reaches_config():
    """--steps_per_call (TPU-only addition, promised in the module
    docstring) must actually exist and land in TrainConfig."""
    mod = load_module("Phase2/train.py")
    args = mod.configParser().parse_args(["--steps_per_call", "8"])
    cfg = mod.build_config(args)
    assert cfg.train.steps_per_call == 8


def test_white_bkgd_flag_reaches_config():
    """--white_bkgd (the chair800 training mode) and --density_bias_init
    (sparse-scene anti-collapse) must land in RenderConfig/NeRFModelConfig;
    both default OFF for reference-init/compositing parity."""
    mod = load_module("Phase2/train.py")
    cfg = mod.build_config(mod.configParser().parse_args([]))
    assert cfg.render.white_background is False
    assert cfg.model.density_bias_init == 0.0
    cfg = mod.build_config(mod.configParser().parse_args(
        ["--white_bkgd", "--density_bias_init", "0.5"]))
    assert cfg.render.white_background is True
    assert cfg.model.density_bias_init == 0.5


def test_fused_flag_reaches_training_with_envelope_fallback():
    """--fused turns on the fused training kernel; outside the fused
    envelope (hierarchical sampling, legacy variant, non-128-multiple
    sample counts, cpu backend) make_loss_fn silently falls back to XLA."""
    import dataclasses

    import jax

    from sfm_nerf_tpu.train import nerf_trainer as nt

    mod = load_module("Phase2/train.py")
    args = mod.configParser().parse_args(["--fused"])
    cfg = mod.build_config(args)
    assert cfg.render.use_fused_kernel

    # the envelope check is the trainer's own; fake an accelerator backend
    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        def engaged(rcfg):
            return nt.fused_train_supported(
                dataclasses.replace(cfg, render=rcfg))
        assert engaged(cfg.render)
        # non-128-multiples are IN the envelope since sample padding
        # (pad_sample_axis appends exact no-op samples)
        assert engaged(dataclasses.replace(cfg.render, n_sample=192))
        assert engaged(dataclasses.replace(cfg.render, n_importance=64))
        # the unrolled chunk loop still caps total samples at 8 chunks
        assert not engaged(dataclasses.replace(cfg.render, n_sample=2000))
        assert not engaged(
            dataclasses.replace(cfg.render, n_sample=900, n_importance=200))
        # pad-overhead bound: padded/real > 3 means the padded MLP work
        # eats the whole fused-training advantage — XLA must win
        assert engaged(dataclasses.replace(cfg.render, n_sample=64))
        assert not engaged(dataclasses.replace(cfg.render, n_sample=32))
        # the two-kernel recompute path hardcodes its 128-sample chunk, so
        # a bigger fused_sample_chunk must not admit configs that path's
        # kernels assert on at trace time (1100 -> 9 chunks of 128)
        assert not engaged(dataclasses.replace(
            cfg.render, fused_merged_step=False, fused_sample_chunk=256,
            n_sample=1100))
        assert engaged(dataclasses.replace(
            cfg.render, fused_sample_chunk=256, n_sample=1100))
        assert not engaged(dataclasses.replace(cfg.render, variant="legacy"))
        # white background is INSIDE the envelope (kernels composite the
        # background term and its cotangent since round 2)
        assert engaged(
            dataclasses.replace(cfg.render, white_background=True))
        # fast_sin Cody-Waite envelope: high PE frequencies must fall back
        # to XLA's general-range sin (fused_render.check_fast_sin_envelope)
        assert not nt.fused_train_supported(dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, n_pos_freq=13)))
        assert not nt.fused_train_supported(dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, n_dir_freq=14)))
    finally:
        jax.default_backend = orig
    # on the CPU test backend the envelope always rejects
    assert not nt.fused_train_supported(cfg)


def test_fused_render_route_pad_ratio_gate():
    """Inference routes only take the fused kernel while the sample pad
    keeps padded/real <= 4/3 — the render kernel's advantage over XLA is
    ~1.36x, so heavier padding would make eval renders net SLOWER."""
    import dataclasses

    import jax

    from sfm_nerf_tpu.train import nerf_trainer as nt

    mod = load_module("Phase2/train.py")
    cfg = mod.build_config(mod.configParser().parse_args(["--fused"]))
    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        def routes(**kw):
            return nt._fused_render_routes(dataclasses.replace(
                cfg, render=dataclasses.replace(cfg.render, **kw)))
        assert routes(n_sample=256) == (True, False)
        assert routes(n_sample=192) == (True, False)   # exactly 4/3: in
        assert routes(n_sample=64) == (False, False)   # 2x padding: out
        # hierarchical: the fine pass's union width holds the same bound
        assert routes(n_sample=256, n_importance=128) == (False, True)
        assert routes(n_sample=256, n_importance=32)[1]   # 288 -> 384: 4/3
        assert not routes(n_sample=256, n_importance=16)[1]  # 272 -> 384
        # ... and a too-padded coarse width kills both routes
        assert routes(n_sample=64, n_importance=64) == (False, False)
    finally:
        jax.default_backend = orig


def test_wrapper_train_uses_legacy_schedule(monkeypatch):
    """The legacy Wrapper entry point trains with the reference's
    StepLR(1000, 0.1) (Wrapper.py:220) by default; --modern_schedule opts
    into train.py's StepLR(50000, 0.1)."""
    mod = load_module("Phase2/Wrapper.py")
    captured = {}

    import importlib.util as ilu
    real_sfl = ilu.spec_from_file_location

    def fake_main(t_args):
        captured["steps"] = int(t_args.lrate_decay_steps)
        captured["gamma"] = float(t_args.lrate_decay)

    def fake_spec(name, path):
        spec = real_sfl(name, path)
        real_exec = spec.loader.exec_module
        def exec_and_patch(m):
            real_exec(m)
            m.main = fake_main
        spec.loader.exec_module = exec_and_patch
        return spec

    monkeypatch.setattr(ilu, "spec_from_file_location", fake_spec)
    args = mod.configParser().parse_args(["--mode", "train"])
    mod.main(args)
    assert captured == {"steps": 1000, "gamma": 0.1}

    args = mod.configParser().parse_args(["--mode", "train",
                                          "--modern_schedule"])
    mod.main(args)
    assert captured["steps"] == 50000


def test_wrapper_delegation_uses_legacy_render_and_train_split(monkeypatch):
    """The legacy Wrapper's train/test delegation must keep the reference
    Wrapper's render setup — near=1/far=10 + legacy compositor (render()
    defaults, reference Wrapper.py:129,148-162; what gif mode samples) —
    and its train-split evaluation quirk (mode='train' hardcoded for data
    loading, Wrapper.py:513).  --modern_render / --eval_split opt out."""
    mod = load_module("Phase2/Wrapper.py")
    captured = {}

    import importlib.util as ilu
    real_sfl = ilu.spec_from_file_location

    def fake_main(t_args):
        captured.update(near=t_args.near, far=t_args.far,
                        variant=t_args.render_variant,
                        eval_split=t_args.eval_split)

    def fake_spec(name, path):
        spec = real_sfl(name, path)
        real_exec = spec.loader.exec_module

        def exec_and_patch(m):
            real_exec(m)
            m.main = fake_main
        spec.loader.exec_module = exec_and_patch
        return spec

    monkeypatch.setattr(ilu, "spec_from_file_location", fake_spec)
    mod.main(mod.configParser().parse_args(["--mode", "test"]))
    assert captured == {"near": 1.0, "far": 10.0, "variant": "legacy",
                        "eval_split": "train"}

    mod.main(mod.configParser().parse_args(
        ["--mode", "test", "--modern_render", "--eval_split", "test"]))
    assert (captured["near"], captured["far"]) == (2.0, 6.0)
    assert captured["variant"] == "train"
    assert captured["eval_split"] == "test"


def test_run_test_emits_artifacts(tmp_path):
    """Drive the eval path (mode=test) end-to-end on a tiny checkpoint:
    artifact filenames (reference train.py:663-676 parity) + PSNR/SSIM
    reporting must survive headless CPU runs."""
    import numpy as np
    from sfm_nerf_tpu.config import (
        NeRFModelConfig, NeRFPipelineConfig, RenderConfig, TrainConfig,
    )
    from sfm_nerf_tpu.io.blender import load_blender_dataset
    from sfm_nerf_tpu.train import checkpoint as ckpt_lib
    from sfm_nerf_tpu.train.nerf_trainer import NeRFTrainer
    from util_synthetic import make_blender_dataset

    root = make_blender_dataset(str(tmp_path / "d"), n_frames=2,
                                height=16, width=16)
    images, poses, cam = load_blender_dataset(root, "train")
    cfg = NeRFPipelineConfig(
        model=NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1),
        render=RenderConfig(n_sample=16, near=2.0, far=6.0),
        train=TrainConfig(n_rays_batch=64, val_every=0),
        checkpoint_path=str(tmp_path / "ckpt"),
        images_path=str(tmp_path / "out"),
        load_checkpoint=True,
    )
    tr = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    ckpt_lib.save_checkpoint(cfg.checkpoint_path, 1, tr.params)

    mod = load_module("Phase2/train.py")
    mod.run_test(cfg, images, poses, cam)
    out = os.path.join(cfg.images_path, os.path.basename(cfg.checkpoint_path))
    for name in ("test_0_gt.png", "test_0_pred.png",
                 "test_0_comparison.png", "figure_0.png"):
        assert os.path.exists(os.path.join(out, name)), name


def test_fused_default_on_with_opt_out():
    """Fused kernels are the training DEFAULT (parity + 3.2x speed);
    --no_fused opts back into XLA autodiff."""
    mod = load_module("Phase2/train.py")
    assert mod.build_config(
        mod.configParser().parse_args([])).render.use_fused_kernel
    assert not mod.build_config(
        mod.configParser().parse_args(["--no_fused"])).render.use_fused_kernel


def test_fused_envelope_rejects_deep_chunk_counts():
    """n_sample beyond the kernels' 8-chunk static unroll must FALL BACK to
    XLA, not crash at trace time (review finding: the CLI defaults to
    fused and 1152 = 9 x 128 passed every other envelope check)."""
    import dataclasses

    import jax

    from sfm_nerf_tpu.train import nerf_trainer as nt

    mod = load_module("Phase2/train.py")
    cfg = mod.build_config(mod.configParser().parse_args([]))
    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        ok = nt.fused_train_supported
        assert ok(dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, n_sample=1024)))
        assert not ok(dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, n_sample=1152)))
        assert not ok(dataclasses.replace(
            cfg, render=dataclasses.replace(
                cfg.render, n_sample=1024, n_importance=128)))
    finally:
        jax.default_backend = orig


def test_gif_mode_emits_frames_and_ray_plots(tmp_path):
    """Drive the gif path (Wrapper.py run_gif) headless on a tiny
    checkpoint: reference frame filenames image_{count}.png plus the
    --plot_rays debug figures (reference plot_rays, Wrapper.py:428-442,
    calls plt.show() per frame — we save ray_plot_{count}.png instead)."""
    import jax
    from sfm_nerf_tpu.config import NeRFModelConfig
    from sfm_nerf_tpu.models import init_nerf_params
    from sfm_nerf_tpu.train import checkpoint as ckpt_lib
    from util_synthetic import make_blender_dataset

    root = make_blender_dataset(str(tmp_path / "lego"), n_frames=2,
                                height=16, width=16)
    mcfg = NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1)
    params = init_nerf_params(jax.random.key(0), mcfg)
    # gif mode appends the dataset dir name to checkpoint_path
    # (reference Wrapper.py:521-522)
    ckpt_lib.save_checkpoint(str(tmp_path / "ckpt" / "lego"), 1, params)

    mod = load_module("Phase2/Wrapper.py")
    args = mod.configParser().parse_args(
        ["--mode", "gif", "--data_path", root,
         "--checkpoint_path", str(tmp_path / "ckpt"),
         "--images_path", str(tmp_path / "image"),
         "--n_sample", "8", "--n_frames", "2", "--plot_rays"]
    )
    mod.run_gif(args)
    for name in ("image_1.png", "image_2.png",
                 "ray_plot_1.png", "ray_plot_2.png"):
        assert os.path.exists(os.path.join(str(tmp_path / "image"), name)), name


def test_run_test_save_depth_emits_aux_maps(tmp_path):
    """--save_depth: depth/disp/acc PNGs are written and the pred image
    still matches the rgb-only path (same XLA render on CPU)."""
    import numpy as np
    from sfm_nerf_tpu.config import (
        NeRFModelConfig, NeRFPipelineConfig, RenderConfig, TrainConfig,
    )
    from sfm_nerf_tpu.io.blender import load_blender_dataset
    from sfm_nerf_tpu.train import checkpoint as ckpt_lib
    from sfm_nerf_tpu.train.nerf_trainer import NeRFTrainer
    from util_synthetic import make_blender_dataset

    root = make_blender_dataset(str(tmp_path / "d"), n_frames=2,
                                height=16, width=16)
    images, poses, cam = load_blender_dataset(root, "train")
    cfg = NeRFPipelineConfig(
        model=NeRFModelConfig(hidden=16, n_pos_freq=2, n_dir_freq=1),
        render=RenderConfig(n_sample=16, near=2.0, far=6.0),
        train=TrainConfig(n_rays_batch=64, val_every=0),
        checkpoint_path=str(tmp_path / "ckpt"),
        images_path=str(tmp_path / "out"),
        load_checkpoint=True,
    )
    tr = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    ckpt_lib.save_checkpoint(cfg.checkpoint_path, 1, tr.params)

    mod = load_module("Phase2/train.py")
    mod.run_test(cfg, images, poses, cam, save_depth=True)
    out = os.path.join(cfg.images_path, os.path.basename(cfg.checkpoint_path))
    import imageio.v2 as imageio

    for name in ("test_0_pred.png", "test_0_depth.png", "test_0_disp.png",
                 "test_0_acc.png"):
        assert os.path.exists(os.path.join(out, name)), name
    depth = imageio.imread(os.path.join(out, "test_0_depth.png"))
    assert depth.shape == (16, 16)


def test_platform_flag_and_ckpt_name_conventions(tmp_path):
    """--platform cpu exists on both Phase2 CLIs (the only off-TPU escape
    hatch, since the container selects the TPU programmatically), and the
    gif loader finds checkpoints written under train.py's reference
    naming rule (data_path.split('/')[-2], which assumes a trailing
    slash) as well as the slash-agnostic leaf name."""
    mod = load_module("Phase2/train.py")
    args = mod.configParser().parse_args([])
    assert args.platform == "default"
    wmod = load_module("Phase2/Wrapper.py")
    wargs = wmod.configParser().parse_args(["--platform", "cpu"])
    assert wargs.platform == "cpu"

    # train.py with data_path /x/scene (no trailing slash) writes under
    # checkpoint_path/x per the reference quirk; the gif loader must look
    # there too, not only under .../scene
    import numpy as np

    ck = tmp_path / "ck" / "x"          # [-2] of "/x/scene" is "x"
    os.makedirs(ck)
    np.savez(ck / "model_5.ckpt.npz", step=5)
    for name in ("x", "scene"):
        p, kind = wmod.load_any_checkpoint(str(tmp_path / "ck" / name))
        if p is not None:
            break
    assert p is not None and p.endswith("model_5.ckpt.npz")


def test_phase1_resident_runs_mode(tmp_path):
    """--runs N (the resident-service mode, PERFORMANCE.md round-3/4
    Phase1-on-TPU steady-state story) is a first-class tested mode: the
    pipeline runs N times in ONE process, every run completes, and the
    ANSWER is run-invariant (same seed => same pipeline; pass 2+ only
    drops compile/load overhead, never changes results)."""
    import re
    import subprocess
    import sys

    data = os.path.join("/root/reference", "Phase1", "Data")
    if not os.path.isdir(data):
        import pytest

        pytest.skip("bundled reference dataset unavailable")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "Phase1", "Wrapper.py"),
         "--data_path", data, "--output_dir", str(tmp_path),
         "--platform", "cpu", "--runs", "2",
         "--ransac_iters", "1000", "--pnp_iters", "1000",
         "--ba_max_iters", "15"],
        capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines()
             if re.match(r"run \d/2:", ln)]
    assert len(lines) == 2, out.stdout[-2000:]
    stats = [re.search(
        r"ba_mean_px=([0-9.]+)\s+n_registered=(\d+)", ln) for ln in lines]
    assert all(stats), lines
    assert stats[0].group(1) == stats[1].group(1), lines
    assert stats[0].group(2) == stats[1].group(2) == "5", lines
