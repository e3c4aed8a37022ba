#!/usr/bin/env python
"""Phase2 legacy entry point: train / test / 360-degree gif render.

Flag-compatible with the reference ``python Phase2/Wrapper.py``
(Phase2/Wrapper.py:538-554, 15 flags) including the ``gif`` mode
(test_single_image, :381-507): 10 turntable poses via pose_spherical
(theta, -30 deg, r=4), the LEGACY renderer (near=1, far=10, non-shifted
transmittance), frames written as ``image_{count}.png`` with the reference's
cv2.imwrite BGR-swap behavior preserved behind ``--rgb_frames``.

Checkpoints: loads our .ckpt.npz, or a reference .pth directly (converted
on the fly via models/convert.py) — so shipped reference checkpoints render
without retraining.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def configParser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_path', default="./Phase2/nerf_synthetic/lego/", help="dataset path")
    parser.add_argument('--mode', default='train', help="train/test/gif")
    parser.add_argument('--lrate', default=5e-4, help="training learning rate")
    parser.add_argument('--n_pos_freq', default=10, help="number of positional encoding frequencies for position")
    parser.add_argument('--n_dirc_freq', default=4, help="number of positional encoding frequencies for viewing direction")
    parser.add_argument('--n_rays_batch', default=32 * 32 * 8, help="number of rays per batch")
    parser.add_argument('--n_sample', default=256, help="number of sample per ray")
    parser.add_argument('--max_iters', default=100001, help="number of max iterations for training")
    parser.add_argument('--logs_path', default="./logs/", help="logs path")
    parser.add_argument('--log_id', default="", help="log id")
    parser.add_argument('--checkpoint_path', default="./Phase2/checkpoints/", help="checkpoints path")
    parser.add_argument('--load_checkpoint', default=True, help="whether to load checkpoint or not")
    parser.add_argument('--save_ckpt_iter', default=1000, help="num of iteration to save checkpoint")
    parser.add_argument('--images_path', default="./image/", help="folder to store images")
    # TPU-native additions
    parser.add_argument('--n_frames', default=10, type=int, help="gif turntable frames")
    parser.add_argument('--rgb_frames', action='store_true',
                        help="write frames in RGB (the reference cv2.imwrite "
                             "swaps to BGR, Wrapper.py:504-507)")
    parser.add_argument('--downscale', default=1, type=int)
    # default True to MATCH Phase2/train.py (fused is the training/render
    # default there; main() copies this namespace onto train.py's, so a
    # False default here would silently revert train.py's fast path)
    parser.add_argument('--fused', action='store_true', default=True,
                        help="fused Pallas kernels (training: active arch; "
                             "rendering: active AND legacy archs, so "
                             "converted reference .pth checkpoints gif "
                             "through the kernel; automatic XLA fallback "
                             "outside the envelope); --no_fused opts out")
    parser.add_argument('--no_fused', dest='fused', action='store_false',
                        help="force the XLA path everywhere instead of "
                             "the fused kernels")
    parser.add_argument('--orbit', default='spherical',
                        choices=['spherical', 'lookat'],
                        help="gif turntable convention: 'spherical' = the "
                             "reference's Blender-convention pose_spherical "
                             "(Wrapper.py:444-471; correct for blender-"
                             "synthetic data like chair/lego); 'lookat' = "
                             "+z-forward look-at orbit matching this repo's "
                             "ray math — required for make_synth_scene.py "
                             "datasets, whose rig pose_spherical faces away "
                             "from")
    parser.add_argument('--orbit_radius', default=4.0, type=float,
                        help="turntable orbit radius (both conventions)")
    parser.add_argument('--orbit_elev', default=-30.0, type=float,
                        help="turntable elevation in degrees: pose_spherical "
                             "phi for --orbit spherical (reference hardcodes "
                             "-30, Wrapper.py:516), +y elevation angle for "
                             "--orbit lookat (make_synth_scene rig uses "
                             "12..48)")
    parser.add_argument('--orbit_target', default='0,0,0',
                        help="look-at target point for --orbit lookat, "
                             "comma-separated (make_synth_scene aims at "
                             "0,-0.2,0)")
    parser.add_argument('--near', default=None, type=float,
                        help="override the gif renderer's near bound "
                             "(default: the reference legacy renderer's 1.0, "
                             "Wrapper.py:128; models trained with train.py "
                             "defaults sampled [2,6])")
    parser.add_argument('--far', default=None, type=float,
                        help="override the gif renderer's far bound "
                             "(default: the reference legacy renderer's "
                             "10.0)")
    parser.add_argument('--train_variant', action='store_true',
                        help="composite gif frames with the exclusive-"
                             "transmittance 'train' variant instead of the "
                             "reference's off-by-one legacy renderer — use "
                             "for checkpoints trained by this repo")
    parser.add_argument('--no_perturb', action='store_true',
                        help="deterministic mid-bin sampling for gif frames "
                             "(the reference's legacy renderer always "
                             "jitters, Wrapper.py:148-149)")
    parser.add_argument('--white_bkgd', action='store_true',
                        help="composite gif/eval frames onto a white "
                             "background — must match how the checkpoint "
                             "was trained (train.py --white_bkgd), or empty "
                             "space renders black")
    parser.add_argument('--plot_rays', action='store_true',
                        help="write a 3-D ray-fan debug plot per gif frame "
                             "(ray_plot_{count}.png; the reference's "
                             "plot_rays, Wrapper.py:428-442,494, calls "
                             "plt.show() which blocks headless runs — same "
                             "fix as display_matches: save, don't show)")
    parser.add_argument('--platform', default='default',
                        choices=['default', 'cpu'],
                        help="'cpu' forces the host CPU backend (see "
                             "Phase2/train.py --platform)")
    parser.add_argument('--modern_schedule', action='store_true',
                        help="use train.py's StepLR(50000, 0.1) instead of "
                             "this legacy loop's StepLR(1000, 0.1) "
                             "(reference Wrapper.py:220 — lr decays to ~0 "
                             "within a few thousand iters; kept as the "
                             "default for parity with this entry point)")
    parser.add_argument('--modern_render', action='store_true',
                        help="use train.py's near=2/far=6 'train' "
                             "compositor instead of this legacy loop's "
                             "near=1/far=10 legacy compositor (reference "
                             "render() defaults, Wrapper.py:129,148-162; "
                             "kept as the default so a model trained HERE "
                             "matches what gif mode renders)")
    parser.add_argument('--eval_split', default='train',
                        choices=['train', 'test'],
                        help="split --mode test evaluates; 'train' by "
                             "default — the reference Wrapper hardcodes "
                             "mode='train' for data loading "
                             "(Wrapper.py:513) so its test() scores the "
                             "TRAIN split (train.py defaults to 'test')")
    return parser


def load_any_checkpoint(ckpt_dir):
    """Find the newest checkpoint file in ``ckpt_dir``.

    Returns ``(path or None, kind)`` where kind is 'pth' for a reference
    torch checkpoint and None for our .ckpt.npz (or when nothing exists).
    Preference order: final .npz / numerically-newest .npz, then
    final_model.pth, then the numerically-newest model_*.pth (the
    reference's lexicographic ``sorted(...)[-1]`` resume, Wrapper.py:417,
    regresses model_9000 over model_10000 — deviation: numeric sort, same
    fix as our .npz resume)."""
    import re

    from sfm_nerf_tpu.train import checkpoint as ckpt_lib

    npz = ckpt_lib.latest_checkpoint(ckpt_dir, prefer_final=True)
    if npz is not None:
        return npz, None
    final = os.path.join(ckpt_dir, "final_model.pth")
    if os.path.exists(final):
        return final, "pth"
    pths = glob.glob(os.path.join(ckpt_dir, "model_*.pth"))
    if not pths:
        return None, None

    def step_of(p):
        m = re.search(r"model_(\d+)\.pth$", p)
        return int(m.group(1)) if m else -1

    return max(pths, key=step_of), "pth"


def run_gif(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import cv2

    from sfm_nerf_tpu.config import NeRFPipelineConfig, RenderConfig
    from sfm_nerf_tpu.io.blender import load_blender_dataset, pose_spherical
    from sfm_nerf_tpu.train.nerf_trainer import make_render_image

    # reference quirk kept: gif mode loads the TRAIN split's camera_info
    # (Wrapper.py:513 hardcodes mode='train')
    images, poses, cam = load_blender_dataset(
        args.data_path, "train", downscale=int(args.downscale)
    )
    height, width = images.shape[1], images.shape[2]

    # reference parity: checkpoint_path gets the dataset name appended
    # (Wrapper.py:521-522 — split("/")[-2], which assumes a trailing
    # slash).  Try the reference rule first so gif finds what train.py
    # (same rule, train.py:781) just wrote, then the sensible
    # trailing-slash-agnostic name, then the raw path for explicitly
    # passed leaf directories.
    names = [args.data_path.split("/")[-2] if args.data_path.count("/")
             else "", args.data_path.rstrip("/").split("/")[-1]]
    path = kind = None
    for model_name in dict.fromkeys(n for n in names if n):
        path, kind = load_any_checkpoint(
            os.path.join(args.checkpoint_path, model_name))
        if path is not None:
            break
    if path is None:
        path, kind = load_any_checkpoint(args.checkpoint_path)
    if path is None:
        print("No checkpoint found")
        return
    print(f"Loading checkpoint... {path}")
    if kind == "pth":
        from sfm_nerf_tpu.models.convert import convert_pth

        params, mcfg = convert_pth(path)
    else:
        from sfm_nerf_tpu.train import checkpoint as ckpt_lib

        # the reference-parity flag set has no --hidden_size etc. — infer
        # the architecture from the checkpoint itself
        params, _ = ckpt_lib.load_params_untyped(path)
        if set(params) == {"coarse", "fine"}:
            # hierarchical checkpoint: render the fine model plainly (the
            # gif path has no coarse-pass flag surface)
            params = params["fine"]
        mcfg = ckpt_lib.infer_model_config(params)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    print(f"Checkpoint {path} loaded")

    # legacy renderer defaults (Wrapper.py:128: near=1.0, far=10.0); the
    # library renderer handles fused-kernel preconditions and fallback
    cfg = NeRFPipelineConfig(
        model=mcfg,
        render=RenderConfig(
            n_sample=int(args.n_sample),
            near=1.0 if args.near is None else float(args.near),
            far=10.0 if args.far is None else float(args.far),
            perturb=not args.no_perturb,
            variant="train" if args.train_variant else "legacy",
            use_fused_kernel=bool(args.fused),
            white_background=bool(args.white_bkgd),
        ),
    )
    render_image = make_render_image(cfg)
    K = jnp.asarray(cam.camera_matrix)

    def render_frame(pose, key):
        k = None if args.no_perturb else key
        return render_image(params, K, pose, height, width, k)

    def save_ray_plot(c2w, count):
        """Reference plot_rays parity (Wrapper.py:428-442, called at :494):
        every 50th ray drawn as the segment origin -> origin + 6*dir.  The
        reference plt.show()s (blocking); we save to images_path instead."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from sfm_nerf_tpu.ops.rays import image_rays

        o, d = image_rays(K, c2w, height, width)
        o = np.asarray(o)[::50]
        p2 = o + 6.0 * np.asarray(d)[::50]
        fig = plt.figure(figsize=(12, 12))
        ax = plt.axes(projection="3d")
        ax.set_xlabel("X")
        ax.set_ylabel("Y")
        ax.set_zlabel("Z")
        for p1, p2i in zip(o, p2):
            ax.plot([p1[0], p2i[0]], [p1[1], p2i[1]], [p1[2], p2i[2]])
        out = os.path.join(args.images_path, f"ray_plot_{count}.png")
        fig.savefig(out)
        plt.close(fig)
        print(f"wrote {out}")

    os.makedirs(args.images_path, exist_ok=True)
    key = jax.random.key(0)
    import time

    t0 = time.time()
    for count, th in enumerate(
        np.linspace(0.0, 360.0, int(args.n_frames), endpoint=False), start=1
    ):
        if args.orbit == "lookat":
            from sfm_nerf_tpu.io.blender import look_at_pose

            el = np.deg2rad(float(args.orbit_elev))
            r = float(args.orbit_radius)
            thr = np.deg2rad(float(th))
            eye = np.array([r * np.cos(el) * np.cos(thr),
                            r * np.sin(el),
                            r * np.cos(el) * np.sin(thr)])
            target = np.array([float(v) for v in args.orbit_target.split(",")])
            c2w = jnp.asarray(look_at_pose(eye, target))
        else:
            c2w = jnp.asarray(pose_spherical(
                float(th), float(args.orbit_elev), float(args.orbit_radius)))
        if args.plot_rays:
            save_ray_plot(c2w, count)
        key, sub = jax.random.split(key)
        img = np.asarray(render_frame(c2w, sub)) * 255.0
        out = os.path.join(args.images_path, f"image_{count}.png")
        # cv2.imwrite treats the array as BGR: writing the RGB render as-is
        # reproduces the reference's channel-swap artifact (Wrapper.py:
        # 504-507); --rgb_frames pre-swaps so the file comes out RGB-correct
        frame = img[..., ::-1] if args.rgb_frames else img
        cv2.imwrite(out, frame.astype(np.uint8))
        print(f"wrote {out}")
    print(f"gif frames rendered in {time.time() - t0:.1f}s")


def main(args):
    if getattr(args, "platform", "default") == "cpu":
        # before any backend touch — a CPU run must never wait on the TPU
        import jax

        jax.config.update("jax_platforms", "cpu")
    from sfm_nerf_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    print("Loading data...")
    if args.mode == "gif":
        print("Start gif")
        run_gif(args)
        return
    # train/test delegate to the main train.py implementation
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "phase2_train", os.path.join(os.path.dirname(__file__), "train.py")
    )
    train_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_mod)
    t_args = train_mod.configParser().parse_args([])
    for k, v in vars(args).items():
        # --near/--far default to None here (gif-mode override semantics);
        # don't clobber train.py's 2/6 defaults with None
        if hasattr(t_args, k) and v is not None:
            setattr(t_args, k, v)
    # Legacy-loop schedule parity (reference Wrapper.py:220): this entry
    # point trains with StepLR(step_size=1000, gamma=0.1), so the learning
    # rate collapses to ~0 after a few thousand iterations — unlike
    # train.py's StepLR(50000, 0.1).  Deliberate reference behavior, kept
    # as this CLI's default; --modern_schedule opts into the train.py one.
    # (The reference Wrapper's OTHER checkpoint quirk — bare state_dict
    # saves that its own loaders cannot read back, Wrapper.py:286 vs :211 —
    # is a bug, not behavior; our loaders accept both .pth layouts instead.)
    if not getattr(args, "modern_schedule", False):
        t_args.lrate_decay_steps = 1000
        t_args.lrate_decay = 0.1
    # Legacy-loop RENDER parity: the reference Wrapper trains AND tests
    # over near=1/far=10 with the legacy (inclusive) compositor
    # (render() defaults, Wrapper.py:129,148-162) — train.py's 2/6
    # 'train' compositor would train a model this CLI's own gif mode
    # (near=1/far=10 legacy) then samples outside of.  --modern_render
    # opts into the train.py values.
    if not getattr(args, "modern_render", False):
        t_args.near = 1.0
        t_args.far = 10.0
        t_args.render_variant = "legacy"
    train_mod.main(t_args)


def cli():
    """Zero-arg entry point for the packaged `sfm-nerf-render` command."""
    main(configParser().parse_args())


if __name__ == "__main__":
    cli()
