#!/usr/bin/env python
"""Phase2 entry point: NeRF training / testing.

Flag-compatible with the reference ``python Phase2/train.py`` (all 19 flags,
Phase2/train.py:792-816, same names and defaults — including the string
defaults the reference coerces in main, :772-779).  TPU-only additions:
``--dp`` (data-parallel chips), ``--downscale``, ``--render_variant``,
``--arch``, ``--steps_per_call``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _bound(v):
    """--near/--far value: a float, or 'auto' = take the dataset's hint."""
    return v if v == "auto" else float(v)


def configParser():
    parser = argparse.ArgumentParser()
    # --- reference flags, names and defaults preserved -----------------
    parser.add_argument('--data_path', default="./Phase2/nerf_synthetic/lego/", help="dataset path")
    parser.add_argument('--mode', default='train', help="train/test/val")
    parser.add_argument('--lrate', default=5e-4, help="training learning rate")
    parser.add_argument('--n_pos_freq', default=10, help="number of positional encoding frequencies for position")
    parser.add_argument('--n_dirc_freq', default=4, help="number of positional encoding frequencies for viewing direction")
    parser.add_argument('--n_rays_batch', default=32 * 32 * 8, help="number of rays per batch")
    parser.add_argument('--n_sample', default=256, help="number of sample per ray")
    parser.add_argument('--max_iters', default=200001, help="number of max iterations for training")
    parser.add_argument('--logs_path', default="./logs/", help="logs path")
    parser.add_argument('--log_id', default="", help="log id")
    parser.add_argument('--exp_name', default="lego_experiment", help="experiment name for logging")
    parser.add_argument('--checkpoint_path', default="./Phase2/checkpoints_new_2/", help="checkpoints path")
    parser.add_argument('--load_checkpoint', default=True, help="whether to load checkpoint or not")
    parser.add_argument('--save_ckpt_iter', default=1000, help="num of iteration to save checkpoint")
    parser.add_argument('--ckpt_backend', default="npz", choices=["npz", "orbax"],
                        help="checkpoint writer: npz (one transparent file "
                             "per step) or orbax (async, multi-host)")
    parser.add_argument('--images_path', default="./image/", help="folder to store images")
    parser.add_argument('--perturb', default=True, type=bool, help="use stratified sampling")
    parser.add_argument('--near', default=2.0, type=_bound,
                        help="near bound for ray sampling (or 'auto': use "
                             "the dataset's scene-derived hint, written by "
                             "the SfM->NeRF bridge)")
    parser.add_argument('--far', default=6.0, type=_bound,
                        help="far bound for ray sampling (or 'auto', as "
                             "--near)")
    parser.add_argument('--chunk_size', default=1024 * 32, type=int, help="chunk size for memory efficient inference")
    parser.add_argument('--hidden_size', default=256, type=int, help="hidden layer width")
    parser.add_argument('--lrate_decay', default=0.1, type=float, help="learning rate decay factor")
    parser.add_argument('--lrate_decay_steps', default=50000, type=int, help="learning rate decay steps")
    # --- TPU-native additions ------------------------------------------
    parser.add_argument('--dp', default=0, type=int, help="data-parallel chips (0 = all)")
    parser.add_argument('--downscale', default=1, type=int, help="integer image downscale")
    parser.add_argument('--render_variant', default='train', help="train|legacy compositor")
    parser.add_argument('--arch', default='active', help="active|legacy MLP architecture")
    parser.add_argument('--no_pos_encoding', action='store_true', help="positional-encoding ablation")
    parser.add_argument('--white_bkgd', action='store_true',
                        help="composite onto a white background (standard "
                             "NeRF option for synthetic single objects — "
                             "ADDITION; kills the all-empty local optimum "
                             "a dark object on black cannot escape; "
                             "supported by both XLA and fused paths)")
    parser.add_argument('--density_bias_init', default=0.0, type=float,
                        help="initial density-head bias (ADDITION): start "
                             "sparse scenes as thin fog so the density "
                             "field cannot collapse to the all-empty "
                             "optimum (see config.NeRFModelConfig)")
    parser.add_argument('--lindisp', action='store_true',
                        help="stratified samples linear in INVERSE depth "
                             "(for real/SfM scenes whose depth spans "
                             "decades; Blender shells don't need it)")
    parser.add_argument('--n_importance', default=0, type=int,
                        help="hierarchical fine-pass importance samples "
                             "(0 = off; coarse/fine model pair when on)")
    parser.add_argument('--fused', action='store_true', default=True,
                        help="fused Pallas kernels: full-frame renders AND "
                             "the training step (merged fwd+bwd kernel; "
                             "falls back to XLA automatically outside the "
                             "fused envelope — active arch, n_sample%%128==0, "
                             "train variant; hierarchical + white bg "
                             "supported in-kernel).  DEFAULT since the "
                             "merged kernel reached quality parity at 3.2x "
                             "XLA speed (PERFORMANCE.md); --no_fused opts "
                             "out")
    parser.add_argument('--no_fused', dest='fused', action='store_false',
                        help="train/render through XLA autodiff instead of "
                             "the fused kernels")
    parser.add_argument('--steps_per_call', default=1, type=int,
                        help="train steps fused into one device call via "
                             "lax.scan (amortizes dispatch latency on "
                             "remote/tunneled TPU attachments)")
    parser.add_argument('--eval_split', default='test',
                        choices=['test', 'train'],
                        help="dataset split --mode test evaluates; "
                             "Wrapper.py's delegation defaults this to "
                             "'train' (the reference Wrapper hardcodes "
                             "mode='train' for data loading, "
                             "Wrapper.py:513, so ITS test() scores the "
                             "train split)")
    parser.add_argument('--save_depth', action='store_true',
                        help="test mode: also save depth / disparity / "
                             "accumulated-opacity maps per test view "
                             "(test_{i}_{depth,disp,acc}.png; no reference "
                             "analog — its renderer returns rgb only)")
    parser.add_argument('--seed', default=0, type=int)
    parser.add_argument('--platform', default='default',
                        choices=['default', 'cpu'],
                        help="'default' uses the best available backend "
                             "(TPU when attached); 'cpu' forces the host "
                             "CPU — the reference's no-GPU fallback "
                             "(train.py:15), and the only way to run "
                             "off-TPU here because the container selects "
                             "the TPU programmatically")
    return parser


def build_config(args):
    from sfm_nerf_tpu.config import (
        NeRFModelConfig, NeRFPipelineConfig, ParallelConfig, RenderConfig,
        TrainConfig,
    )

    # reference rule first (split("/")[-2] assumes a trailing slash,
    # train.py:781) with the trailing-slash-agnostic fallback Wrapper.py
    # already uses — a bare `--data_path lego` is 'a bug, not behavior'
    model_name = (args.data_path.split("/")[-2] if args.data_path.count("/")
                  else args.data_path.rstrip("/"))
    model_name = model_name or args.data_path.rstrip("/").split("/")[-1]
    return NeRFPipelineConfig(
        model=NeRFModelConfig(
            n_pos_freq=int(args.n_pos_freq),
            n_dir_freq=int(args.n_dirc_freq),
            hidden=int(args.hidden_size),
            pos_encoding=not args.no_pos_encoding,
            arch=args.arch,
            density_bias_init=float(getattr(args, "density_bias_init", 0.0)),
        ),
        render=RenderConfig(
            n_sample=int(args.n_sample),
            n_importance=int(args.n_importance),
            near=float(args.near),
            far=float(args.far),
            perturb=bool(args.perturb),
            lindisp=bool(getattr(args, "lindisp", False)),
            chunk_size=int(args.chunk_size),
            variant=args.render_variant,
            use_fused_kernel=bool(getattr(args, "fused", False)),
            white_background=bool(getattr(args, "white_bkgd", False)),
        ),
        train=TrainConfig(
            lrate=float(args.lrate),
            lrate_decay=float(args.lrate_decay),
            lrate_decay_steps=int(args.lrate_decay_steps),
            n_rays_batch=int(args.n_rays_batch),
            max_iters=int(args.max_iters),
            save_ckpt_iter=int(args.save_ckpt_iter),
            ckpt_backend=args.ckpt_backend,
            steps_per_call=int(args.steps_per_call),
            seed=int(args.seed),
        ),
        parallel=ParallelConfig(dp=int(args.dp)),
        data_path=args.data_path,
        mode=args.mode,
        logs_path=args.logs_path,
        log_id=args.log_id,
        exp_name=args.exp_name,
        checkpoint_path=os.path.join(args.checkpoint_path, model_name),
        load_checkpoint=bool(args.load_checkpoint),
        images_path=args.images_path,
    )


def run_train(cfg, images, poses, cam):
    from tensorboardX import SummaryWriter

    from sfm_nerf_tpu.train.nerf_trainer import NeRFTrainer

    log_dir = os.path.join(cfg.logs_path, cfg.exp_name)
    os.makedirs(log_dir, exist_ok=True)
    writer = SummaryWriter(log_dir)
    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix, writer=writer)
    stats = trainer.fit()
    writer.close()
    print(f"Training done: {stats}")
    return stats


def run_test(cfg, images, poses, cam, save_depth=False):
    import numpy as np
    import imageio.v2 as imageio
    import jax

    from sfm_nerf_tpu.train import checkpoint as ckpt_lib
    from sfm_nerf_tpu.train.nerf_trainer import NeRFTrainer

    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    path = ckpt_lib.latest_checkpoint(cfg.checkpoint_path, prefer_final=True)
    if path is None:
        print("No checkpoint found. Exiting.")
        return
    print(f"Loading final model from {path}")
    params, _, _ = ckpt_lib.load_checkpoint(path, trainer.params)
    trainer.params = jax.tree_util.tree_map(np.asarray, params)

    out_dir = os.path.join(
        cfg.images_path, os.path.basename(cfg.checkpoint_path)
    )
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(cfg.train.seed)
    n_test = min(5, len(images))
    idxs = rng.choice(len(images), n_test, replace=False)
    height, width = images.shape[1], images.shape[2]
    total = 0.0
    render_aux = None
    if save_depth:
        from sfm_nerf_tpu.train.nerf_trainer import make_render_image_aux

        render_aux = make_render_image_aux(cfg)
    for i, idx in enumerate(idxs):
        print(f"Rendering test image {i + 1}/{n_test}...")
        if render_aux is not None:
            rgb, depth, disp, acc = render_aux(
                trainer.params, trainer.K, trainer.poses[int(idx)],
                height, width,
            )
            pred = np.asarray(rgb)
            depth = np.asarray(depth)
            acc8 = (np.clip(np.asarray(acc), 0, 1) * 255).astype(np.uint8)
            # depth normalized over the configured sampling range so maps
            # are comparable across views; disparity self-normalized
            dn = np.clip(
                (depth - cfg.render.near)
                / max(cfg.render.far - cfg.render.near, 1e-9), 0, 1)
            depth8 = (dn * 255).astype(np.uint8)
            # zero-weight rays (empty space, exact-0 relu density) carry
            # disp = 1/eps = 1e10; normalizing by that would crush every
            # real disparity to black — mask them out first
            disp = np.where(np.asarray(acc) > 1e-6, np.asarray(disp), 0.0)
            disp8 = (np.clip(disp / max(disp.max(), 1e-9), 0, 1)
                     * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(out_dir, f"test_{i}_depth.png"), depth8)
            imageio.imwrite(os.path.join(out_dir, f"test_{i}_disp.png"), disp8)
            imageio.imwrite(os.path.join(out_dir, f"test_{i}_acc.png"), acc8)
        else:
            pred = np.asarray(trainer.render_image(
                trainer.params, trainer.K, trainer.poses[int(idx)], height, width
            ))
        gt = images[int(idx)]
        mse_val = float(((pred - gt) ** 2).mean())
        total += mse_val
        pred8 = (np.clip(pred, 0, 1) * 255).astype(np.uint8)
        gt8 = (gt * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, f"test_{i}_gt.png"), gt8)
        imageio.imwrite(os.path.join(out_dir, f"test_{i}_pred.png"), pred8)
        imageio.imwrite(
            os.path.join(out_dir, f"test_{i}_comparison.png"),
            np.concatenate([gt8, pred8], axis=1),
        )
        # figure_{i}.png: titled side-by-side matplotlib figure
        # (train.py:663-676), saved headlessly (no plt.show)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(12, 6))
        axes[0].imshow(gt8)
        axes[0].set_title("Ground Truth")
        axes[0].axis("off")
        axes[1].imshow(pred8)
        axes[1].set_title(f"Prediction (Loss: {mse_val:.6f})")
        axes[1].axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"figure_{i}.png"), dpi=150)
        plt.close(fig)
        psnr = -10 * np.log10(max(mse_val, 1e-12))
        from sfm_nerf_tpu.utils.metrics import ssim

        ssim_val = float(ssim(pred, gt))    # ADDITION: standard NeRF metric
        print(f"  MSE {mse_val:.6f}  PSNR {psnr:.2f} dB  SSIM {ssim_val:.4f}")
    print(f"Testing complete. Average loss: {total / n_test:.6f}")
    print(f"Results saved to {out_dir}")


def main(args):
    if getattr(args, "platform", "default") == "cpu":
        # before any backend touch (the cache hookup below initializes
        # one): a CPU run must never depend on TPU reachability
        import jax

        jax.config.update("jax_platforms", "cpu")
    from sfm_nerf_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    print("Loading data...")
    from sfm_nerf_tpu.io.blender import load_blender_dataset

    mode = ("train" if args.mode == "train"
            else getattr(args, "eval_split", "test"))
    images, poses, cam = load_blender_dataset(
        args.data_path, mode, downscale=int(args.downscale)
    )
    for name in ("near", "far"):
        if getattr(args, name) == "auto":
            hint = getattr(cam, name)
            if hint is None:
                raise SystemExit(
                    f"--{name} auto: transforms_{mode}.json carries no "
                    f"'{name}' hint (only SfM->NeRF bridge datasets do)"
                )
            print(f"--{name} auto -> {hint:.3f} (dataset hint)")
            setattr(args, name, hint)
    cfg = build_config(args)
    if args.mode == "train":
        print("Start training")
        run_train(cfg, images, poses, cam)
    elif args.mode == "test":
        print("Start testing")
        run_test(cfg, images, poses, cam, save_depth=bool(args.save_depth))
    else:
        # loud, nonzero exit: the reference's if/elif silently exits 0 on
        # any other mode (incl. the help string's 'val'), which scripts
        # mistake for a completed run — a bug, not behavior
        raise SystemExit(
            f"--mode {args.mode!r} is not implemented (use train or test; "
            "'val' has no implementation in the reference either)"
        )


def cli():
    """Zero-arg entry point for the packaged `sfm-nerf-train` command."""
    main(configParser().parse_args())


if __name__ == "__main__":
    cli()
