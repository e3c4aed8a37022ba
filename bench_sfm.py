#!/usr/bin/env python
"""SfM RANSAC scale benchmark: hypotheses/second at production match counts.

The reference's RANSAC is a 50k-iteration Python loop of LAPACK SVDs
(Phase1/Fundamental.py:95-129) — this measures our batched implementation
against a faithful numpy re-creation of that loop, at growing match counts.

Usage: python bench_sfm.py [--platform cpu|default] [--n_matches N]
Prints one JSON line per configuration.
"""

import argparse
import json
import time

import numpy as np


def numpy_reference_ransac(pts1, pts2, n_iters, threshold=5e-4):
    """The reference's loop, re-created (normalization pre-applied)."""
    rng = np.random.default_rng(0)
    h1 = np.hstack([pts1, np.ones((len(pts1), 1))])
    h2 = np.hstack([pts2, np.ones((len(pts2), 1))])
    best_count = -1
    for _ in range(n_iters):
        idx = rng.choice(len(pts1), 8, replace=False)
        A = np.zeros((8, 9))
        for r, (p1, p2) in enumerate(zip(pts1[idx], pts2[idx])):
            x1, y1 = p1
            x2, y2 = p2
            A[r] = [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, 1]
        _, _, Vt = np.linalg.svd(A)
        F = Vt[-1].reshape(3, 3)
        U, S, Vt2 = np.linalg.svd(F)
        S[2] = 0
        F = U @ np.diag(S) @ Vt2
        F = F / F[2, 2]
        Fx1 = F @ h1.T
        n1 = np.linalg.norm(Fx1[:2], axis=0)
        Fx1n = Fx1 / n1
        Fx2 = F @ h2.T
        n2 = np.linalg.norm(Fx2[:2], axis=0)
        Fx2n = Fx2 / n2
        d = (h2 * Fx1n.T).sum(1) ** 2 / (
            Fx1n[0] ** 2 + Fx1n[1] ** 2 + Fx2n[0] ** 2 + Fx2n[1] ** 2
        )
        count = (d < threshold).sum()
        if count > best_count:
            best_count = count
    return best_count


def bench_ba(args):
    """Bundle adjustment at production scale: N cams x M points."""
    import jax
    import jax.numpy as jnp
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests"))
    from sfm_nerf_tpu.ops.ba import bundle_adjust, camera_params_from_RC

    # ring of cameras looking at a central point cloud (the test-suite scene
    # generator degrades beyond ~5 cameras)
    rng = np.random.default_rng(1)
    N, M = args.ba_cams, args.ba_points
    K = np.array([[800.0, 0, 400.0], [0, 800.0, 300.0], [0, 0, 1.0]])
    points = rng.uniform(-1.5, 1.5, (M, 3))
    Rs, Cs, obs = [], [], []
    for i in range(N):
        th = 2 * np.pi * i / N
        C = np.array([6 * np.cos(th), 0.5 * np.sin(3 * th), 6 * np.sin(th)])
        fwd = -C / np.linalg.norm(C)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd])          # world->cam rows
        P = K @ R @ np.hstack([np.eye(3), -C[:, None]])
        x = (P @ np.hstack([points, np.ones((M, 1))]).T).T
        x = x[:, :2] / x[:, 2:3] + rng.normal(0, 0.5, (M, 2))
        Rs.append(R), Cs.append(C), obs.append(x)
    scene = {"K": K, "obs": np.stack(obs)}
    cams = np.asarray(camera_params_from_RC(
        jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(Cs))))
    cams = cams + rng.normal(0, 0.003, cams.shape)
    pts = points + rng.normal(0, 0.02, points.shape)
    vis = rng.uniform(size=(N, M)) < 0.3        # sparse tracks
    vis[:2] = True                               # well-posed
    dt_dtype = jnp.float32 if args.platform != "cpu" else jnp.float64
    to = lambda a: jnp.asarray(np.asarray(a), dt_dtype)

    if args.ba_devices > 1:
        # point-sharded BA (parallel/ba.py) — the real lever is multi-chip
        # HBM/FLOPs; on one chip this only measures the psum overhead
        import functools

        from sfm_nerf_tpu.parallel import make_mesh
        from sfm_nerf_tpu.parallel.ba import bundle_adjust_sharded

        ba_fn = functools.partial(
            bundle_adjust_sharded, mesh=make_mesh(dp=args.ba_devices, tp=1)
        )
    else:
        ba_fn = bundle_adjust
    res = ba_fn(to(scene["K"]), to(cams), to(pts),
                to(scene["obs"]), to(vis.astype(float)), n_iters=30)
    float(res.cost)  # compile + completion barrier
    t0 = time.time()
    res = ba_fn(to(scene["K"]), to(cams), to(pts),
                to(scene["obs"]), to(vis.astype(float)), n_iters=30)
    cost = float(res.cost)
    dt = time.time() - t0
    n_obs = float(res.n_residuals)
    print(json.dumps({
        "metric": "ba_seconds_30_lm_iters",
        "n_cams": args.ba_cams, "n_points": args.ba_points,
        "n_obs": int(n_obs),
        "platform": str(np.asarray(jnp.zeros(1)).dtype) and str(jax.devices()[0]),
        "value": round(dt, 3),
        "rms_px_before": round(float(np.sqrt(2 * float(res.initial_cost) / n_obs)), 4),
        "rms_px_after": round(float(np.sqrt(2 * cost / n_obs)), 4),
        "accepted_steps": int(res.n_accepted),
    }))


def bench_pipeline(args):
    """Full SfM pipeline at scale on a synthetic reference-format dataset
    (>= 50 cams, >= 100k match rows) — the end-to-end wall-clock number,
    dominated by per-stage accelerator work now that RANSAC / PnP /
    triangulation are all shape-bucketed (one compile per size bucket)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests"))
    import tempfile

    import jax

    from util_synthetic import write_reference_format_dataset
    from sfm_nerf_tpu.config import SfMConfig
    from sfm_nerf_tpu.sfm import SfMPipeline

    tmp = tempfile.mkdtemp(prefix="sfm_scale_")
    out = os.path.join(tmp, "out")
    os.makedirs(out, exist_ok=True)
    t0 = time.time()
    _, gt = write_reference_format_dataset(
        tmp, n_cams=args.pipe_cams, n_points=args.pipe_points,
        noise_px=0.5, seed=0,
    )
    gen_s = time.time() - t0
    cfg = SfMConfig(
        data_path=tmp, num_images=args.pipe_cams, output_dir=out,
        ransac_iters=args.pipe_ransac_iters, pnp_iters=2000,
        ba_max_iters=30, merge_tracks=True,
        ba_interval=args.pipe_ba_interval,
        global_init=args.pipe_global_init,
        ransac_confidence=args.pipe_ransac_confidence,
    )
    t0 = time.time()
    pipe = SfMPipeline(cfg)
    pipe.run()
    wall = time.time() - t0
    ba = pipe.stats.get("ba", {})
    print(json.dumps({
        "metric": "pipeline_seconds_end_to_end",
        "n_cams": args.pipe_cams, "n_points": args.pipe_points,
        "n_match_rows": int(gt["n_match_rows"]),
        "platform": str(jax.devices()[0]),
        "value": round(wall, 1), "datagen_s": round(gen_s, 1),
        "ba_rms_px": round(ba.get("rms_px_after", -1.0), 4),
        "ba_mean_px": round(
            ba.get("final_err_px", {}).get("mean", -1.0), 4),
        "n_obs": ba.get("n_obs", -1),
        "n_registered": pipe.stats.get("n_registered", -1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="default",
                    choices=["cpu", "default"])
    ap.add_argument("--n_matches", type=int, default=4096)
    ap.add_argument("--n_iters", type=int, default=50000)
    ap.add_argument("--ref_iters", type=int, default=500,
                    help="reference-loop iterations to extrapolate from")
    ap.add_argument("--ba", action="store_true",
                    help="benchmark bundle adjustment instead of RANSAC")
    ap.add_argument("--ba_cams", type=int, default=50)
    ap.add_argument("--ba_points", type=int, default=20000)
    ap.add_argument("--ba_devices", type=int, default=1,
                    help="shard the point axis over this many devices "
                         "(parallel/ba.py)")
    ap.add_argument("--pipeline", action="store_true",
                    help="full SfM pipeline on a large synthetic dataset")
    ap.add_argument("--pipe_cams", type=int, default=50)
    ap.add_argument("--pipe_points", type=int, default=15000)
    ap.add_argument("--pipe_ransac_iters", type=int, default=4000)
    ap.add_argument("--pipe_ransac_confidence", type=float, default=0.0,
                    help="0 = fixed-count RANSAC (parity default); e.g. "
                         "0.999 enables the confidence early exit (host "
                         "chunk loop on CPU, lax.while_loop device driver "
                         "on accelerators)")
    ap.add_argument("--pipe_ba_interval", type=int, default=0,
                    help="intermediate BA every K registrations "
                         "(SfMConfig.ba_interval)")
    ap.add_argument("--pipe_global_init", action="store_true",
                    help="rotation+translation averaging re-init before "
                         "the final BA (SfMConfig.global_init) — the "
                         "drift-vs-chain-depth counterfactual at scale")
    args = ap.parse_args()

    # platform choice must precede the cache hookup: enabling the cache
    # initializes the backend, and a --platform cpu run must never depend
    # on (or wait for) the remote TPU attachment
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from sfm_nerf_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    if args.ba:
        import jax

        if args.platform == "cpu":
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_enable_x64", True)
        bench_ba(args)
        return

    if args.pipeline:
        import jax

        if args.platform == "cpu":
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_enable_x64", True)
        bench_pipeline(args)
        return

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sfm_nerf_tpu.ops.epipolar import ransac_fundamental

    rng = np.random.default_rng(0)
    n = args.n_matches
    # synthetic correspondences with 30% outliers (pixel coordinates)
    pts1 = rng.uniform(0, 800, (n, 2))
    pts2 = pts1 + rng.normal(0, 1.0, (n, 2))
    out = rng.choice(n, n // 3, replace=False)
    pts2[out] += rng.uniform(-100, 100, (len(out), 2))

    # reference loop (extrapolated), fed Hartley-normalized points exactly
    # as reject_outliers does (Fundamental.py:79-90) so its 5e-4 threshold
    # is meaningful
    def hartley(p):
        c = p.mean(0)
        s = np.sqrt(2) / np.sqrt(((p - c) ** 2).sum(1).mean())
        return (p - c) * s

    t0 = time.time()
    numpy_reference_ransac(hartley(pts1), hartley(pts2), args.ref_iters)
    ref_per_iter = (time.time() - t0) / args.ref_iters
    ref_hps = 1.0 / ref_per_iter

    # ours: one jitted call
    p1 = jnp.asarray(pts1, jnp.float32)
    p2 = jnp.asarray(pts2, jnp.float32)
    res = ransac_fundamental(jax.random.key(0), p1, p2,
                             n_iters=args.n_iters, chunk=2048)
    int(res.n_inliers)  # completion barrier (incl. compile)
    t0 = time.time()
    res = ransac_fundamental(jax.random.key(1), p1, p2,
                             n_iters=args.n_iters, chunk=2048)
    n_inl = int(res.n_inliers)  # forces completion
    dt = time.time() - t0
    ours_hps = args.n_iters / dt

    print(json.dumps({
        "metric": "ransac_hypotheses_per_sec",
        "n_matches": n,
        "n_iters": args.n_iters,
        "platform": str(jax.devices()[0]),
        "value": round(ours_hps, 1),
        "reference_loop_hps": round(ref_hps, 1),
        "speedup": round(ours_hps / ref_hps, 1),
        "n_inliers": n_inl,
    }))


if __name__ == "__main__":
    main()
