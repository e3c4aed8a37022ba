#!/usr/bin/env python
"""Phase1 entry point: full incremental SfM reconstruction.

CLI-compatible with the reference's ``python Phase1/Wrapper.py`` (which has
NO flags — paths hardcoded at Phase1/Wrapper.py:627-636); flags added here
only extend it (defaults reproduce the reference invocation).  Emits the same
artifact filenames: x_vs_z_triangulation.png, 3d_points_visualization.png,
Frame{1,2} overlays, complete_reconstruction.png, topdown_view.png.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", default="Phase1/Data",
                        help="folder with 1..N.png, calibration.txt, matching*.txt")
    parser.add_argument("--num_images", type=int, default=5)
    parser.add_argument("--output_dir", default=".")
    parser.add_argument("--ransac_iters", type=int, default=50000)
    parser.add_argument("--ransac_threshold", type=float, default=5e-4)
    parser.add_argument("--ransac_scoring", default="msac",
                        choices=["msac", "count"],
                        help="hypothesis ranking: truncated-loss sum "
                        "(platform-stable winner) or the reference's raw "
                        "inlier count (Fundamental.py:125-129)")
    parser.add_argument("--ransac_devices", type=int, default=1,
                        help="shard RANSAC hypotheses over this many "
                             "devices (bit-equal to single-device when "
                             "it divides the chunk count; wants a "
                             "multi-chip mesh)")
    parser.add_argument("--ransac_confidence", type=float, default=0.0,
                        help="> 0 (e.g. 0.999): adaptive early termination "
                             "for F-RANSAC and PnP RANSAC at this "
                             "confidence — iteration flags become caps, "
                             "~25x fewer hypotheses scored at the bundled "
                             "data's inlier ratios. 0 keeps the "
                             "reference's fixed 50000/10000 iterations")
    parser.add_argument("--no_ransac_batch_pairs", dest="ransac_batch_pairs",
                        action="store_false", default=True,
                        help="disable the pair-axis batched F-RANSAC (one "
                             "device launch per shape bucket; bit-equal "
                             "per pair) and run the per-pair host loop "
                             "instead")
    parser.add_argument("--pnp_iters", type=int, default=10000)
    parser.add_argument("--pnp_threshold", type=float, default=10.0)
    parser.add_argument("--pnp_f64_rescue", default="auto",
                        choices=["auto", "on", "off"],
                        help="per-camera numpy-f64 host retry when an f32 "
                        "accelerator PnP RANSAC fails its inlier gate "
                        "(ADDITION; 'auto' = active only on non-x64 runs, "
                        "so CPU f64 behavior is unchanged)")
    parser.add_argument("--ransac_adaptive_device", default="auto",
                        choices=["auto", "host", "device"],
                        help="with --ransac_confidence > 0: 'host' drives "
                             "the confidence exit chunk-by-chunk from the "
                             "host (free dispatch on CPU), 'device' runs it "
                             "inside ONE lax.while_loop launch (no per-chunk "
                             "tunnel RTT), 'auto' picks device on any "
                             "non-CPU backend (ADDITION; same winners "
                             "either way, pinned by test)")
    parser.add_argument("--ba_max_iters", type=int, default=50)
    parser.add_argument("--runs", type=int, default=1,
                        help="run the full pipeline this many times in one "
                             "resident process, printing per-run wall-clock "
                             "(ADDITION: pass 2+ is the steady state a "
                             "locally-attached chip or a resident SfM "
                             "service sees — the tunneled relay pays a "
                             "one-time per-executable load on each "
                             "program's first launch, all in pass 1)")
    parser.add_argument("--bucket_floor", type=int, default=-1,
                        help="point-axis pow2-bucket floor: -1 auto (4096 "
                             "on an accelerator, per-op default 64 on CPU), "
                             "0 = per-op default everywhere, >0 explicit.  "
                             "Merging the small shape buckets into one cuts "
                             "the per-process executable count ~3x per op "
                             "on a relay-attached chip; results are "
                             "bucket-invariant (the true count is data)")
    parser.add_argument("--ba_interval", type=int, default=0,
                        help="run a light global BA after every this many "
                             "camera registrations (0 = off; bounds "
                             "incremental drift at 100+ cameras)")
    parser.add_argument("--ba_interval_iters", type=int, default=10)
    parser.add_argument("--registration_retries", type=int, default=2,
                        help="extra passes re-attempting images whose PnP "
                             "failed once more neighbors are registered "
                             "and the map re-adjusted (0 = reference's "
                             "strict single visit)")
    parser.add_argument("--tri_reproj_gate_px", type=float, default=10.0,
                        help="incremental triangulations must reproject "
                             "within this many px in both source views to "
                             "enter the map (0 = off; rejects diverged "
                             "refinements that poison later PnP)")
    parser.add_argument("--ba_devices", type=int, default=1,
                        help="shard global BA's point axis over this many "
                             "devices (parallel/ba.py; single-device "
                             "results up to reduction-order rounding)")
    parser.add_argument("--ba_refine_intrinsics", default="",
                        help="comma-set of {f,fx,fy,pp,cx,cy,k1,k2}: free "
                             "the shared intrinsics (focals / principal "
                             "point / radial distortion) in global BA "
                             "(e.g. 'f,k1'); default '' keeps the "
                             "calibrated K fixed like the reference")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--float64", default=True,
                        type=lambda s: s.lower() not in ("0", "false", "no"),
                        help="run geometry in float64 (reference precision; "
                             "forced off on TPU, which has no f64)")
    parser.add_argument("--essential_method", default="from_f",
                        choices=["from_f", "5pt"],
                        help="two-view E: conjugate the 8-point F "
                             "(reference behavior) or the Stewenius 5-point "
                             "minimal solver")
    parser.add_argument("--global_init", action="store_true",
                        help="full global-SfM initialization: rotation "
                             "averaging + translation averaging (joint "
                             "camera centers from pairwise baseline "
                             "directions) -> re-triangulation -> BA")
    parser.add_argument("--global_rotation_init", action="store_true",
                        help="re-initialize all camera rotations by global "
                             "rotation averaging over pairwise essentials "
                             "before bundle adjustment")
    parser.add_argument("--global_init_batch_pairs", type=int, default=256,
                        help="pair-axis chunk for the pose-graph build: "
                             "one batched relative-pose dispatch per chunk "
                             "instead of ~6 per pair (0 = per-pair loop)")
    parser.add_argument("--init_pair", default="fixed",
                        choices=["fixed", "auto"],
                        help="initial two-view pair: 'fixed' = (1,2) "
                             "(reference behavior, Wrapper.py:666); 'auto' "
                             "scores candidates by inlier support x median "
                             "triangulation parallax")
    parser.add_argument("--view_order", default="index",
                        choices=["index", "greedy"],
                        help="camera registration order: 'index' = ascending "
                             "image index (reference); 'greedy' = "
                             "next-best-view by 2D-3D correspondence count, "
                             "retrying images index order would skip")
    parser.add_argument("--merge_tracks", action="store_true",
                        help="reconcile re-detected features across matching "
                             "files into single tracks (the reference's "
                             "per-file namespace never merges them)")
    parser.add_argument("--export_nerf", default="",
                        help="after reconstruction, export a Phase2-trainable "
                             "NeRF dataset (images + transforms_*.json with "
                             "SfM poses, calibrated intrinsics, and "
                             "scene-derived near/far) to this directory — "
                             "the SfM->NeRF coupling the reference only "
                             "describes (sfm/to_nerf.py).  Train with "
                             "Phase2/train.py --data_path DIR/ --near auto "
                             "--far auto")
    parser.add_argument("--export_holdout_every", type=int, default=0,
                        help="send every Nth registered view to the export's "
                             "test split (0 = test split mirrors train)")
    parser.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "default"],
                        help="device backend. Default cpu: this 5-image "
                             "problem is latency-bound and wants float64; "
                             "the host loop over per-pair shapes would pay "
                             "one accelerator compile per shape. Use the "
                             "TPU for large-scale RANSAC/BA workloads.")
    args = parser.parse_args()

    import jax

    if args.platform == "cpu":
        # BEFORE any backend touch: the default platform is the remote
        # TPU attachment, and initializing it costs seconds (or hangs
        # outright when the tunnel is wedged) — a CPU run must never
        # depend on TPU reachability
        jax.config.update("jax_platforms", "cpu")
    # cache enablement initializes the backend (it asks the runtime for
    # its build string), so it must come after the platform choice; the
    # cache is on for EVERY backend (warm CPU runs are 3.6x faster)
    from sfm_nerf_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    resolved = jax.devices()[0].platform
    if args.platform == "tpu" and resolved == "cpu":
        raise SystemExit(
            "--platform tpu requested but no TPU backend is available "
            f"(resolved: {resolved})"
        )
    if args.float64:
        if resolved == "cpu":
            jax.config.update("jax_enable_x64", True)
        else:
            # accelerators have no float64 — geometry runs f32 there
            # (RANSAC is normalization-conditioned; refinement/BA tolerate
            # f32 with a measured accuracy gap, see PERFORMANCE.md)
            print(f"note: float64 unavailable on {resolved}; running f32")

    from sfm_nerf_tpu.config import SfMConfig
    from sfm_nerf_tpu.sfm import SfMPipeline

    cfg = SfMConfig(
        data_path=args.data_path,
        num_images=args.num_images,
        ransac_iters=args.ransac_iters,
        ransac_threshold=args.ransac_threshold,
        ransac_scoring=args.ransac_scoring,
        ransac_devices=args.ransac_devices,
        ransac_confidence=args.ransac_confidence,
        ransac_batch_pairs=args.ransac_batch_pairs,
        ransac_adaptive_device={"auto": None, "host": False,
                                "device": True}[args.ransac_adaptive_device],
        pnp_iters=args.pnp_iters,
        pnp_threshold=args.pnp_threshold,
        pnp_f64_rescue=args.pnp_f64_rescue,
        ba_max_iters=args.ba_max_iters,
        ba_interval=args.ba_interval,
        ba_interval_iters=args.ba_interval_iters,
        registration_retries=args.registration_retries,
        tri_reproj_gate_px=args.tri_reproj_gate_px,
        ba_devices=args.ba_devices,
        ba_refine_intrinsics=args.ba_refine_intrinsics,
        essential_method=args.essential_method,
        global_rotation_init=args.global_rotation_init,
        global_init=args.global_init,
        global_init_batch_pairs=args.global_init_batch_pairs,
        init_pair=args.init_pair,
        view_order=args.view_order,
        merge_tracks=args.merge_tracks,
        bucket_floor=args.bucket_floor,
        seed=args.seed,
        output_dir=args.output_dir,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    for run_i in range(max(args.runs, 1)):
        import time as _time

        t0 = _time.time()
        pipe = SfMPipeline(cfg)
        result = pipe.run()
        if args.runs > 1:
            # per-run result line: a resident service must show its answer
            # did NOT change across runs (same seed => bit-identical
            # pipeline), so the invariance is user-visible and testable
            ba_err = pipe.stats.get("ba", {}).get("final_err_px", {})
            print(
                f"run {run_i + 1}/{args.runs}: end-to-end "
                f"{_time.time() - t0:.2f}s  "
                f"ba_mean_px={ba_err.get('mean', float('nan')):.6f}  "
                f"n_registered={pipe.stats.get('n_registered')}  stages = "
                f"{pipe.stats.get('stage_seconds')}", flush=True,
            )

    if args.export_nerf:
        import cv2
        import numpy as np

        from sfm_nerf_tpu.io.sfm_data import load_calibration
        from sfm_nerf_tpu.sfm.to_nerf import export_nerf_dataset

        image_paths = {
            i: os.path.join(args.data_path, f"{i}.png")
            for i in sorted(result["camera_info"])
        }
        h, w = cv2.imread(next(iter(image_paths.values()))).shape[:2]
        K_exp = load_calibration(
            os.path.join(args.data_path, "calibration.txt"))
        refined = result["stats"].get("ba", {}).get("intrinsics")
        distortion = None
        if refined is not None:
            # --ba_refine_intrinsics ran: export the refined PINHOLE part
            # (fx, fy, cx, cy) — BA optimized the poses/points under it, so
            # exporting the stale calibration would mis-aim every NeRF ray.
            # Radial k1/k2 are NOT representable in transforms.json, so the
            # exporter RESAMPLES the frames to the refined pinhole model
            # (to_nerf.undistort_image) whenever they are nonzero.
            K_exp = np.array([
                [refined[0], 0.0, refined[2]],
                [0.0, refined[1], refined[3]],
                [0.0, 0.0, 1.0],
            ])
            distortion = (float(refined[4]), float(refined[5]))
            from sfm_nerf_tpu.sfm.to_nerf import (
                max_distortion_displacement_px,
            )

            disp = max_distortion_displacement_px(
                K_exp, distortion[0], distortion[1], h, w)
            if disp > 0.25:  # same gate the exporter's resample applies
                print(
                    "export_nerf: undistorting exported frames to the "
                    f"refined pinhole model (k1={refined[4]:.4f}, "
                    f"k2={refined[5]:.4f}, max corner displacement "
                    f"{disp:.2f} px)"
                )
        export_nerf_dataset(
            result["camera_info"],
            result["points"],
            K_exp,
            image_paths,
            args.export_nerf,
            width=w,
            height=h,
            holdout_every=args.export_holdout_every,
            distortion=distortion,
        )


if __name__ == "__main__":
    main()
