#!/usr/bin/env python
"""Measure the pair-axis F-RANSAC stage's warm in-process time on the
current backend, separating the tunneled relay's one-time executable-load
tax (paid on the first launch of each program in a process) from the
stage's actual device work.

Context (PERFORMANCE.md round-3): warm process-level Phase1 timing on the
tunneled v5e is dominated by ~90-130 s/executable relay-side load of the
cached RANSAC programs — infrastructure that a locally-attached chip does
not pay.  This probe runs refine_all_matches twice in one process: pass 1
pays the load, pass 2 is the steady-state number a resident service (or a
local chip) sees.

Usage: python _probe_ransac_stage.py [--platform cpu] [--confidence 0.999]
"""

import argparse
import copy
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="default")
    ap.add_argument("--confidence", type=float, default=0.0)
    ap.add_argument("--data_path", default="/root/reference/Phase1/Data")
    ap.add_argument("--no_batch_pairs", action="store_true")
    # force the adaptive driver: 'host' chunk loop vs 'device' while_loop
    # ('auto' = backend default) — the round-4 device-vs-host measurement
    ap.add_argument("--adaptive_device", default="auto",
                    choices=["auto", "host", "device"])
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    from sfm_nerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from sfm_nerf_tpu.config import SfMConfig
    from sfm_nerf_tpu.io.sfm_data import parse_matching_files
    from sfm_nerf_tpu.sfm import SfMPipeline

    cfg = SfMConfig(
        data_path=args.data_path, num_images=5, output_dir="/tmp/probe_out",
        ransac_confidence=args.confidence,
        ransac_batch_pairs=not args.no_batch_pairs,
        ransac_adaptive_device={"auto": None, "host": False,
                                "device": True}[args.adaptive_device],
    )
    pipe = SfMPipeline(cfg)
    matches_dict, tracks, visibility = parse_matching_files(
        args.data_path, cfg.num_images)

    for i in (1, 2, 3):
        t0 = time.time()
        pipe.refine_all_matches(
            copy.deepcopy(matches_dict),
            copy.deepcopy(tracks),
            visibility.copy(),
        )
        print(f"pass {i}: ransac_refine stage = {time.time() - t0:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
