#!/usr/bin/env python
"""Steady-state (resident-process) Phase1 pipeline timing on the current
backend: run the FULL pipeline twice in one process; pass 2's stage split
is what a locally-attached chip or a resident SfM service sees — the
tunneled relay's one-time per-executable load (~90-130 s each, paid on
each program's first launch in a process) is all in pass 1.

Usage: python _probe_pipeline_steady.py [--platform cpu]
"""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="default")
    ap.add_argument("--data_path", default="/root/reference/Phase1/Data")
    ap.add_argument("--confidence", type=float, default=0.0)
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    from sfm_nerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from sfm_nerf_tpu.config import SfMConfig
    from sfm_nerf_tpu.sfm import SfMPipeline

    for i in (1, 2):
        out = f"/tmp/probe_pipe_{i}"
        os.makedirs(out, exist_ok=True)
        cfg = SfMConfig(
            data_path=args.data_path, num_images=5,
            output_dir=out,
            ransac_confidence=args.confidence,
        )
        t0 = time.time()
        pipe = SfMPipeline(cfg)
        pipe.run()
        print(f"pass {i}: pipeline end-to-end = {time.time() - t0:.2f}s "
              f"stages = {pipe.stats.get('stage_seconds')}", flush=True)


if __name__ == "__main__":
    main()
