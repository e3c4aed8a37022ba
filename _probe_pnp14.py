"""Reproduce the 200-camera TPU registration collapse on a 20-camera
prefix and capture every register_camera input for offline analysis.

Context: the 200-cam TPU pipeline run (bench_sfm.py --pipeline, f32)
registered only 17/200 cameras — PnP RANSAC returned <6 inliers from
image 14 onward ("Not enough inliers for reliable PnP"), while the CPU
f64 run registered all 200.  This probe reruns the identical dataset
restricted to the first 20 images and dumps each camera's (obj, img, K)
PnP inputs to /tmp/pnp_probe/cam{i}.npz so the inlier structure can be
compared across platforms/dtypes without rerunning the pipeline.

Usage:  python _probe_pnp14.py [cpu]      # arg forces CPU platform
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tests"))

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from sfm_nerf_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()
import jax  # noqa: E402

from util_synthetic import write_reference_format_dataset  # noqa: E402

from sfm_nerf_tpu.config import SfMConfig  # noqa: E402
from sfm_nerf_tpu.sfm import SfMPipeline  # noqa: E402

DUMP = "/tmp/pnp_probe"
os.makedirs(DUMP, exist_ok=True)

tmp = tempfile.mkdtemp(prefix="sfm_pnp14_")
out = os.path.join(tmp, "out")
os.makedirs(out, exist_ok=True)
# EXACT bench_sfm --pipeline dataset (seed 0, 200 cams) — only the
# pipeline's num_images is restricted, so the matching files/points seen
# by cameras 1..20 are identical to the failing run's
write_reference_format_dataset(tmp, n_cams=200, n_points=36000,
                               noise_px=0.5, seed=0)

cfg = SfMConfig(
    data_path=tmp, num_images=20, output_dir=out,
    ransac_iters=4000, pnp_iters=2000, ba_max_iters=30, merge_tracks=True,
)
pipe = SfMPipeline(cfg)

orig = SfMPipeline.register_camera


def capture(self, i, obj_points, img_points, K):
    np.savez(os.path.join(DUMP, f"cam{i}.npz"),
             obj=np.asarray(obj_points), img=np.asarray(img_points),
             K=np.asarray(K))
    return orig(self, i, obj_points, img_points, K)


SfMPipeline.register_camera = capture
print(f"platform: {jax.devices()[0]}", flush=True)
pipe.run()
print("stats:", {k: v for k, v in pipe.stats.items()
                 if k in ("pnp_errors", "stage_seconds")}, flush=True)
