"""Replay dumped PnP-RANSAC failures (SFM_NERF_DUMP_PNP_FAILURES) offline.

For each fail_cam*.npz this runs the SAME pnp_ransac_bucketed call the
pipeline made, on CPU, in f64 and in f32, plus cv2.solvePnPRansac as an
oracle — separating "the correspondence set is genuinely degenerate"
(all three fail) from "f32 consensus collapse" (f64/cv2 succeed, f32
does not).

Usage:  python _probe_pnp_replay.py [dump_dir]      # default /tmp/pnp_fail_dumps
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sfm_nerf_tpu.ops.pnp import pnp_ransac_bucketed  # noqa: E402

dump_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pnp_fail_dumps"
files = sorted(glob.glob(os.path.join(dump_dir, "fail_cam*.npz")))
if not files:
    print(f"no dumps in {dump_dir}")
    sys.exit(0)

for path in files:
    d = np.load(path)
    obj, img, K = d["obj"], d["img"], d["K"]
    row = {"file": os.path.basename(path), "n_corr": len(obj),
           "tpu_n_inliers": int(d["n_inliers"])}
    for dtype, tag in ((np.float64, "f64"), (np.float32, "f32")):
        res = pnp_ransac_bucketed(
            jax.random.key(0),
            obj.astype(dtype), img.astype(dtype), K.astype(dtype),
            n_iters=2000, threshold=10.0,
        )
        row[f"{tag}_n_inliers"] = int(res.n_inliers)
    okcv, rvec, tvec, inl = cv2.solvePnPRansac(
        obj.astype(np.float64), img.astype(np.float64),
        K.astype(np.float64), None,
        iterationsCount=2000, reprojectionError=np.sqrt(10.0),
        flags=cv2.SOLVEPNP_ITERATIVE,
    )
    row["cv2_n_inliers"] = 0 if inl is None else int(len(inl))
    # how consistent is the correspondence set with ANY pose: use the cv2
    # pose (if found) to histogram reprojection errors
    if okcv:
        R, _ = cv2.Rodrigues(rvec)
        xc = (R @ obj.T + tvec).T
        uv = (K @ (xc / xc[:, 2:3]).T).T[:, :2]
        e = np.hypot(*(uv - img).T)
        row["cv2_err_median_px"] = round(float(np.median(e)), 2)
        row["cv2_err_p90_px"] = round(float(np.percentile(e, 90)), 2)
    print(row, flush=True)
