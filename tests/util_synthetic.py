"""Synthetic test data generators.

The real nerf_synthetic dataset is not bundled (the reference downloads it
from Kaggle, Phase2/get_nerf_dataset.sh), so tests synthesize:

- a tiny Blender-style dataset on disk (transforms_{mode}.json + PNGs) whose
  images are analytic renderings of a soft emissive sphere — enough signal
  for a small NeRF to overfit in a few hundred steps;
- multi-view SfM scenes with known K/R/C/3D points for geometry-op oracles.
"""

from __future__ import annotations

import json
import os

import numpy as np


def look_at_pose(eye: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Camera-to-world with +z forward (matching the reference's no-flip
    convention: pixel dirs have +z camera-forward)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(up, fwd)) > 0.99:
        up = np.array([1.0, 0.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, fwd, eye
    return c2w


def render_sphere_image(K, c2w, height, width, center, radius=0.6):
    """Analytic soft-sphere 'ground truth' image for overfitting tests."""
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    d = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    d = d @ c2w[:3, :3].T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = c2w[:3, 3]
    # distance from sphere center to each ray
    oc = center - o
    t_closest = d @ oc
    closest = o + d * t_closest[..., None]
    dist = np.linalg.norm(closest - center, axis=-1)
    mask = np.clip(1.0 - dist / radius, 0, 1)
    img = np.stack([mask, 0.5 * mask, 1.0 - mask * 0.7], -1)
    return img.astype(np.float32)


def make_blender_dataset(
    root: str, n_frames: int = 8, height: int = 40, width: int = 40,
    modes=("train", "test"),
):
    """Write a miniature Blender-synthetic-format dataset to ``root``."""
    import imageio.v2 as imageio

    camera_angle_x = 0.6911112070083618
    center = np.array([0.0, 0.0, 0.0])
    rng = np.random.default_rng(0)
    for mode in modes:
        frames = []
        os.makedirs(os.path.join(root, mode), exist_ok=True)
        for i in range(n_frames):
            th = 2 * np.pi * i / n_frames + (0.3 if mode == "test" else 0.0)
            eye = np.array(
                [4 * np.cos(th), 1.0 + 0.2 * rng.standard_normal(), 4 * np.sin(th)]
            )
            c2w = look_at_pose(eye.astype(np.float32), center.astype(np.float32))
            focal = 0.5 * camera_angle_x * width / np.tan(0.5 * camera_angle_x)
            K = np.array([[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]])
            img = render_sphere_image(K, c2w, height, width, center)
            rel = f"{mode}/r_{i}"
            imageio.imwrite(
                os.path.join(root, rel + ".png"),
                (img * 255).astype(np.uint8),
            )
            frames.append(
                {"file_path": "./" + rel, "transform_matrix": c2w.tolist()}
            )
        with open(os.path.join(root, f"transforms_{mode}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
    return root


def make_sfm_scene(
    n_cams: int = 4, n_points: int = 200, noise_px: float = 0.0, seed: int = 0
):
    """Random multi-view scene with exact 2D observations.

    Returns dict with K, Rs (world->cam), Cs (camera centers), points (M,3),
    obs (N,M,2) pixel observations, vis (N,M) bool (all True; points are
    placed in front of every camera).
    """
    rng = np.random.default_rng(seed)
    K = np.array([[800.0, 0, 400.0], [0, 800.0, 300.0], [0, 0, 1.0]])
    points = rng.uniform([-1.5, -1.5, 4.0], [1.5, 1.5, 8.0], (n_points, 3))
    Rs, Cs, obs = [], [], []
    for i in range(n_cams):
        angle = 0.15 * (i - (n_cams - 1) / 2)
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])  # yaw about y
        C = np.array([2.0 * np.sin(angle * 2), 0.1 * i, -0.5 * i])
        P = K @ R @ np.hstack([np.eye(3), -C[:, None]])
        Xh = np.hstack([points, np.ones((n_points, 1))])
        x = (P @ Xh.T).T
        x = x[:, :2] / x[:, 2:3]
        if noise_px > 0:
            x = x + rng.normal(0, noise_px, x.shape)
        Rs.append(R)
        Cs.append(C)
        obs.append(x)
    return {
        "K": K,
        "Rs": np.stack(Rs),
        "Cs": np.stack(Cs),
        "points": points,
        "obs": np.stack(obs),
        "vis": np.ones((n_cams, n_points), dtype=bool),
    }


def tiny_pipeline_setup(n_rays=256, n_img=3, height=16, width=16, seed=0):
    """Deterministic tiny NeRF training setup shared by the in-process
    parallel tests and the 2-process multihost worker (no tmp files, no
    pytest fixtures — the worker runs standalone)."""
    import jax
    import jax.numpy as jnp

    from sfm_nerf_tpu.config import (
        NeRFModelConfig, NeRFPipelineConfig, RenderConfig, TrainConfig,
    )
    from sfm_nerf_tpu.models import init_nerf_params
    from sfm_nerf_tpu.train.nerf_trainer import make_optimizer

    cfg = NeRFPipelineConfig(
        model=NeRFModelConfig(hidden=32, n_pos_freq=4, n_dir_freq=2),
        render=RenderConfig(n_sample=16),
        train=TrainConfig(n_rays_batch=n_rays),
    )
    rng = np.random.default_rng(seed)
    images = jnp.asarray(
        rng.uniform(0, 1, (n_img, height, width, 3)), jnp.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_img, 1, 1))
    poses[:, 2, 3] = 4.0
    focal = 0.5 * 0.6911 * width / np.tan(0.5 * 0.6911)
    K = jnp.asarray(
        [[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]],
        jnp.float32)
    tx = make_optimizer(cfg)
    params = init_nerf_params(jax.random.key(seed), cfg.model)
    opt_state = tx.init(params)
    return cfg, tx, params, opt_state, images, jnp.asarray(poses), K


def write_reference_format_dataset(
    out_dir, n_cams=50, n_points=4000, noise_px=0.5,
    width=800, height=600, seed=0, visibility_window=8,
):
    """Synthesize an SfM dataset on disk in the REFERENCE's input format
    (calibration.txt + matching{i}.txt + i.png), at arbitrary scale.

    Cameras sit on a ring looking inward; each feature is observed by a
    contiguous window of cameras (realistic track structure).  Returns
    (out_dir, ground_truth dict).
    """
    import os

    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    f = 0.9 * width
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
    points = rng.uniform(-1.5, 1.5, (n_points, 3))
    Rs, Cs = [], []
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        C = np.array([6 * np.cos(th), 0.4 * np.sin(3 * th), 6 * np.sin(th)])
        fwd = -C / np.linalg.norm(C)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        R = np.stack([right, np.cross(fwd, right), fwd])
        Rs.append(R); Cs.append(C)
    Rs, Cs = np.stack(Rs), np.stack(Cs)

    # projections + in-image mask
    Xh = np.hstack([points, np.ones((n_points, 1))])
    obs = np.zeros((n_cams, n_points, 2))
    ok = np.zeros((n_cams, n_points), bool)
    for c in range(n_cams):
        P = K @ Rs[c] @ np.hstack([np.eye(3), -Cs[c][:, None]])
        x = (P @ Xh.T).T
        z = x[:, 2]
        x = x[:, :2] / np.maximum(z[:, None], 1e-9)
        x += rng.normal(0, noise_px, x.shape)
        obs[c] = x
        ok[c] = (
            (z > 0.2) & (x[:, 0] >= 0) & (x[:, 0] < width)
            & (x[:, 1] >= 0) & (x[:, 1] < height)
        )
    # restrict each feature to a contiguous camera window (track realism)
    start = rng.integers(0, n_cams, n_points)
    for p in range(n_points):
        w = np.zeros(n_cams, bool)
        idxs = (start[p] + np.arange(visibility_window)) % n_cams
        w[idxs] = True
        ok[:, p] &= w

    with open(os.path.join(out_dir, "calibration.txt"), "w") as fcal:
        for row in K:
            fcal.write(" ".join(f"{v:.6f}" for v in row) + "\n")
    img = np.full((height, width, 3), 128, np.uint8)
    for i in range(1, n_cams + 1):
        cv2.imwrite(os.path.join(out_dir, f"{i}.png"), img)

    n_rows = 0
    for i in range(1, n_cams):          # matching{i}.txt: i vs j>i
        lines = []
        for p in range(n_points):
            if not ok[i - 1, p]:
                continue
            js = [j for j in range(i + 1, n_cams + 1) if ok[j - 1, p]]
            if not js:
                continue
            toks = [str(len(js) + 1), "128", "128", "128",
                    f"{obs[i - 1, p, 0]:.4f}", f"{obs[i - 1, p, 1]:.4f}"]
            for j in js:
                toks += [str(j), f"{obs[j - 1, p, 0]:.4f}",
                         f"{obs[j - 1, p, 1]:.4f}"]
            lines.append(" ".join(toks))
            n_rows += len(js)
        with open(os.path.join(out_dir, f"matching{i}.txt"), "w") as fm:
            fm.write(f"nFeatures: {len(lines)}\n")
            fm.write("\n".join(lines) + ("\n" if lines else ""))
    return out_dir, {
        "K": K, "Rs": Rs, "Cs": Cs, "points": points, "n_match_rows": n_rows,
    }
