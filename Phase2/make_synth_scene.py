#!/usr/bin/env python
"""Generate a reference-scale Blender-format dataset by analytic ray tracing.

The reference trains its headline artifact on nerf_synthetic/lego
(800x800, 100 train views; /root/reference/send_turing.sh:19,
/root/reference/Phase2/get_nerf_dataset.sh downloads it from Kaggle).
This container has no network egress, so this script synthesizes a scene of
comparable difficulty — multiple textured objects, a checkered ground disk,
directional lighting with cast shadows, and VIEW-DEPENDENT specular
highlights (exercising the NeRF's direction branch) — at the same
resolution/view-count, in the exact format `io/blender.py` loads
(transforms_{mode}.json + PNGs).

Conventions are matched to the repo's ray math (ops/rays.py, itself parity
with reference Phase2/train.py:68-102): camera-to-world with +z forward,
pixel direction [(x-cx)/fx, (y-cy)/fy, 1] rotated by c2w R then normalized,
and the focal derived from camera_angle_x with the reference's non-standard
formula (io/blender.py:derive_focal) so the generator and the loader agree
exactly.

Usage:
    python Phase2/make_synth_scene.py --out Phase2/nerf_synthetic/synth800 \
        [--size 800] [--n_train 100] [--n_test 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sfm_nerf_tpu.io.blender import derive_focal, look_at_pose  # noqa: E402

CAMERA_ANGLE_X = 0.6911112070083618  # blender-synthetic default FoV

# ---------------------------------------------------------------- scene ----
# All geometry inside |p| <~ 1.6 so the default near/far = 2/6 bounds hold
# for cameras orbiting at radius ~4 (same envelope as nerf_synthetic).

SPHERES = [
    # (center, radius, texture, k_spec, spec_exp)
    (np.array([0.00, -0.35, 0.00]), 0.65, "stripes", 0.25, 64.0),
    (np.array([0.95, -0.62, 0.35]), 0.38, "blue", 0.80, 128.0),
    (np.array([-0.85, -0.55, -0.55]), 0.45, "checker_g", 0.15, 32.0),
    (np.array([-0.15, -0.80, 0.95]), 0.20, "purple", 0.40, 96.0),
    (np.array([0.35, 0.45, -0.60]), 0.30, "yellow", 0.55, 48.0),
]
GROUND_Y = -1.0
GROUND_R = 2.2
LIGHT = np.array([0.40, 1.00, 0.25])
LIGHT = LIGHT / np.linalg.norm(LIGHT)
AMBIENT = 0.18


def _sphere_albedo(tex: str, p: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Procedural per-point albedo (p: (...,3) hit points)."""
    d = p - c
    if tex == "stripes":
        band = (np.floor((np.arctan2(d[..., 2], d[..., 0]) / np.pi) * 6)
                % 2).astype(bool)
        a = np.where(band[..., None],
                     np.array([0.85, 0.20, 0.15]),
                     np.array([0.95, 0.55, 0.10]))
        return a
    if tex == "checker_g":
        u = np.floor(d[..., 0] * 8) + np.floor(d[..., 1] * 8)
        band = (u % 2).astype(bool)
        return np.where(band[..., None],
                        np.array([0.15, 0.70, 0.25]),
                        np.array([0.90, 0.90, 0.85]))
    flat = {
        "blue": np.array([0.15, 0.30, 0.90]),
        "purple": np.array([0.60, 0.20, 0.75]),
        "yellow": np.array([0.95, 0.85, 0.15]),
    }[tex]
    return np.broadcast_to(flat, p.shape).copy()


def _ground_albedo(p: np.ndarray) -> np.ndarray:
    u = np.floor(p[..., 0] / 0.4) + np.floor(p[..., 2] / 0.4)
    band = (u % 2).astype(bool)
    return np.where(band[..., None],
                    np.array([0.72, 0.72, 0.70]),
                    np.array([0.28, 0.28, 0.32]))


def _intersect_spheres(o: np.ndarray, d: np.ndarray, t_min: float = 1e-3):
    """Nearest sphere hit. o,d: (...,3). Returns (t, idx) with t=inf miss."""
    t_best = np.full(o.shape[:-1], np.inf)
    idx = np.full(o.shape[:-1], -1, np.int32)
    for i, (c, r, *_rest) in enumerate(SPHERES):
        oc = o - c
        b = np.einsum("...k,...k->...", oc, d)
        cc = np.einsum("...k,...k->...", oc, oc) - r * r
        disc = b * b - cc        # |d| == 1
        ok = disc > 0
        sq = np.sqrt(np.where(ok, disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = np.where(t0 > t_min, t0, t1)
        hit = ok & (t > t_min) & (t < t_best)
        t_best = np.where(hit, t, t_best)
        idx = np.where(hit, i, idx)
    return t_best, idx


def _shadow(p: np.ndarray) -> np.ndarray:
    """1.0 lit / 0.0 shadowed, spheres as occluders."""
    d = np.broadcast_to(LIGHT, p.shape)
    t, _ = _intersect_spheres(p, d, t_min=1e-3)
    return np.where(np.isfinite(t), 0.0, 1.0)


def trace(o: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Shade a batch of rays. o,d: (N,3) unit dirs. Returns (N,3) in [0,1]."""
    t_s, idx = _intersect_spheres(o, d)
    # ground disk y == GROUND_Y
    dy = d[..., 1]
    t_g = np.where(np.abs(dy) > 1e-9, (GROUND_Y - o[..., 1]) / dy, np.inf)
    p_g = o + d * t_g[..., None]
    in_disk = (p_g[..., 0] ** 2 + p_g[..., 2] ** 2) < GROUND_R ** 2
    t_g = np.where((t_g > 1e-3) & in_disk, t_g, np.inf)

    ground_first = t_g < t_s
    t_hit = np.where(ground_first, t_g, t_s)
    hit = np.isfinite(t_hit)
    p = o + d * np.where(hit, t_hit, 0.0)[..., None]

    # normals + albedo
    n = np.zeros_like(p)
    albedo = np.zeros_like(p)
    k_spec = np.zeros(p.shape[:-1])
    s_exp = np.full(p.shape[:-1], 32.0)
    gmask = hit & ground_first
    n[gmask] = np.array([0.0, 1.0, 0.0])
    albedo[gmask] = _ground_albedo(p[gmask])
    k_spec[gmask] = 0.05
    for i, (c, r, tex, ks, ex) in enumerate(SPHERES):
        m = hit & ~ground_first & (idx == i)
        if not m.any():
            continue
        n[m] = (p[m] - c) / r
        albedo[m] = _sphere_albedo(tex, p[m], c)
        k_spec[m] = ks
        s_exp[m] = ex

    lit = np.zeros(p.shape[:-1])
    lit[hit] = _shadow(p[hit] + 1e-3 * n[hit])
    lam = np.clip(np.einsum("...k,k->...", n, LIGHT), 0, 1)
    # Blinn-Phong half-vector: view dir is -d
    h = LIGHT - d
    h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
    spec = np.clip(np.einsum("...k,...k->...", n, h), 0, 1) ** s_exp
    rgb = (albedo * (AMBIENT + 0.85 * lam * lit)[..., None]
           + (k_spec * spec * lit)[..., None])
    rgb = np.where(hit[..., None], rgb, 0.0)   # black background: the
    # reference drops alpha from the RGBA lego PNGs (train.py:43), which
    # leaves its GT background black — same effective training target here
    return np.clip(rgb, 0.0, 1.0)


def render_view(c2w: np.ndarray, size: int, chunk_rows: int = 64):
    focal = derive_focal(CAMERA_ANGLE_X, size, "reference")
    cx = cy = size / 2
    img = np.zeros((size, size, 3), np.float32)
    for y0 in range(0, size, chunk_rows):
        y1 = min(y0 + chunk_rows, size)
        ys, xs = np.meshgrid(np.arange(y0, y1, dtype=np.float64),
                             np.arange(size, dtype=np.float64), indexing="ij")
        d = np.stack([(xs - cx) / focal, (ys - cy) / focal,
                      np.ones_like(xs)], -1)
        d = d @ c2w[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(c2w[:3, 3], d.shape)
        img[y0:y1] = trace(o.reshape(-1, 3), d.reshape(-1, 3)) \
            .reshape(y1 - y0, size, 3)
    return img


def camera_rig(n_train: int, n_test: int, seed: int = 0):
    """Upper-hemisphere orbits: train views azimuth-uniform with jittered
    elevation/radius, test views on two clean elevation rings offset by a
    half-step in azimuth (never coincident with a train view)."""
    rng = np.random.default_rng(seed)
    views = {"train": [], "test": []}
    for i in range(n_train):
        th = 2 * np.pi * i / n_train + rng.uniform(-0.02, 0.02)
        el = np.deg2rad(rng.uniform(12.0, 48.0))
        r = 4.0 + rng.uniform(-0.15, 0.15)
        eye = np.array([r * np.cos(el) * np.cos(th),
                        r * np.sin(el),
                        r * np.cos(el) * np.sin(th)])
        views["train"].append(look_at_pose(eye, np.array([0.0, -0.2, 0.0])))
    for i in range(n_test):
        th = 2 * np.pi * (i + 0.5) / n_test
        el = np.deg2rad(25.0 if i % 2 == 0 else 38.0)
        eye = np.array([4.0 * np.cos(el) * np.cos(th),
                        4.0 * np.sin(el),
                        4.0 * np.cos(el) * np.sin(th)])
        views["test"].append(look_at_pose(eye, np.array([0.0, -0.2, 0.0])))
    return views


def main():
    import imageio.v2 as imageio

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="Phase2/nerf_synthetic/synth800")
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    views = camera_rig(args.n_train, args.n_test, args.seed)
    for mode, poses in views.items():
        frames = []
        os.makedirs(os.path.join(args.out, mode), exist_ok=True)
        for i, c2w in enumerate(poses):
            img = render_view(c2w, args.size)
            rel = f"{mode}/r_{i}"
            imageio.imwrite(os.path.join(args.out, rel + ".png"),
                            (img * 255 + 0.5).astype(np.uint8))
            frames.append({"file_path": "./" + rel,
                           "transform_matrix": c2w.tolist()})
            print(f"{mode} {i + 1}/{len(poses)}", flush=True)
        with open(os.path.join(args.out, f"transforms_{mode}.json"), "w") as f:
            json.dump({"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
