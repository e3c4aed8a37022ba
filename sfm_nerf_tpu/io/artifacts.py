"""Artifact writers: the reference's reconstruction plots and overlays, with
identical filenames (BASELINE requires "the same reconstruction plots").

Headless by design: matplotlib Agg, no plt.show()/cv2.imshow() — the
reference blocks on interactive windows (Phase1/Wrapper.py:532-535,658),
which stalls cluster runs (SURVEY §3.1)."""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def save_x_vs_z_plot(
    triangulated_points: Sequence[np.ndarray], out_dir: str = "."
) -> str:
    """'X vs Z Coordinates for Different Camera Poses'
    (Phase1/Wrapper.py:461-494 -> x_vs_z_triangulation.png)."""
    colors = ["blue", "green", "red", "orange"]
    plt.figure(figsize=(10, 8))
    for i, points in enumerate(triangulated_points):
        pts = np.asarray(points)
        if len(pts) == 0:
            continue
        plt.scatter(
            pts[:, 0], pts[:, 2], color=colors[i % len(colors)], s=10,
            alpha=0.7, label=f"Camera pose {i + 1}",
        )
    plt.grid(True)
    plt.xlabel("X")
    plt.ylabel("Z")
    plt.title("X vs Z Coordinates for Different Camera Poses")
    plt.legend()
    plt.axis("equal")
    path = os.path.join(out_dir, "x_vs_z_triangulation.png")
    plt.savefig(path, dpi=300)
    plt.close()
    return path


def save_3d_points_plot(
    X_final: np.ndarray,
    C_final: np.ndarray,
    X_optimized: Optional[np.ndarray] = None,
    out_dir: str = ".",
    title: str = "3D Points Visualization",
) -> str:
    """3d_points_visualization.png (Phase1/Wrapper.py:293-349)."""
    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")
    X = np.asarray(X_final)
    ax.scatter(X[:, 0], X[:, 1], X[:, 2], c="blue", marker="o",
               label="Linear Triangulation", alpha=0.6)
    if X_optimized is not None:
        Xo = np.asarray(X_optimized)
        ax.scatter(Xo[:, 0], Xo[:, 1], Xo[:, 2], c="red", marker="^",
                   label="Non-Linear Optimization", alpha=0.6)
    ax.scatter(0, 0, 0, c="green", marker="s", s=100, label="Camera 1")
    C = np.asarray(C_final).reshape(-1)
    ax.scatter(C[0], C[1], C[2], c="purple", marker="s", s=100, label="Camera 2")
    ax.set_xlabel("X"), ax.set_ylabel("Y"), ax.set_zlabel("Z")
    ax.set_title(title)
    ax.legend()
    # zero-size reductions have no identity (a degenerate init pair can
    # leave no surviving candidates) — siblings guard with `if len(...)`
    m = max(np.abs(X).max() if len(X) else 1.0, 1e-6)
    ax.set_xlim(-m, m), ax.set_ylim(-m, m), ax.set_zlim(-m, m)
    plt.tight_layout()
    path = os.path.join(out_dir, "3d_points_visualization.png")
    plt.savefig(path, dpi=300)
    plt.close(fig)
    return path


def save_reconstruction_plot(
    X_all: np.ndarray, camera_info: Dict[int, Dict], out_dir: str = "."
) -> str:
    """complete_reconstruction.png (Phase1/Wrapper.py:351-394)."""
    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")
    X_all = np.asarray(X_all)
    if len(X_all):
        ax.scatter(X_all[:, 0], X_all[:, 1], X_all[:, 2], c="blue",
                   marker=".", s=2, alpha=0.6)
    for i, info in camera_info.items():
        C = np.asarray(info["C"]).reshape(-1)
        ax.scatter(C[0], C[1], C[2], color=f"C{i}", marker="s", s=100,
                   label=f"Camera {i}")
    ax.set_xlabel("X"), ax.set_ylabel("Y"), ax.set_zlabel("Z")
    ax.set_title("Complete 3D Reconstruction")
    ax.legend()
    if len(X_all):
        m = np.abs(X_all).max() * 1.2
        ax.set_xlim(-m, m), ax.set_ylim(-m, m), ax.set_zlim(-m, m)
    plt.tight_layout()
    path = os.path.join(out_dir, "complete_reconstruction.png")
    plt.savefig(path, dpi=300)
    plt.close(fig)
    return path


def save_topdown_plot(
    X_all: np.ndarray, camera_info: Dict[int, Dict], out_dir: str = "."
) -> str:
    """topdown_view.png (Phase1/Wrapper.py:761-781)."""
    plt.figure(figsize=(10, 10))
    plt.xlim(-10, 10)
    plt.ylim(-10, 10)
    X_all = np.asarray(X_all)
    if len(X_all):
        plt.scatter(X_all[:, 0], X_all[:, 2], marker=".", linewidths=0.5,
                    color="blue")
    for i, info in camera_info.items():
        C = np.asarray(info["C"]).reshape(-1)
        plt.plot(C[0], C[2], marker="o", markersize=15, linestyle="None",
                 label=f"Camera {i}")
    plt.grid(True)
    plt.xlabel("X"), plt.ylabel("Z")
    plt.title("Top-down View (X-Z Plane)")
    plt.legend()
    path = os.path.join(out_dir, "topdown_view.png")
    plt.savefig(path)
    plt.close()
    return path


def save_ply(
    points: np.ndarray, colors: Optional[np.ndarray] = None,
    out_dir: str = ".", name: str = "reconstruction.ply",
    binary: Optional[bool] = None,
) -> str:
    """PLY point cloud (colors uint8 RGB).  A production-facing export the
    reference lacks — its reconstruction only exists as matplotlib scatter
    PNGs.  ``binary=None`` picks the native C++ binary writer for large
    clouds (>=100k points: ~20x faster, 4x smaller) and greppable ASCII for
    small ones; pass True/False to force."""
    points = np.asarray(points, np.float64)
    if colors is None:
        colors = np.full((len(points), 3), 180, np.uint8)
    colors = np.asarray(colors, np.uint8)
    path = os.path.join(out_dir, name)
    if binary is None:
        binary = len(points) >= 100_000
    if binary:
        import ctypes

        from sfm_nerf_tpu.io.sfm_data import _load_native

        lib = _load_native()
        if lib is not None:
            pts = np.ascontiguousarray(points, np.float64)
            cols = np.ascontiguousarray(colors, np.uint8)
            rc = lib.write_ply_binary(
                path.encode(),
                pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(pts),
            )
            if rc == 0:
                return path
        # toolchain unavailable / write failure: fall through to ASCII
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(points)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(points, colors):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")
    return path


def save_match_visualization(
    img1: np.ndarray, img2: np.ndarray, matches: np.ndarray,
    out_dir: str = ".", name: str = "feature_matches.png",
) -> str:
    """cv2.drawMatches figure — the headless version of the reference's
    blocking display_matches (Phase1/Wrapper.py:223-233, cv2.imshow)."""
    import cv2

    kp1 = [cv2.KeyPoint(float(m[0]), float(m[1]), 5) for m in matches]
    kp2 = [cv2.KeyPoint(float(m[2]), float(m[3]), 5) for m in matches]
    dmatches = [
        cv2.DMatch(_queryIdx=i, _trainIdx=i, _distance=0)
        for i in range(len(matches))
    ]
    vis = cv2.drawMatches(
        img1, kp1, img2, kp2, dmatches, None,
        flags=cv2.DrawMatchesFlags_NOT_DRAW_SINGLE_POINTS,
    )
    path = os.path.join(out_dir, name)
    cv2.imwrite(path, vis)
    return path


def save_projection_overlays(
    img1: np.ndarray, img2: np.ndarray,
    proj1: np.ndarray, proj2: np.ndarray,
    pts1: np.ndarray, pts2: np.ndarray,
    stage: str, out_dir: str = ".",
) -> Sequence[str]:
    """Green projected / red original dots — 'Frame{1,2} - *.jpg'
    (Phase1/Wrapper.py:508-538, 565-583).  ``stage`` in
    {'lineartriangulation', 'nonlineartriangulation'}; the reference's
    nonlinear frame-2 filename has its idiosyncratic spacing preserved."""
    import cv2

    def draw(img, proj, orig):
        out = img.copy()
        for pt in np.asarray(proj):
            if np.all(np.isfinite(pt)):
                cv2.circle(out, (int(round(pt[0])), int(round(pt[1]))), 2,
                           (0, 255, 0), -1)
        for pt in np.asarray(orig):
            cv2.circle(out, (int(round(pt[0])), int(round(pt[1]))), 2,
                       (0, 0, 255), -1)
        return out

    if stage == "lineartriangulation":
        names = ["Frame1 - lineartriangulation.jpg",
                 "Frame2 - lineartriangulation.jpg"]
    else:
        names = ["Frame1 - nonlineartriangulation.jpg",
                 "Frame2 -non lineartriangulation.jpg"]
    paths = []
    for img, proj, orig, name in [
        (img1, proj1, pts1, names[0]), (img2, proj2, pts2, names[1])
    ]:
        p = os.path.join(out_dir, name)
        cv2.imwrite(p, draw(img, proj, orig))
        paths.append(p)
    return paths
