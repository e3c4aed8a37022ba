"""Blender-synthetic (nerf_synthetic) dataset loader.

Behavior parity with the reference loader (Phase2/train.py:19-65):
- reads ``transforms_{mode}.json`` (``camera_angle_x`` + per-frame 4x4
  ``transform_matrix`` camera-to-world),
- loads PNGs, converts to RGB in [0,1], drops alpha,
- derives the focal with the reference's NON-standard formula
  ``0.5 * camera_angle_x * W / tan(0.5 * camera_angle_x)`` (train.py:53 —
  an extra ``camera_angle_x`` factor vs the usual ``0.5*W/tan(...)``); the
  standard formula is available behind ``focal_formula='standard'`` as a
  documented switch (SURVEY §7 hard-part d),
- K = [[f,0,W/2],[0,f,H/2],[0,0,1]].

Extension beyond the reference: transforms files may carry EXPLICIT
intrinsics (``fl_x/fl_y/cx/cy``, the instant-ngp convention) and scene
``near``/``far`` hints — written by the SfM->NeRF bridge
(sfm/to_nerf.py), whose real calibrations a centered ``camera_angle_x``
pinhole cannot represent.  When ``fl_x`` is present it wins over the
``camera_angle_x`` derivation.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraInfo:
    width: int
    height: int
    camera_matrix: np.ndarray  # (3,3) float32
    # scene depth-bound hints from the transforms file (SfM->NeRF bridge
    # datasets carry them; Blender-synthetic ones don't -> None)
    near: "float | None" = None
    far: "float | None" = None


def derive_focal(camera_angle_x: float, width: int, formula: str = "reference") -> float:
    if formula == "reference":
        return 0.5 * camera_angle_x * width / np.tan(0.5 * camera_angle_x)
    if formula == "standard":
        return 0.5 * width / np.tan(0.5 * camera_angle_x)
    raise ValueError(f"unknown focal formula {formula!r}")


def load_blender_dataset(
    data_path: str,
    mode: str,
    focal_formula: str = "reference",
    downscale: int = 1,
    use_native: bool = True,
) -> Tuple[np.ndarray, np.ndarray, CameraInfo]:
    """Returns (images (N,H,W,3) float32, poses (N,4,4) float32, CameraInfo).

    ``downscale`` integer-subsamples images (and scales intrinsics) — an
    addition over the reference for fast iteration at 200^2/100^2.
    ``use_native`` decodes PNGs through the parallel C++ libpng path
    (native/image_decode.cpp) when available; byte-identical to the
    imageio fallback for 8-bit inputs (tested).
    """
    json_file = os.path.join(data_path, f"transforms_{mode}.json")
    with open(json_file) as f:
        meta = json.load(f)
    # explicit-intrinsics files (fl_x/fl_y/cx/cy, instant-ngp convention /
    # sfm/to_nerf.py exports) may omit camera_angle_x entirely — only
    # required on the derive-focal path below
    camera_angle_x = (
        float(meta["camera_angle_x"]) if "camera_angle_x" in meta else None
    )

    fps = [
        os.path.join(data_path, frame["file_path"] + ".png")
        for frame in meta["frames"]
    ]
    poses = np.stack([
        np.asarray(frame["transform_matrix"], dtype=np.float32)
        for frame in meta["frames"]
    ])

    raw = None
    if use_native:
        from sfm_nerf_tpu.io.sfm_data import decode_images_native

        raw = decode_images_native(fps)
    if raw is not None:
        # downscale BEFORE the float conversion: slicing first keeps peak
        # memory at the uint8 size, and np.ascontiguousarray drops the
        # full-resolution base array a strided view would otherwise pin
        # for the whole run (~16x retained memory at downscale=4)
        if downscale > 1:
            raw = np.ascontiguousarray(raw[:, ::downscale, ::downscale])
        images = raw.astype(np.float32) / 255.0
    else:
        import imageio.v2 as imageio

        images = []
        for fp in fps:
            img = imageio.imread(fp)
            # normalize by the DTYPE's range, not a hardcoded 255: a
            # 16-bit PNG would otherwise land in [0, 257] on this
            # fallback while the native path (decode_images_native)
            # normalizes it to [0, 1] — same dataset, platform-dependent
            # numerics
            denom = (np.iinfo(img.dtype).max
                     if np.issubdtype(img.dtype, np.integer) else 1.0)
            img = img.astype(np.float32) / denom
            if img.shape[-1] == 4:
                img = img[..., :3]
            if downscale > 1:
                img = img[::downscale, ::downscale]
            images.append(img)
        images = np.stack(images).astype(np.float32)
    height, width = images.shape[1], images.shape[2]
    if "fl_x" in meta:
        # explicit-intrinsics extension (sfm/to_nerf.py datasets): the
        # stored values are for the full-resolution frames; the integer
        # subsample divides them uniformly.
        s = 1.0 / downscale
        K = np.array(
            [[meta["fl_x"] * s, 0, meta["cx"] * s],
             [0, meta["fl_y"] * s, meta["cy"] * s],
             [0, 0, 1]],
            dtype=np.float32,
        )
    else:
        if camera_angle_x is None:
            raise KeyError(
                f"{json_file} has neither camera_angle_x nor fl_x/fl_y — "
                "cannot derive intrinsics"
            )
        focal = derive_focal(camera_angle_x, width, focal_formula)
        K = np.array(
            [[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]],
            dtype=np.float32,
        )
    return images, poses, CameraInfo(
        width=width,
        height=height,
        camera_matrix=K,
        near=float(meta["near"]) if "near" in meta else None,
        far=float(meta["far"]) if "far" in meta else None,
    )


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Turntable camera pose (Phase2/Wrapper.py:444-471): translate along z,
    rotate by phi about x, theta about y, then the reference's axis-swap."""
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = radius
    phi = np.deg2rad(phi_deg)
    rot_phi = np.array(
        [[1, 0, 0, 0],
         [0, np.cos(phi), -np.sin(phi), 0],
         [0, np.sin(phi), np.cos(phi), 0],
         [0, 0, 0, 1]], dtype=np.float32)
    th = np.deg2rad(theta_deg)
    rot_theta = np.array(
        [[np.cos(th), 0, -np.sin(th), 0],
         [0, 1, 0, 0],
         [np.sin(th), 0, np.cos(th), 0],
         [0, 0, 0, 1]], dtype=np.float32)
    swap = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
        dtype=np.float32)
    return swap @ rot_theta @ rot_phi @ c2w


def look_at_pose(eye: np.ndarray, target: np.ndarray) -> np.ndarray:
    """c2w with +z forward — the convention this repo's ray math uses
    (ops/rays.py, parity with reference Phase2/train.py:68-102).  up =
    (0,-1,0) so pixel +y (downward in the saved PNG) maps to world -y:
    rendered frames display ground-side-down under the no-flip ray
    convention the loader/trainer use.  This is the rig convention of
    Phase2/make_synth_scene.py datasets; `pose_spherical` above is the
    reference's Blender-convention turntable and faces AWAY from scenes
    built with this function (Wrapper.py --orbit selects between them)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    nr = np.linalg.norm(right)
    if nr < 1e-8:
        # straight-down/up view (fwd ∥ up, e.g. --orbit_elev ±90): any
        # horizontal right-vector is valid — pick world +x so the frame
        # stays deterministic instead of dividing 0/0 into a NaN pose
        right = np.array([1.0, 0.0, 0.0])
        nr = 1.0
    right /= nr
    up2 = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float64)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, fwd, eye
    return c2w
