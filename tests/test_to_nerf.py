"""SfM -> NeRF bridge (sfm/to_nerf.py): convention oracles + round trip.

The coupling the reference only describes (SURVEY §1): Phase1 poses feeding
Phase2 training.  The oracles here pin the one thing that can silently rot —
that a ray generated from the EXPORTED pose/intrinsics passes through the
triangulated 3D geometry that produced the observation.
"""

import json
import os

import numpy as np
import pytest

from sfm_nerf_tpu.io.blender import load_blender_dataset
from sfm_nerf_tpu.sfm.to_nerf import (
    c2w_from_rc,
    export_nerf_dataset,
    near_far_from_points,
)
from util_synthetic import make_sfm_scene


def _scene_as_sfm_result(scene):
    camera_info = {
        i + 1: {"R": scene["Rs"][i], "C": scene["Cs"][i]}
        for i in range(len(scene["Rs"]))
    }
    points = {f: scene["points"][f] for f in range(len(scene["points"]))}
    return camera_info, points


def _write_source_images(tmp_path, cam_ids, width=64, height=48):
    import imageio.v2 as imageio

    rng = np.random.default_rng(7)
    paths = {}
    for i in cam_ids:
        img = rng.integers(0, 255, (height, width, 3), dtype=np.uint8)
        p = os.path.join(tmp_path, f"{i}.png")
        imageio.imwrite(p, img)
        paths[i] = p
    return paths


def test_rays_from_exported_pose_hit_the_triangulated_points(tmp_path):
    """End-to-end convention oracle: export -> reload via the Blender loader
    -> Phase2 ray gen -> every observed point's pixel ray passes through its
    3D point (exactness of the R,C <-> c2w <-> ray-convention chain)."""
    from sfm_nerf_tpu.ops.rays import pixel_to_ray

    scene = make_sfm_scene(n_cams=3, n_points=50)
    camera_info, points = _scene_as_sfm_result(scene)
    paths = _write_source_images(str(tmp_path), camera_info, 800, 600)
    export_nerf_dataset(
        camera_info, points, scene["K"], paths, str(tmp_path / "nerf"),
        width=800, height=600,
    )
    images, poses, cam = load_blender_dataset(str(tmp_path / "nerf"), "train")

    K = cam.camera_matrix.astype(np.float64)
    np.testing.assert_allclose(K, scene["K"], rtol=1e-6)
    for ci in range(poses.shape[0]):
        uv = scene["obs"][ci]                       # (M,2) exact pixels
        o, d = pixel_to_ray(
            K, poses[ci].astype(np.float64), uv[:, 0], uv[:, 1]
        )
        o, d = np.asarray(o), np.asarray(d)
        # distance from each 3D point to its pixel's ray
        to_pt = scene["points"] - o
        t = np.sum(to_pt * d, axis=-1, keepdims=True)
        miss = np.linalg.norm(to_pt - t * d, axis=-1)
        assert miss.max() < 1e-4, miss.max()
        # and the ray marches FORWARD to the point (positive depth)
        assert t.min() > 0


def test_near_far_bracket_scene_depths():
    scene = make_sfm_scene(n_cams=4, n_points=300, seed=3)
    camera_info, points = _scene_as_sfm_result(scene)
    near, far = near_far_from_points(camera_info, points)
    assert 0 < near < far
    X = scene["points"]
    for i in range(len(scene["Rs"])):
        z = (X - scene["Cs"][i]) @ scene["Rs"][i][2]
        lo, hi = np.percentile(z, 1), np.percentile(z, 99)
        assert near <= lo and far >= hi


def test_export_holdout_split(tmp_path):
    scene = make_sfm_scene(n_cams=6, n_points=40)
    camera_info, points = _scene_as_sfm_result(scene)
    paths = _write_source_images(str(tmp_path), camera_info)
    export_nerf_dataset(
        camera_info, points, scene["K"], paths, str(tmp_path / "nerf"),
        width=64, height=48, holdout_every=3,
    )
    with open(tmp_path / "nerf" / "transforms_train.json") as f:
        train = json.load(f)
    with open(tmp_path / "nerf" / "transforms_test.json") as f:
        test = json.load(f)
    train_ids = {fr["sfm_camera_id"] for fr in train["frames"]}
    test_ids = {fr["sfm_camera_id"] for fr in test["frames"]}
    assert len(train_ids) == 4 and len(test_ids) == 2
    assert not train_ids & test_ids
    # intrinsics + bounds hints present in both splits
    for meta in (train, test):
        for key in ("fl_x", "fl_y", "cx", "cy", "near", "far"):
            assert key in meta


def test_loader_accepts_intrinsics_only_transforms(tmp_path):
    """A transforms file with explicit fl_x/fl_y/cx/cy and NO
    camera_angle_x (instant-ngp convention) must load — camera_angle_x is
    only required on the derive-focal path."""
    from util_synthetic import make_blender_dataset

    root = make_blender_dataset(str(tmp_path), n_frames=2, height=16,
                                width=16, modes=("train",))
    jf = os.path.join(root, "transforms_train.json")
    with open(jf) as f:
        meta = json.load(f)
    del meta["camera_angle_x"]
    meta.update(fl_x=20.0, fl_y=21.0, cx=8.0, cy=7.0)
    with open(jf, "w") as f:
        json.dump(meta, f)
    _, _, cam = load_blender_dataset(root, "train")
    np.testing.assert_allclose(
        cam.camera_matrix,
        [[20.0, 0, 8.0], [0, 21.0, 7.0], [0, 0, 1]], atol=0)

    # and with neither convention present, the error names the file
    del meta["fl_x"]
    with open(jf, "w") as f:
        json.dump(meta, f)
    import pytest

    with pytest.raises(KeyError, match="camera_angle_x"):
        load_blender_dataset(root, "train")


def test_c2w_inverts_world_to_camera():
    scene = make_sfm_scene(n_cams=2, n_points=10, seed=1)
    R, C = scene["Rs"][0], scene["Cs"][0]
    c2w = c2w_from_rc(R, C)
    X = scene["points"]
    x_cam = (X - C) @ R.T                      # Phase1 world->camera
    back = x_cam @ c2w[:3, :3].T + c2w[:3, 3]  # c2w applied to camera coords
    np.testing.assert_allclose(back, X, atol=1e-10)


def test_loader_rejects_auto_without_hint(tmp_path):
    """Phase2/train.py --near auto on a dataset without hints must fail
    loudly, not fall back silently."""
    from util_synthetic import make_blender_dataset

    make_blender_dataset(str(tmp_path), n_frames=3, height=16, width=16,
                         modes=("train",))
    _, _, cam = load_blender_dataset(str(tmp_path), "train")
    assert cam.near is None and cam.far is None


def test_training_step_runs_on_exported_dataset(tmp_path):
    """Smoke: the exported dataset drives the real trainer config path
    (sample_ray_batch + a jitted loss eval) without shape/dtype friction."""
    import jax
    import jax.numpy as jnp

    from sfm_nerf_tpu.ops.rays import sample_ray_batch

    scene = make_sfm_scene(n_cams=3, n_points=60)
    camera_info, points = _scene_as_sfm_result(scene)
    paths = _write_source_images(str(tmp_path), camera_info, 64, 48)
    export_nerf_dataset(
        camera_info, points, scene["K"], paths, str(tmp_path / "nerf"),
        width=64, height=48,
    )
    images, poses, cam = load_blender_dataset(str(tmp_path / "nerf"), "train")
    assert cam.near is not None and cam.far is not None
    o, d, rgb = sample_ray_batch(
        jax.random.key(0),
        jnp.asarray(images), jnp.asarray(poses),
        jnp.asarray(cam.camera_matrix), 128,
    )
    assert o.shape == (128, 3) and rgb.shape == (128, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5
    )
