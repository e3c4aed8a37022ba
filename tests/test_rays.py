"""Ray generation vs a numpy oracle of the reference's PixelToRay
(Phase2/train.py:68-102) and the on-device batcher's distribution."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.ops.rays import image_rays, pixel_to_ray, sample_ray_batch


def np_pixel_to_ray(K, pose, px, py):
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    d = np.stack([(px - cx) / fx, (py - cy) / fy, np.ones_like(px)], -1)
    d = d @ pose[:3, :3].T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(pose[:3, 3], d.shape)
    return o, d


def random_pose(rng):
    a = rng.normal(size=3) * 0.4
    from scipy.spatial.transform import Rotation

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rotation.from_rotvec(a).as_matrix()
    pose[:3, 3] = rng.normal(size=3) * 3
    return pose


def test_pixel_to_ray_matches_reference_convention(rng):
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
    pose = random_pose(rng)
    px = rng.integers(0, 320, 64).astype(np.float32)
    py = rng.integers(0, 240, 64).astype(np.float32)
    o_np, d_np = np_pixel_to_ray(K, pose, px, py)
    o, d = pixel_to_ray(jnp.asarray(K), jnp.asarray(pose),
                        jnp.asarray(px), jnp.asarray(py))
    np.testing.assert_allclose(np.asarray(o), o_np, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), d_np, atol=1e-5)
    # reference convention: NO -y/-z flip, unit norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6
    )


def test_image_rays_raster_order(rng):
    """y-major raster order matching the reference's `for y: for x:` loops."""
    K = np.array([[100.0, 0, 8], [0, 100.0, 6], [0, 0, 1]], np.float32)
    pose = random_pose(rng)
    o, d = image_rays(jnp.asarray(K), jnp.asarray(pose), 12, 16)
    assert o.shape == (12 * 16, 3)
    # ray (y=3, x=5) sits at index 3*16+5
    o1, d1 = pixel_to_ray(jnp.asarray(K), jnp.asarray(pose),
                          jnp.asarray(5.0), jnp.asarray(3.0))
    np.testing.assert_allclose(np.asarray(d)[3 * 16 + 5], np.asarray(d1),
                               atol=1e-6)


def test_sample_ray_batch_targets_match_pixels(rng):
    """Every sampled target rgb must equal images[img, py, px] for a pixel
    whose regenerated ray matches the returned one."""
    n_img, H, W = 3, 10, 14
    images = rng.uniform(0, 1, (n_img, H, W, 3)).astype(np.float32)
    poses = np.stack([random_pose(rng) for _ in range(n_img)])
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
    o, d, t = sample_ray_batch(
        jax.random.key(0), jnp.asarray(images), jnp.asarray(poses),
        jnp.asarray(K), 512,
    )
    o, d, t = np.asarray(o), np.asarray(d), np.asarray(t)
    # each target must appear in the image set (exact match)
    flat = images.reshape(-1, 3)
    for k in range(0, 512, 37):
        assert (np.abs(flat - t[k]).sum(-1) < 1e-6).any()
    # each origin equals one of the camera centers
    centers = poses[:, :3, 3]
    for k in range(0, 512, 37):
        assert (np.linalg.norm(centers - o[k], axis=-1) < 1e-5).any()
    # directions unit-norm
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_sample_ray_batch_covers_all_images():
    n_img, H, W = 4, 8, 8
    rng = np.random.default_rng(0)
    # distinct constant color per image -> target identifies the image
    images = np.zeros((n_img, H, W, 3), np.float32)
    for i in range(n_img):
        images[i] = (i + 1) / 10.0
    poses = np.tile(np.eye(4, dtype=np.float32), (n_img, 1, 1))
    K = np.array([[50.0, 0, 4], [0, 50.0, 4], [0, 0, 1]], np.float32)
    _, _, t = sample_ray_batch(
        jax.random.key(1), jnp.asarray(images), jnp.asarray(poses),
        jnp.asarray(K), 2000,
    )
    seen = set(np.round(np.asarray(t)[:, 0] * 10).astype(int))
    assert seen == {1, 2, 3, 4}
