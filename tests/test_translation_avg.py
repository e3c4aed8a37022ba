"""Translation averaging: exact on clean graphs, robust to noise/outliers,
and the full rotation+translation global init recovers a 50-camera rig."""

import numpy as np
import pytest

from sfm_nerf_tpu.ops.rotation_avg import rotation_averaging
from sfm_nerf_tpu.ops.translation_avg import (
    direction_residuals_deg,
    pair_direction_world,
    translation_averaging,
)


def random_rotations(rng, n):
    import cv2

    return np.stack([cv2.Rodrigues(rng.normal(0, 0.8, 3))[0]
                     for _ in range(n)])


def make_graph(rng, n_cams, extra_edges=2.0, spread=5.0):
    C = rng.uniform(-spread, spread, (n_cams, 3))
    C -= C[0]
    pairs = [(i, i + 1) for i in range(n_cams - 1)]
    n_extra = int(extra_edges * n_cams)
    while len(pairs) < n_cams - 1 + n_extra:
        i, j = rng.integers(0, n_cams, 2)
        if i != j:
            pairs.append((min(i, j), max(i, j)))
    pairs = np.asarray(sorted(set(pairs)))
    u = C[pairs[:, 1]] - C[pairs[:, 0]]
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    return C, pairs, u


def align(C_est, C_true):
    """Similarity-align estimated centers to truth (gauge removal)."""
    s = np.linalg.norm(C_true) / max(np.linalg.norm(C_est), 1e-12)
    return C_est * s


def test_exact_on_clean_directions():
    rng = np.random.default_rng(0)
    C, pairs, u = make_graph(rng, 12)
    C_est = align(translation_averaging(pairs, u, 12), C)
    np.testing.assert_allclose(C_est, C, atol=1e-8)


def test_noise_and_outlier_edges():
    rng = np.random.default_rng(1)
    C, pairs, u = make_graph(rng, 20, extra_edges=3.0)
    u_noisy = u + rng.normal(0, 0.01, u.shape)       # ~0.6 deg noise
    out = rng.choice(len(pairs), 4, replace=False)   # 4 gross outliers
    u_noisy[out] = rng.normal(size=(4, 3))
    u_noisy /= np.linalg.norm(u_noisy, axis=-1, keepdims=True)
    C_est = align(translation_averaging(pairs, u_noisy, 20, n_irls=8), C)
    err = np.linalg.norm(C_est - C, axis=-1)
    scene = np.linalg.norm(C, axis=-1).max()
    assert err.max() < 0.02 * scene, err.max() / scene
    res = direction_residuals_deg(pairs, u_noisy, C_est)
    assert np.median(np.delete(res, out)) < 1.5     # inlier edges fit
    assert res[out].min() > 10.0                    # outliers stick out


def test_underconstrained_raises():
    with pytest.raises(ValueError):
        translation_averaging([(0, 1)], np.ones((1, 3)), 5)


def test_global_init_recovers_50_camera_rig():
    """VERDICT item 7's done criterion: rotations + translations averaged
    over a 50-camera synthetic graph from noisy pairwise measurements, both
    within tight tolerance of ground truth."""
    rng = np.random.default_rng(7)
    n = 50
    Rs = random_rotations(rng, n)
    Rs = np.einsum("nij,jk->nik", Rs, Rs[0].T)       # gauge R_0 = I
    C, pairs, _ = make_graph(rng, n, extra_edges=4.0)

    import cv2

    R_rel, u_world = [], []
    for i, j in pairs:
        # measurement model: R_ij = R_j R_i^T with small angular noise;
        # direction of C_j - C_i expressed in camera i's frame, noisy
        dR = cv2.Rodrigues(rng.normal(0, np.radians(0.3), 3))[0]
        R_rel.append(dR @ Rs[j] @ Rs[i].T)
        c_rel = Rs[i] @ (C[j] - C[i])
        c_rel = c_rel / np.linalg.norm(c_rel)
        c_rel += rng.normal(0, 0.005, 3)
        u_world.append(pair_direction_world(Rs[i], c_rel))

    R_est = np.asarray(rotation_averaging(pairs, np.stack(R_rel), n))
    ang = []
    for k in range(n):
        cosang = (np.trace(R_est[k] @ Rs[k].T) - 1) / 2
        ang.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
    assert np.mean(ang) < 0.5, f"rotation avg mean err {np.mean(ang):.2f} deg"

    C_est = align(translation_averaging(pairs, np.stack(u_world), n), C)
    err = np.linalg.norm(C_est - C, axis=-1)
    scene = np.linalg.norm(C, axis=-1).max()
    assert err.mean() < 0.01 * scene, err.mean() / scene


def test_global_init_recovers_200_camera_ring():
    """The 200-camera bench's pose-graph shape — a ring with window-7
    edges (wrap-around loop closures included) — through BOTH averagers:
    drift cannot accumulate along the chain because every edge is solved
    jointly (VERDICT r3 next #2 at the scale it names)."""
    rng = np.random.default_rng(11)
    n = 200
    import cv2

    # ring rig like tests/util_synthetic.write_reference_format_dataset
    th = 2 * np.pi * np.arange(n) / n
    C = np.stack([6 * np.cos(th), 0.4 * np.sin(3 * th), 6 * np.sin(th)], -1)
    C -= C[0]
    Rs = random_rotations(rng, n)
    Rs = np.einsum("nij,jk->nik", Rs, Rs[0].T)
    pairs = sorted(set(
        (min(i, (i + d) % n), max(i, (i + d) % n))
        for i in range(n) for d in range(1, 8)))
    R_rel, u_world = [], []
    for i, j in pairs:
        dR = cv2.Rodrigues(rng.normal(0, np.radians(0.3), 3))[0]
        R_rel.append(dR @ Rs[j] @ Rs[i].T)
        c_rel = Rs[i] @ (C[j] - C[i])
        c_rel = c_rel / np.linalg.norm(c_rel)
        c_rel += rng.normal(0, 0.005, 3)
        u_world.append(pair_direction_world(Rs[i], c_rel))

    R_est = np.asarray(rotation_averaging(pairs, np.stack(R_rel), n))
    ang = []
    for k in range(n):
        cosang = (np.trace(R_est[k] @ Rs[k].T) - 1) / 2
        ang.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
    assert np.mean(ang) < 0.5, f"rotation avg mean err {np.mean(ang):.2f}"

    C_est = align(translation_averaging(pairs, np.stack(u_world), n), C)
    err = np.linalg.norm(C_est - C, axis=-1)
    scene = np.linalg.norm(C, axis=-1).max()
    # a 0.005-noise direction chain 100 deep would drift to several
    # percent of the scene; the joint solve stays sub-percent
    assert err.mean() < 0.01 * scene, err.mean() / scene
