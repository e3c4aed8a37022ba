"""Stewenius 5-point essential solver: exact recovery, constraint
satisfaction, and RANSAC robustness under noise + outliers."""

import numpy as np
import pytest

from sfm_nerf_tpu.ops.essential5 import (
    five_point_essential,
    ransac_essential_5pt,
)


def make_scene(rng, n, noise=0.0, n_out=0, K=None):
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
    Xc2 = X @ R.T + t
    if K is None:
        p1 = X[:, :2] / X[:, 2:]
        p2 = Xc2[:, :2] / Xc2[:, 2:]
    else:
        p1 = (X @ K.T)
        p1 = p1[:, :2] / p1[:, 2:]
        p2 = (Xc2 @ K.T)
        p2 = p2[:, :2] / p2[:, 2:]
    p1 = p1 + noise * rng.normal(size=p1.shape)
    p2 = p2 + noise * rng.normal(size=p2.shape)
    if n_out:
        p2[:n_out] = rng.uniform(p2.min(), p2.max(), (n_out, 2))
    tx = np.array([
        [0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0],
    ])
    E = tx @ R
    return p1, p2, E / np.linalg.norm(E)


def e_dist(E, E_true):
    return min(np.abs(E - E_true).max(), np.abs(E + E_true).max())


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_minimal_exact_recovery(seed):
    rng = np.random.default_rng(seed)
    x1, x2, E_true = make_scene(rng, 5)
    cands = five_point_essential(x1[None], x2[None])[0]
    ok = np.isfinite(cands[:, 0, 0])
    assert ok.sum() >= 1
    # every candidate satisfies the essential constraints to fp precision
    for E in cands[ok]:
        assert abs(np.linalg.det(E)) < 1e-10
        tc = 2 * E @ E.T @ E - np.trace(E @ E.T) * E
        assert np.abs(tc).max() < 1e-9
        # and the 5 epipolar constraints
        h1 = np.concatenate([x1, np.ones((5, 1))], 1)
        h2 = np.concatenate([x2, np.ones((5, 1))], 1)
        assert np.abs(np.einsum("ni,ij,nj->n", h2, E, h1)).max() < 1e-9
    # the true E is among the candidates
    assert min(e_dist(E, E_true) for E in cands[ok]) < 1e-8


def test_batched_shapes():
    rng = np.random.default_rng(7)
    scenes = [make_scene(rng, 5) for _ in range(4)]
    x1 = np.stack([s[0] for s in scenes])
    x2 = np.stack([s[1] for s in scenes])
    cands = five_point_essential(x1, x2)
    assert cands.shape == (4, 10, 3, 3)
    for b, (_, _, E_true) in enumerate(scenes):
        ok = np.isfinite(cands[b, :, 0, 0])
        assert min(e_dist(E, E_true) for E in cands[b][ok]) < 1e-8


def test_ransac_noise_and_outliers():
    rng = np.random.default_rng(1)
    K = np.array([[530.0, 0, 320], [0, 530.0, 240], [0, 0, 1]])
    p1, p2, E_true = make_scene(rng, 500, noise=0.5, n_out=200, K=K)
    E, inl = ransac_essential_5pt(
        p1, p2, K, n_iters=300, threshold_px=2.0, seed=0)
    assert e_dist(E, E_true) < 0.05
    assert inl[200:].mean() > 0.97           # true-inlier recall
    assert inl[:200].mean() < 0.05           # outlier leakage


def test_degenerate_sample_gives_nans_not_crash():
    # 5 identical correspondences: no unique solution; must not raise
    x1 = np.zeros((1, 5, 2))
    x2 = np.zeros((1, 5, 2))
    cands = five_point_essential(x1, x2)
    assert cands.shape == (1, 10, 3, 3)


def test_pipeline_5pt_option(tmp_path):
    """The two-view stage accepts essential_method='5pt' end-to-end on the
    bundled dataset and reaches the same error regime as from_f."""
    import os
    if not os.path.isdir("/root/reference/Phase1/Data"):
        pytest.skip("reference data unavailable")
    import dataclasses
    import jax

    from sfm_nerf_tpu.config import SfMConfig
    from sfm_nerf_tpu.sfm import SfMPipeline
    from sfm_nerf_tpu.io.sfm_data import (
        load_calibration, parse_matching_files,
    )

    cfg = SfMConfig(
        data_path="/root/reference/Phase1/Data",
        essential_method="5pt", e5_ransac_iters=300,
        ransac_iters=2000, output_dir=str(tmp_path),
    )
    pipe = SfMPipeline(cfg)
    K = load_calibration(f"{cfg.data_path}/calibration.txt")
    matches, tracks, vis = parse_matching_files(cfg.data_path, 5)
    refined, tracks, vis = pipe.refine_all_matches(matches, tracks, vis)
    F12, m12 = refined[(1, 2)]
    tv = pipe.two_view_reconstruct(
        K, F12, np.eye(3), np.zeros(3), m12[:, 0:2], m12[:, 2:4])
    assert tv.mean_error_nonlinear < 3.0
