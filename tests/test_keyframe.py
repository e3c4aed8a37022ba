"""Keyframe / view-selection tests (ADDITION vs the reference, which
hardcodes initial pair (1,2) and strict index registration order,
Phase1/Wrapper.py:666,679):

- --init_pair auto must prefer a well-conditioned (wide-parallax) pair over
  a higher-inlier but near-degenerate (tiny-baseline) one;
- --view_order greedy must register views whose 2D-3D support only exists
  AFTER later cameras are mapped — views index order visits too early and
  then never retries.
"""

import os

import numpy as np


def _arc_cameras(n_cams, baseline_scale=1.0):
    """Cameras on a yaw arc looking roughly at a point cloud in front."""
    Rs, Cs = [], []
    for i in range(n_cams):
        angle = 0.12 * (i - (n_cams - 1) / 2)
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        C = baseline_scale * np.array(
            [1.5 * np.sin(2 * angle), 0.05 * i, -0.3 * i]
        )
        Rs.append(R)
        Cs.append(C)
    return np.stack(Rs), np.stack(Cs)


K_TEST = np.array([[800.0, 0, 400.0], [0, 800.0, 300.0], [0, 0, 1.0]])


def _project(K, R, C, X):
    x = (K @ R @ (X - C).T).T
    return x[:, :2] / x[:, 2:3]


def _write_groups_dataset(out_dir, groups, n_per_group=120, noise=0.25,
                          seed=0, n_cams=5):
    """Reference-format dataset where each feature group is co-observed by
    exactly the given member images (first member owns the matching row)."""
    import cv2

    rng = np.random.default_rng(seed)
    Rs, Cs = _arc_cameras(n_cams)
    lines = {i: [] for i in range(1, n_cams + 1)}
    for members in groups:
        members = sorted(members)
        X = rng.uniform([-1.5, -1.5, 4.0], [1.5, 1.5, 8.0], (n_per_group, 3))
        uv = {
            m: _project(K_TEST, Rs[m - 1], Cs[m - 1], X)
            + rng.normal(0, noise, (n_per_group, 2))
            for m in members
        }
        first, rest = members[0], members[1:]
        for p in range(n_per_group):
            toks = [str(len(members)), "128", "128", "128",
                    f"{uv[first][p, 0]:.4f}", f"{uv[first][p, 1]:.4f}"]
            for j in rest:
                toks += [str(j), f"{uv[j][p, 0]:.4f}", f"{uv[j][p, 1]:.4f}"]
            lines[first].append(" ".join(toks))
    with open(os.path.join(out_dir, "calibration.txt"), "w") as f:
        for row in K_TEST:
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
    img = np.full((600, 800, 3), 128, np.uint8)
    for i in range(1, n_cams + 1):
        cv2.imwrite(os.path.join(out_dir, f"{i}.png"), img)
        with open(os.path.join(out_dir, f"matching{i}.txt"), "w") as f:
            f.write(f"nFeatures: {len(lines[i])}\n")
            if lines[i]:
                f.write("\n".join(lines[i]) + "\n")
    return out_dir


def test_auto_init_pair_prefers_parallax(tmp_path):
    """A 300-inlier near-zero-baseline pair must LOSE to a 150-inlier
    wide-baseline pair: degenerate two-view geometry triangulates garbage
    depth no matter how many inliers vouch for it."""
    import jax
    import jax.numpy as jnp

    from sfm_nerf_tpu.config import SfMConfig
    from sfm_nerf_tpu.ops.epipolar import ransac_fundamental_bucketed
    from sfm_nerf_tpu.sfm import SfMPipeline

    rng = np.random.default_rng(0)
    X = rng.uniform([-1.5, -1.5, 4.0], [1.5, 1.5, 8.0], (300, 3))
    R1, C1 = np.eye(3), np.zeros(3)
    # camera 2: almost coincident with camera 1 (baseline 2e-3)
    R2, C2 = np.eye(3), np.array([2e-3, 0.0, 0.0])
    # camera 3: wide baseline
    ang = 0.25
    R3 = np.array([[np.cos(ang), 0, -np.sin(ang)], [0, 1, 0],
                   [np.sin(ang), 0, np.cos(ang)]])
    C3 = np.array([1.2, 0.1, -0.2])

    def matches(Ra, Ca, Rb, Cb, n):
        pa = _project(K_TEST, Ra, Ca, X[:n]) + rng.normal(0, 0.2, (n, 2))
        pb = _project(K_TEST, Rb, Cb, X[:n]) + rng.normal(0, 0.2, (n, 2))
        return np.hstack([pa, pb, np.arange(n)[:, None].astype(float)])

    key = jax.random.key(0)
    refined = {}
    for pair, (Ra, Ca, Rb, Cb, n) in {
        (1, 2): (R1, C1, R2, C2, 300),
        (1, 3): (R1, C1, R3, C3, 150),
    }.items():
        m = matches(Ra, Ca, Rb, Cb, n)
        key, sub = jax.random.split(key)
        res = ransac_fundamental_bucketed(
            sub, m[:, 0:2], m[:, 2:4], n_iters=600, threshold=5e-4,
        )
        refined[pair] = (np.asarray(res.F), m[np.asarray(res.inliers)])

    pipe = SfMPipeline(SfMConfig(init_pair="auto"))
    assert pipe._select_init_pair(refined, K_TEST) == (1, 3)
    scores = pipe.stats["init_pair"]["scores"]
    assert scores.get("1_2", 0.0) < scores["1_3"]


def test_greedy_view_order_registers_skipped_views(tmp_path):
    """Dependency chain 1,2 -> 5 -> 3 -> 4: views 3 and 4 have no support
    until later cameras are mapped.  Index order (reference) visits them
    too early and ends with {1,2,5}; greedy next-best-view registers all 5.
    """
    from sfm_nerf_tpu.config import SfMConfig
    from sfm_nerf_tpu.sfm import SfMPipeline

    data = str(tmp_path / "data")
    os.makedirs(data)
    # group -> triangulated via (first, other) pairs once both registered:
    #   {1,2}:     init pair support
    #   {1,2,5}:   mapped at init -> registers 5
    #   {2,3,5}:   mapped via pair (2,5) after 5 -> registers 3
    #   {1,3,5}:   mapped via pair (1,5) after 5 -> more support for 3
    #   {3,4,5}:   mapped via pair (3,5) after 3 -> registers 4
    _write_groups_dataset(
        data,
        groups=[(1, 2), (1, 2, 5), (2, 3, 5), (1, 3, 5), (3, 4, 5)],
        n_per_group=120,
    )
    # registration_retries=0: this test pins the SINGLE-SWEEP contrast
    # between index and greedy order; with retries the index sweep's
    # extra passes also register 3 and 4 (tested separately in
    # test_sfm_pipeline.py), which would erase the negative control here
    base = dict(
        data_path=data, num_images=5, ransac_iters=800, pnp_iters=800,
        ba_max_iters=20, seed=0, registration_retries=0,
    )
    out_idx = str(tmp_path / "idx")
    os.makedirs(out_idx)
    r_index = SfMPipeline(
        SfMConfig(view_order="index", output_dir=out_idx, **base)
    ).run()
    assert sorted(r_index["camera_info"]) == [1, 2, 5]

    out_greedy = str(tmp_path / "greedy")
    os.makedirs(out_greedy)
    r_greedy = SfMPipeline(
        SfMConfig(view_order="greedy", output_dir=out_greedy, **base)
    ).run()
    assert sorted(r_greedy["camera_info"]) == [1, 2, 3, 4, 5]
    assert r_greedy["stats"]["ba"]["final_err_px"]["median"] < 1.0
