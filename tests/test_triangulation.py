"""Triangulation ops against ground truth and an OpenCV oracle."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.ops.triangulation import (
    cheirality_counts,
    projection_matrix_RC,
    projection_matrix_RT,
    project,
    reprojection_errors,
    triangulate_linear,
    triangulate_nonlinear,
)

from util_synthetic import make_sfm_scene


def two_cam_setup(noise=0.0, seed=0, n=150):
    scene = make_sfm_scene(n_cams=2, n_points=n, noise_px=noise, seed=seed)
    K = scene["K"]
    R1, C1 = scene["Rs"][0], scene["Cs"][0]
    R2, C2 = scene["Rs"][1], scene["Cs"][1]
    T1, T2 = -R1 @ C1, -R2 @ C2
    return scene, K, (R1, T1, C1), (R2, T2, C2)


def test_linear_triangulation_exact_recovers_points():
    scene, K, (R1, T1, _), (R2, T2, _) = two_cam_setup()
    X = triangulate_linear(
        jnp.asarray(K),
        jnp.asarray(R1), jnp.asarray(T1),
        jnp.asarray(R2), jnp.asarray(T2),
        jnp.asarray(scene["obs"][0]), jnp.asarray(scene["obs"][1]),
    )
    np.testing.assert_allclose(np.asarray(X), scene["points"], rtol=1e-6, atol=1e-6)


def test_linear_triangulation_matches_opencv():
    scene, K, (R1, T1, _), (R2, T2, _) = two_cam_setup(noise=0.5)
    P1 = K @ np.hstack([R1, T1[:, None]])
    P2 = K @ np.hstack([R2, T2[:, None]])
    X_cv = cv2.triangulatePoints(
        P1, P2, scene["obs"][0].T, scene["obs"][1].T
    )
    X_cv = (X_cv[:3] / X_cv[3]).T
    X = np.asarray(triangulate_linear(
        jnp.asarray(K),
        jnp.asarray(R1), jnp.asarray(T1),
        jnp.asarray(R2), jnp.asarray(T2),
        jnp.asarray(scene["obs"][0]), jnp.asarray(scene["obs"][1]),
    ))
    # same minimization family, different row weighting (cv2 normalizes
    # rows differently): estimates agree to well under the noise scale
    err = np.linalg.norm(X - X_cv, axis=1)
    assert np.median(err) < 0.2, np.median(err)
    # and both reproject comparably
    P2j = K @ np.hstack([R2, T2[:, None]])
    for Xe in (X, X_cv):
        proj = (P2j @ np.hstack([Xe, np.ones((len(Xe), 1))]).T).T
        proj = proj[:, :2] / proj[:, 2:3]
        assert np.median(np.linalg.norm(proj - scene["obs"][1], axis=1)) < 1.0


def test_cheirality_picks_true_pose():
    scene, K, (R1, T1, C1), (R2, T2, C2) = two_cam_setup()
    # candidates: true pose + 3 perturbed/behind variants
    flip = np.diag([1.0, -1.0, -1.0])
    Cs = np.stack([C2, -C2, C2, -C2])
    Rs = np.stack([R2, R2, flip @ R2, flip @ R2])
    pts = []
    for C, R in zip(Cs, Rs):
        T = -R @ C
        pts.append(np.asarray(triangulate_linear(
            jnp.asarray(K), jnp.asarray(R1), jnp.asarray(T1),
            jnp.asarray(R), jnp.asarray(T),
            jnp.asarray(scene["obs"][0]), jnp.asarray(scene["obs"][1]),
        )))
    counts = np.asarray(cheirality_counts(
        jnp.asarray(np.stack(pts)), jnp.asarray(Cs), jnp.asarray(Rs)
    ))
    assert counts.argmax() == 0
    assert counts[0] == len(scene["points"])


def test_nonlinear_triangulation_improves_noisy_init():
    scene, K, (R1, T1, C1), (R2, T2, C2) = two_cam_setup(noise=0.0)
    rng = np.random.default_rng(3)
    X0 = scene["points"] + rng.normal(0, 0.05, scene["points"].shape)
    X_opt, e0, e1 = triangulate_nonlinear(
        jnp.asarray(K),
        jnp.asarray(R1), jnp.asarray(C1),
        jnp.asarray(R2), jnp.asarray(C2),
        jnp.asarray(scene["obs"][0]), jnp.asarray(scene["obs"][1]),
        jnp.asarray(X0), n_iters=20,
    )
    assert float(jnp.mean(e1)) < 1e-8          # exact data -> exact fit
    assert float(jnp.mean(e1)) < float(jnp.mean(e0)) * 1e-3
    np.testing.assert_allclose(np.asarray(X_opt), scene["points"], atol=1e-3)


def test_projection_conventions_agree():
    """P = K[R|T] with T=-RC must equal P = K R [I|-C]."""
    _, K, (R1, T1, C1), _ = two_cam_setup()
    P_rt = np.asarray(projection_matrix_RT(
        jnp.asarray(K), jnp.asarray(R1), jnp.asarray(T1)))
    P_rc = np.asarray(projection_matrix_RC(
        jnp.asarray(K), jnp.asarray(R1), jnp.asarray(C1)))
    np.testing.assert_allclose(P_rt, P_rc, rtol=1e-10, atol=1e-8)


def test_reprojection_errors_zero_for_truth():
    scene, K, _, (R2, T2, C2) = two_cam_setup()
    e = np.asarray(reprojection_errors(
        jnp.asarray(K), jnp.asarray(R2), jnp.asarray(C2),
        jnp.asarray(scene["points"]), jnp.asarray(scene["obs"][1])))
    assert e.max() < 1e-12


def test_disambiguate_pose_non_identity_camera1():
    """The cheirality vote must test camera-1 depth in CAMERA 1's frame:
    with a strongly rotated registered camera 1, the old world-z test
    scored the true candidate 0 and picked a mirrored pose."""
    from sfm_nerf_tpu.ops.triangulation import disambiguate_pose

    rng = np.random.default_rng(5)
    # camera 1 rotated ~150 deg about x, positioned so the scene is in
    # FRONT of it but at NEGATIVE world z
    th = np.radians(150.0)
    c, s = np.cos(th), np.sin(th)
    R1 = np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])
    C1 = np.array([0.0, 0.0, 0.0])
    # points along camera 1's optical axis (R1's third row direction)
    depth = rng.uniform(4.0, 8.0, (120, 1))
    lateral = rng.uniform(-1.0, 1.0, (120, 2))
    X = C1 + depth * R1[2] + lateral[:, :1] * R1[0] + lateral[:, 1:] * R1[1]
    assert (X[:, 2] < 0).all()      # world-z test would reject every point
    # camera 2: small baseline along camera 1's x axis, same orientation
    C2 = C1 + 0.8 * R1[0]
    R2 = R1.copy()
    K = np.array([[800.0, 0, 400.0], [0, 800.0, 300.0], [0, 0, 1.0]])

    def proj(R, C):
        P = K @ R @ np.hstack([np.eye(3), -C[:, None]])
        x = (P @ np.hstack([X, np.ones((len(X), 1))]).T).T
        return x[:, :2] / x[:, 2:3]

    pts1, pts2 = proj(R1, C1), proj(R2, C2)
    flip = np.diag([1.0, -1.0, -1.0])
    # candidates in camera-1-relative convention (as decompose_essential
    # yields): C_rel, R_rel with world C = C1 + R1^T C_rel, R = R_rel R1
    C_rel = R1 @ (C2 - C1)
    R_rel = R2 @ R1.T
    Cs_world = np.stack([
        C1 + R1.T @ C_rel, C1 - R1.T @ C_rel,
        C1 + R1.T @ C_rel, C1 - R1.T @ C_rel,
    ])
    Rs_world = np.stack([R_rel @ R1, R_rel @ R1,
                         flip @ R_rel @ R1, flip @ R_rel @ R1])
    T1 = -R1 @ C1
    Xw, Cw, Rw, _, best = disambiguate_pose(
        jnp.asarray(K), jnp.asarray(Cs_world), jnp.asarray(Rs_world),
        jnp.asarray(pts1), jnp.asarray(pts2),
        R1=jnp.asarray(R1), T1=jnp.asarray(T1),
    )
    assert int(best) == 0
    np.testing.assert_allclose(np.asarray(Cw), C2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Xw), X, atol=1e-4)


# --------------------------------------------------------------------------
# midpoint init + best-of-two refinement (the f32 DLT-divergence rescue)

def _ring_pair(gap, n=2000, n_cams=200, noise=0.5, seed=0):
    """The 200-camera ring geometry of the scale benches (bench_sfm.py
    --pipeline dataset): this is the configuration where the f32 DLT init
    measurably sends the LM refinement to |X| ~ 1e6 for a handful of
    points per pair."""
    rng = np.random.default_rng(seed)
    w, h = 800, 600
    f = 0.9 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    pts = rng.uniform(-1.5, 1.5, (n, 3))

    def cam(i):
        th = 2 * np.pi * i / n_cams
        C = np.array([6 * np.cos(th), 0.4 * np.sin(3 * th), 6 * np.sin(th)])
        fwd = -C / np.linalg.norm(C)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        return np.stack([right, np.cross(fwd, right), fwd]), C

    def proj(R, C, X):
        xc = (X - C) @ R.T
        return np.stack([f * xc[:, 0] / xc[:, 2] + w / 2,
                         f * xc[:, 1] / xc[:, 2] + h / 2], 1)

    R1, C1 = cam(0)
    R2, C2 = cam(gap)
    p1 = proj(R1, C1, pts) + rng.normal(0, noise, (n, 2))
    p2 = proj(R2, C2, pts) + rng.normal(0, noise, (n, 2))
    return K, (R1, C1), (R2, C2), p1, p2, pts


def test_midpoint_triangulation_exact():
    from sfm_nerf_tpu.ops.triangulation import triangulate_midpoint

    K, (R1, C1), (R2, C2), p1, p2, pts = _ring_pair(gap=7, n=300, noise=0.0)
    X = np.asarray(triangulate_midpoint(
        jnp.asarray(K), jnp.asarray(R1), jnp.asarray(C1),
        jnp.asarray(R2), jnp.asarray(C2), jnp.asarray(p1), jnp.asarray(p2)))
    np.testing.assert_allclose(X, pts, atol=1e-6)


def test_pair_bucketed_rescues_f32_dlt_divergence():
    """f32, 1.8-degree ray angle (ring neighbors): LM from the DLT init
    diverges to |X| ~ 1e6 for some points; triangulate_pair_bucketed's
    best-of-two (DLT + ray midpoint) refinement must stay finite and
    accurate for EVERY point."""
    from sfm_nerf_tpu.ops.triangulation import (
        triangulate_midpoint, triangulate_pair_bucketed)

    K, (R1, C1), (R2, C2), p1, p2, pts = _ring_pair(gap=1)
    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
    # pin that the scenario actually exercises the failure: DLT-init-only
    # refinement diverges (else the rescue assertion below proves nothing)
    T1, T2 = -R1 @ C1, -R2 @ C2
    X_lin = triangulate_linear(
        f32(K), f32(R1), f32(T1), f32(R2), f32(T2), f32(p1), f32(p2))
    X_dlt, _, _ = triangulate_nonlinear(
        f32(K), f32(R1), f32(C1), f32(R2), f32(C2), f32(p1), f32(p2), X_lin)
    err_dlt = np.linalg.norm(np.asarray(X_dlt) - pts, axis=1)
    assert err_dlt.max() > 100.0, "scenario no longer reproduces divergence"

    _, X_opt = triangulate_pair_bucketed(
        np.float32(1) * K, np.asarray(R1, np.float32),
        np.asarray(C1, np.float32), np.asarray(R2, np.float32),
        np.asarray(C2, np.float32),
        np.asarray(p1, np.float32), np.asarray(p2, np.float32))
    err = np.linalg.norm(X_opt - pts, axis=1)
    assert np.isfinite(X_opt).all()
    assert err.max() < 1.0, f"rescued refinement still diverges: {err.max()}"
    # and the midpoint init alone is already accurate here (median level)
    X_mid = np.asarray(triangulate_midpoint(
        f32(K), f32(R1), f32(C1), f32(R2), f32(C2), f32(p1), f32(p2)))
    assert np.median(np.linalg.norm(X_mid - pts, axis=1)) < 0.2


def test_tri_reproj_gate_blocks_inconsistent_points():
    """_triangulate_feature_groups must keep a feature OUT of the map when
    its refined point cannot reproject into its own source views (solver
    junk / inconsistent observations), and map it when consistent."""
    from sfm_nerf_tpu.config import SfMConfig
    from sfm_nerf_tpu.sfm.pipeline import SfMPipeline

    K, (R1, C1), (R2, C2), p1, p2, pts = _ring_pair(gap=4, n=64, noise=0.0)
    # feature 1: consistent; feature 0: second view shifted 80 px -> the
    # 4-residual optimum leaves ~tens of px in each view
    p2_bad = p2.copy()
    p2_bad[0] += np.array([80.0, -60.0])
    pipe = SfMPipeline.__new__(SfMPipeline)
    tracks = [
        {1: np.array([*p1[f], 0.0]), 2: np.array([*p2_bad[f], 0.0])}
        for f in range(2)
    ]
    camera_info = {1: {"R": R1, "C": C1}, 2: {"R": R2, "C": C2}}
    groups = {(1, 2): [0, 1]}
    for gate, expected in ((10.0, {1}), (0.0, {0, 1})):
        pipe.cfg = SfMConfig(tri_reproj_gate_px=gate)
        fidx_to_3d = {}
        pipe._triangulate_feature_groups(
            K, camera_info, tracks, groups, fidx_to_3d)
        assert set(fidx_to_3d) == expected, (gate, set(fidx_to_3d))
    np.testing.assert_allclose(fidx_to_3d[1], pts[1], atol=1e-5)


def test_relative_pose_pairs_matches_loop():
    """The pair-axis batched pose-graph path (ops.relative_pose_pairs —
    one dispatch per chunk) must agree with the per-pair loop it replaced
    (essential_from_fundamental -> cleanup -> decompose 'hz' ->
    n_valid-masked disambiguate_pose), including bucket padding and a
    padded pair row, and must recover the ground-truth relative pose."""
    import jax.numpy as jnp

    from sfm_nerf_tpu.ops.epipolar import (
        cleanup_essential,
        decompose_essential,
        essential_from_fundamental,
    )
    from sfm_nerf_tpu.ops.triangulation import (
        disambiguate_pose,
        relative_pose_pairs,
    )
    from sfm_nerf_tpu.utils.buckets import pow2_bucket

    gaps = [3, 5, 7]
    counts = [600, 900, 1200]          # distinct true counts, one bucket
    K = None
    Fs, p1s, p2s, gts = [], [], [], []
    for gap, n in zip(gaps, counts):
        K, (R1, C1), (R2, C2), p1, p2, _ = _ring_pair(
            gap=gap, n=n, noise=0.3, seed=gap)
        # ground-truth F from the two projections (cam1 at origin frame):
        # relative pose (R_rel, C_rel) with camera 1 as the world
        R_rel = R2 @ R1.T
        C_rel = R1 @ (C2 - C1)
        t = -R_rel @ C_rel
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]])
        Kinv = np.linalg.inv(K)
        F = Kinv.T @ (tx @ R_rel) @ Kinv
        Fs.append(F / np.linalg.norm(F))
        p1s.append(p1)
        p2s.append(p2)
        gts.append((R_rel, C_rel / np.linalg.norm(C_rel)))

    bucket = pow2_bucket(max(counts))
    Kj = jnp.asarray(K)
    # per-pair reference loop (the pipeline's legacy path)
    loop_C, loop_R = [], []
    for F, p1, p2 in zip(Fs, p1s, p2s):
        E = cleanup_essential(essential_from_fundamental(Kj, jnp.asarray(F)))
        Cs, Rs = decompose_essential(E, "hz")
        pb1 = np.resize(p1, (bucket, 2))
        pb2 = np.resize(p2, (bucket, 2))
        _, C, R, _, _ = disambiguate_pose(
            Kj, Cs, Rs, jnp.asarray(pb1), jnp.asarray(pb2),
            n_valid=jnp.asarray(len(p1), jnp.int32))
        loop_C.append(np.asarray(C))
        loop_R.append(np.asarray(R))

    # batched path, padded with a repeat of row 0 (as the pipeline pads)
    P = 4
    Fb = np.stack(Fs + [Fs[0]])
    pb1 = np.stack([np.resize(p, (bucket, 2)) for p in p1s]
                   + [np.resize(p1s[0], (bucket, 2))])
    pb2 = np.stack([np.resize(p, (bucket, 2)) for p in p2s]
                   + [np.resize(p2s[0], (bucket, 2))])
    nv = np.asarray(counts + [counts[0]], np.int32)
    C_b, R_b = relative_pose_pairs(
        Kj, jnp.asarray(Fb), jnp.asarray(pb1), jnp.asarray(pb2),
        jnp.asarray(nv), cleanup=True)
    C_b, R_b = np.asarray(C_b), np.asarray(R_b)
    assert C_b.shape == (P, 3) and R_b.shape == (P, 3, 3)
    for n in range(3):
        np.testing.assert_allclose(C_b[n], loop_C[n], atol=1e-8)
        np.testing.assert_allclose(R_b[n], loop_R[n], atol=1e-8)
        # and both recover the ground truth (sign-fixed unit center)
        R_gt, u_gt = gts[n]
        assert np.degrees(np.arccos(np.clip(
            (np.trace(R_b[n] @ R_gt.T) - 1) / 2, -1, 1))) < 0.2
        u = C_b[n] / np.linalg.norm(C_b[n])
        assert min(np.linalg.norm(u - u_gt), np.linalg.norm(u + u_gt)) < 5e-3
