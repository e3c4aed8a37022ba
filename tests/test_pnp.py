"""PnP ops against ground truth and OpenCV solvePnP oracle."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.ops.pnp import (
    linear_pnp,
    nonlinear_pnp,
    pnp_ransac,
    reprojection_error_mean_px,
)

from util_synthetic import make_sfm_scene


def cam_setup(noise=0.0, seed=0, n=200):
    scene = make_sfm_scene(n_cams=2, n_points=n, noise_px=noise, seed=seed)
    K = scene["K"]
    R, C = scene["Rs"][1], scene["Cs"][1]
    return scene["points"], scene["obs"][1], K, R, C


def test_linear_pnp_exact():
    X, x, K, R_true, C_true = cam_setup()
    C, R = linear_pnp(jnp.asarray(X), jnp.asarray(x), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-6)
    np.testing.assert_allclose(np.asarray(C), C_true, atol=1e-5)


def test_linear_pnp_noisy_close_to_opencv():
    X, x, K, R_true, C_true = cam_setup(noise=1.0)
    C, R = linear_pnp(jnp.asarray(X), jnp.asarray(x), jnp.asarray(K))
    ok, rvec, tvec = cv2.solvePnP(
        X.astype(np.float64), x.astype(np.float64), K, None,
        flags=cv2.SOLVEPNP_ITERATIVE,
    )
    R_cv, _ = cv2.Rodrigues(rvec)
    C_cv = (-R_cv.T @ tvec).ravel()
    assert np.linalg.norm(np.asarray(R) - R_cv) < 0.05
    assert np.linalg.norm(np.asarray(C) - C_cv) < 0.2


def test_pnp_ransac_with_outliers():
    X, x, K, R_true, C_true = cam_setup(noise=0.5)
    rng = np.random.default_rng(1)
    x_corrupt = x.copy()
    out_idx = rng.choice(len(x), 60, replace=False)
    x_corrupt[out_idx] += rng.uniform(-60, 60, (60, 2))
    res = pnp_ransac(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(x_corrupt),
        jnp.asarray(K), n_iters=2000, threshold=10.0, chunk=256,
    )
    # recovered pose close to truth
    assert np.linalg.norm(np.asarray(res.R) - R_true) < 0.05
    assert np.linalg.norm(np.asarray(res.C) - C_true) < 0.3
    found = np.asarray(res.inliers)
    true_mask = np.ones(len(x), bool)
    true_mask[out_idx] = False
    precision = (found & true_mask).sum() / max(found.sum(), 1)
    assert precision > 0.9


def test_nonlinear_pnp_refines():
    X, x, K, R_true, C_true = cam_setup(noise=0.0)
    # perturb the pose, refinement must pull it back
    dR, _ = cv2.Rodrigues(np.array([0.02, -0.015, 0.01]))
    R0 = dR @ R_true
    C0 = C_true + np.array([0.05, -0.04, 0.08])
    e_before = float(reprojection_error_mean_px(
        jnp.asarray(K), jnp.asarray(R0), jnp.asarray(C0),
        jnp.asarray(X), jnp.asarray(x)))
    C_opt, R_opt, rms = nonlinear_pnp(
        jnp.asarray(K), jnp.asarray(R0), jnp.asarray(C0),
        jnp.asarray(X), jnp.asarray(x), n_iters=50,
    )
    e_after = float(reprojection_error_mean_px(
        jnp.asarray(K), R_opt, C_opt, jnp.asarray(X), jnp.asarray(x)))
    assert e_before > 1.0
    assert e_after < 1e-4, (e_before, e_after)
    np.testing.assert_allclose(np.asarray(R_opt), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(C_opt), C_true, atol=1e-4)
    assert float(rms) < 1e-4


def test_nonlinear_pnp_respects_weights():
    X, x, K, R_true, C_true = cam_setup(noise=0.0)
    x_corrupt = x.copy()
    x_corrupt[:30] += 50.0           # gross outliers, masked out
    w = np.ones(len(x)); w[:30] = 0.0
    dR, _ = cv2.Rodrigues(np.array([0.01, 0.01, -0.01]))
    C_opt, R_opt, rms = nonlinear_pnp(
        jnp.asarray(K), jnp.asarray(dR @ R_true), jnp.asarray(C_true + 0.05),
        jnp.asarray(X), jnp.asarray(x_corrupt), weights=jnp.asarray(w),
        n_iters=50,
    )
    np.testing.assert_allclose(np.asarray(R_opt), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(C_opt), C_true, atol=1e-4)


def test_pnp_ransac_bucketed_matches_unbucketed():
    """Padding + n_valid must be bit-identical to the unpadded call (same
    RNG draws because maxval is the true count either way)."""
    from sfm_nerf_tpu.ops.pnp import pnp_ransac_bucketed

    X, x, K, R_true, C_true = cam_setup(noise=1.0, n=100)
    key = jax.random.key(5)
    res_a = pnp_ransac(
        key, jnp.asarray(X), jnp.asarray(x), jnp.asarray(K), n_iters=512,
    )
    res_b = pnp_ransac_bucketed(key, X, x, K, n_iters=512)
    np.testing.assert_array_equal(np.asarray(res_a.R), np.asarray(res_b.R))
    np.testing.assert_array_equal(np.asarray(res_a.C), np.asarray(res_b.C))
    np.testing.assert_array_equal(
        np.asarray(res_a.inliers), np.asarray(res_b.inliers))


def test_nonlinear_pnp_bucketed_matches_unbucketed():
    from sfm_nerf_tpu.ops.pnp import nonlinear_pnp_bucketed

    rng = np.random.default_rng(4)
    X, x, K, R_true, C_true = cam_setup(noise=0.5, n=90)
    w = np.ones(90)
    C0 = C_true + rng.normal(0, 0.05, 3)
    R0 = cv2.Rodrigues(rng.normal(0, 0.02, 3))[0] @ R_true
    Ca, Ra, _ = nonlinear_pnp(
        jnp.asarray(K), jnp.asarray(R0), jnp.asarray(C0),
        jnp.asarray(X), jnp.asarray(x),
        weights=jnp.asarray(w), n_iters=20,
    )
    Cb, Rb, _ = nonlinear_pnp_bucketed(
        K, jnp.asarray(R0), jnp.asarray(C0), X, x, w, n_iters=20,
    )
    np.testing.assert_allclose(np.asarray(Ca), np.asarray(Cb), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Ra), np.asarray(Rb), atol=1e-12)


def test_triangulate_pair_bucketed_matches_unbucketed():
    from sfm_nerf_tpu.ops.triangulation import (
        triangulate_linear, triangulate_nonlinear, triangulate_pair_bucketed,
    )

    scene = make_sfm_scene(n_cams=2, n_points=77, noise_px=0.5, seed=2)
    K, R1, C1 = scene["K"], scene["Rs"][0], scene["Cs"][0]
    R2, C2 = scene["Rs"][1], scene["Cs"][1]
    p1, p2 = scene["obs"][0], scene["obs"][1]
    X_lin = triangulate_linear(
        jnp.asarray(K), jnp.asarray(R1), jnp.asarray(-R1 @ C1),
        jnp.asarray(R2), jnp.asarray(-R2 @ C2),
        jnp.asarray(p1), jnp.asarray(p2))
    X_opt, _, _ = triangulate_nonlinear(
        jnp.asarray(K), jnp.asarray(R1), jnp.asarray(C1),
        jnp.asarray(R2), jnp.asarray(C2),
        jnp.asarray(p1), jnp.asarray(p2), X_lin, n_iters=15)
    Xl_b, Xo_b = triangulate_pair_bucketed(
        K, R1, C1, R2, C2, p1, p2, n_iters=15)
    np.testing.assert_array_equal(np.asarray(X_lin), Xl_b)
    np.testing.assert_array_equal(np.asarray(X_opt), Xo_b)


def test_pnp_ransac_adaptive_early_stop_and_pose():
    """Adaptive PnP RANSAC stops far below the cap and recovers the pose
    to the fixed path's tolerance."""
    from sfm_nerf_tpu.ops.pnp import pnp_ransac_adaptive

    X, x, K, R_true, C_true = cam_setup(noise=0.5)
    rng = np.random.default_rng(1)
    x_corrupt = x.copy()
    out_idx = rng.choice(len(x), 60, replace=False)
    x_corrupt[out_idx] += rng.uniform(-60, 60, (60, 2))
    res, used = pnp_ransac_adaptive(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(x_corrupt),
        jnp.asarray(K), confidence=0.999, max_iters=10000,
        threshold=10.0, chunk=256,
    )
    assert used <= 1024, used
    assert np.linalg.norm(np.asarray(res.R) - R_true) < 0.05
    assert np.linalg.norm(np.asarray(res.C) - C_true) < 0.3
    true_mask = np.ones(len(x), bool)
    true_mask[out_idx] = False
    found = np.asarray(res.inliers)
    precision = (found & true_mask).sum() / max(found.sum(), 1)
    assert precision > 0.9


def test_pnp_ransac_adaptive_is_prefix_of_fixed():
    """Same key => adaptive PnP result == FIXED pnp_ransac at
    n_iters=<scored count> (split prefix stability + the shared
    _pnp_score_chunk_body; mirrors the F-RANSAC prefix test)."""
    from sfm_nerf_tpu.ops.pnp import pnp_ransac, pnp_ransac_adaptive

    X, x, K, _, _ = cam_setup(noise=0.5)
    rng = np.random.default_rng(3)
    x_c = x.copy()
    out_idx = rng.choice(len(x), 60, replace=False)
    x_c[out_idx] += rng.uniform(-60, 60, (60, 2))
    key = jax.random.key(5)
    res_a, used = pnp_ransac_adaptive(
        key, jnp.asarray(X), jnp.asarray(x_c), jnp.asarray(K),
        confidence=0.999, max_iters=10000, threshold=10.0, chunk=256,
    )
    assert used % 256 == 0 and used < 10000
    res_f = pnp_ransac(
        key, jnp.asarray(X), jnp.asarray(x_c), jnp.asarray(K),
        n_iters=used, threshold=10.0, chunk=256,
    )
    np.testing.assert_array_equal(np.asarray(res_a.R), np.asarray(res_f.R))
    np.testing.assert_array_equal(np.asarray(res_a.C), np.asarray(res_f.C))
    np.testing.assert_array_equal(
        np.asarray(res_a.inliers), np.asarray(res_f.inliers))


def test_pnp_ransac_adaptive_bucketed_matches_unpadded():
    from sfm_nerf_tpu.ops.pnp import pnp_ransac_adaptive, pnp_ransac_bucketed

    X, x, K, _, _ = cam_setup(noise=0.5)
    key = jax.random.key(2)
    iters_out = []
    res_b = pnp_ransac_bucketed(
        key, X, x, K, n_iters=10000, threshold=10.0, chunk=256,
        confidence=0.999, iters_out=iters_out,
    )
    res_u, used = pnp_ransac_adaptive(
        key, jnp.asarray(X), jnp.asarray(x), jnp.asarray(K),
        confidence=0.999, max_iters=10000, threshold=10.0, chunk=256,
    )
    assert iters_out == [used]
    np.testing.assert_allclose(
        np.asarray(res_b.R), np.asarray(res_u.R), rtol=1e-9)
    np.testing.assert_array_equal(
        np.asarray(res_b.inliers), np.asarray(res_u.inliers))


def test_pnp_ransac_adaptive_device_matches_host():
    """Device-side adaptive PnP (confidence exit inside one lax.while_loop
    launch) == the host-driven chunk loop for the same key: same winner
    pose/inliers AND the same stop count, through the bucketed wrapper
    (padded rows + traced n_valid) in both routes."""
    from sfm_nerf_tpu.ops.pnp import pnp_ransac_bucketed

    X, x, K, _, _ = cam_setup(noise=0.5)
    rng = np.random.default_rng(7)
    x_c = x.copy()
    out_idx = rng.choice(len(x), 60, replace=False)
    x_c[out_idx] += rng.uniform(-60, 60, (60, 2))
    key = jax.random.key(9)
    outs = {}
    for dev in (False, True):
        iters_out = []
        outs[dev] = (
            pnp_ransac_bucketed(
                key, X, x_c, K, n_iters=10000, threshold=10.0, chunk=256,
                confidence=0.999, iters_out=iters_out, adaptive_device=dev,
            ),
            iters_out[0],
        )
    res_h, used_h = outs[False]
    res_d, used_d = outs[True]
    assert used_d == used_h and used_h < 10000
    np.testing.assert_array_equal(np.asarray(res_d.R), np.asarray(res_h.R))
    np.testing.assert_array_equal(np.asarray(res_d.C), np.asarray(res_h.C))
    np.testing.assert_array_equal(
        np.asarray(res_d.inliers), np.asarray(res_h.inliers))


def test_pnp_f64_host_recovers_pose_with_outliers():
    """The pure-numpy f64 rescue solver (pnp_ransac_f64_host) recovers the
    true pose through 30% gross outliers — the oracle for the per-camera
    f32-collapse rescue path (ADDITION; reference PnPRANSAC semantics,
    Phase1/PnP.py:160-196)."""
    from sfm_nerf_tpu.ops.pnp import pnp_ransac_f64_host

    X, x, K, R_true, C_true = cam_setup(noise=0.5)
    rng = np.random.default_rng(1)
    x_c = x.copy()
    out_idx = rng.choice(len(x), 60, replace=False)
    x_c[out_idx] += rng.uniform(-60, 60, (60, 2))
    res = pnp_ransac_f64_host(0, X, x_c, K, n_iters=1500)
    assert np.linalg.norm(np.asarray(res.R) - R_true) < 0.05
    assert np.linalg.norm(np.asarray(res.C) - C_true) < 0.3
    assert int(res.n_inliers) >= 60
    # the winner's inlier set excludes most corrupted rows
    assert np.asarray(res.inliers)[out_idx].mean() < 0.2


def test_register_camera_f64_rescue(monkeypatch):
    """When the device PnP RANSAC fails its inlier gate, the pipeline's
    f64 host rescue registers the camera anyway ('on'); with the rescue
    'off' the failure propagates as before."""
    from sfm_nerf_tpu.config import SfMConfig
    from sfm_nerf_tpu.ops.pnp import PnPRansacResult
    from sfm_nerf_tpu.sfm import pipeline as pl

    X, x, K, R_true, C_true = cam_setup(noise=0.3)
    failed = PnPRansacResult(
        np.eye(3), np.zeros(3), np.zeros(len(x), bool), np.asarray(0))
    monkeypatch.setattr(
        pl, "pnp_ransac_bucketed", lambda *a, **k: failed)
    pipe = pl.SfMPipeline(SfMConfig(pnp_f64_rescue="on", pnp_iters=1500))
    C, R = pipe.register_camera(7, X, x, K)
    assert C is not None and R is not None
    assert np.linalg.norm(np.asarray(R) - R_true) < 0.05
    assert np.linalg.norm(np.asarray(C) - C_true) < 0.3
    assert pipe.stats["pnp_rescues"][7] >= 6

    pipe_off = pl.SfMPipeline(SfMConfig(pnp_f64_rescue="off"))
    C2, R2 = pipe_off.register_camera(7, X, x, K)
    assert C2 is None and R2 is None
    assert pipe_off.stats["pnp_failures"][7] == 1


def test_pnp_f64_host_matches_jax_linear_pnp():
    """The rescue solver's numpy DLT + decomposition is the SAME camera
    convention as the device path: on an identical minimal sample (f64,
    CPU) the two agree to LAPACK rounding — so a rescued pose drops into
    the downstream refine/BA chain exactly like a device winner."""
    from sfm_nerf_tpu.ops.pnp import _decompose_P_np, _pnp_dlt_np

    X, x, K, _, _ = cam_setup(noise=0.2)
    sel = np.arange(0, 12, 2)[:6]
    C_np, R_np = _decompose_P_np(_pnp_dlt_np(X[sel], x[sel], K))
    C_j, R_j = linear_pnp(
        jnp.asarray(X[sel]), jnp.asarray(x[sel]), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(R_j), R_np, atol=1e-8)
    np.testing.assert_allclose(np.asarray(C_j), C_np, atol=1e-7)
