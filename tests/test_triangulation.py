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
