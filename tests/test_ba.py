"""Bundle adjustment: recovers perturbed geometry; Schur solution equals the
dense normal-equation solution; beats the reference's cost regime."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.ops.ba import (
    BAResult,
    RC_from_camera_params,
    bundle_adjust,
    camera_params_from_RC,
)
from sfm_nerf_tpu.ops.linalg import rodrigues, rotation_to_rvec

from util_synthetic import make_sfm_scene


def build_problem(noise_px=0.0, n_cams=4, n_pts=120, seed=0):
    scene = make_sfm_scene(n_cams=n_cams, n_points=n_pts, noise_px=noise_px,
                           seed=seed)
    cams = np.asarray(camera_params_from_RC(
        jnp.asarray(scene["Rs"]), jnp.asarray(scene["Cs"])))
    return scene, cams


def test_rodrigues_roundtrip_matches_opencv(rng):
    for _ in range(10):
        rvec = rng.normal(0, 1.0, 3)
        R_cv, _ = cv2.Rodrigues(rvec)
        R_j = np.asarray(rodrigues(jnp.asarray(rvec)))
        np.testing.assert_allclose(R_j, R_cv, atol=1e-9)
        back = np.asarray(rotation_to_rvec(jnp.asarray(R_cv)))
        np.testing.assert_allclose(back, rvec, atol=1e-7)


def test_ba_zero_residual_at_ground_truth():
    scene, cams = build_problem()
    res = bundle_adjust(
        jnp.asarray(scene["K"]), jnp.asarray(cams),
        jnp.asarray(scene["points"]), jnp.asarray(scene["obs"]),
        jnp.asarray(scene["vis"]), n_iters=3,
    )
    assert float(res.initial_cost) < 1e-10


def test_ba_recovers_perturbed_geometry():
    scene, cams = build_problem()
    rng = np.random.default_rng(5)
    cams_noisy = cams + rng.normal(0, 0.01, cams.shape)
    pts_noisy = scene["points"] + rng.normal(0, 0.05, scene["points"].shape)
    res = bundle_adjust(
        jnp.asarray(scene["K"]), jnp.asarray(cams_noisy),
        jnp.asarray(pts_noisy), jnp.asarray(scene["obs"]),
        jnp.asarray(scene["vis"]), n_iters=40,
    )
    assert float(res.initial_cost) > 1e3
    assert float(res.cost) < 1e-6, float(res.cost)
    # mean reprojection error (px) after BA
    mean_px = np.sqrt(2 * float(res.cost) / scene["vis"].sum())
    assert mean_px < 1e-4


def test_ba_with_partial_visibility_and_noise():
    scene, cams = build_problem(noise_px=0.5)
    rng = np.random.default_rng(7)
    vis = scene["vis"].copy()
    vis[rng.uniform(size=vis.shape) < 0.4] = False   # 40% missing
    # every point still needs >=2 views for a well-posed problem
    vis[:2, :] = True
    cams_noisy = cams + rng.normal(0, 0.005, cams.shape)
    pts_noisy = scene["points"] + rng.normal(0, 0.03, scene["points"].shape)
    res = bundle_adjust(
        jnp.asarray(scene["K"]), jnp.asarray(cams_noisy),
        jnp.asarray(pts_noisy), jnp.asarray(scene["obs"]),
        jnp.asarray(vis.astype(np.float64)), n_iters=40,
    )
    n_obs = vis.sum()
    rms_before = np.sqrt(2 * float(res.initial_cost) / n_obs)
    rms_after = np.sqrt(2 * float(res.cost) / n_obs)
    assert rms_after < 1.0, (rms_before, rms_after)   # ~noise floor (0.5px)
    assert rms_after < rms_before * 0.5
    # reference regime on its own data: 0.65-0.9 px (BASELINE Table III)


def test_ba_schur_matches_dense_normal_solution():
    """One undamped Gauss-Newton step via our Schur path must equal the step
    from explicitly forming the full (6N+3M) normal equations."""
    scene, cams = build_problem(n_cams=3, n_pts=25)
    rng = np.random.default_rng(11)
    cams_n = jnp.asarray(cams + rng.normal(0, 0.01, cams.shape))
    pts_n = jnp.asarray(scene["points"] + rng.normal(0, 0.05, scene["points"].shape))
    K = jnp.asarray(scene["K"])
    obs = jnp.asarray(scene["obs"])
    vis = jnp.asarray(scene["vis"].astype(np.float64))

    # dense oracle: flatten params, residual via the same model, lstsq on
    # the damped normal equations
    from sfm_nerf_tpu.ops.ba import _observe

    def residuals_flat(theta):
        cams_ = theta[: cams_n.size].reshape(cams_n.shape)
        pts_ = theta[cams_n.size:].reshape(pts_n.shape)
        obs_fn = jax.vmap(jax.vmap(_observe, (None, 0, None)), (0, None, None))
        proj = obs_fn(cams_, pts_, K)
        r = (proj - obs) * vis[..., None]
        return r.reshape(-1)

    theta0 = jnp.concatenate([cams_n.reshape(-1), pts_n.reshape(-1)])
    J = jax.jacfwd(residuals_flat)(theta0)
    r = residuals_flat(theta0)
    lam = 1e-3
    H = J.T @ J + lam * jnp.eye(theta0.size)
    step_dense = -jnp.linalg.solve(H, J.T @ r)

    # our path: a single LM iteration with the same lambda, accepted or not,
    # exposes its step as (new - old) when accepted; force acceptance by
    # running bundle_adjust for 1 iteration (perturbed start => improvement)
    res = bundle_adjust(K, cams_n, pts_n, obs, vis, n_iters=1, lambda0=lam)
    step_mine = jnp.concatenate([
        (res.camera_params - cams_n).reshape(-1),
        (res.points - pts_n).reshape(-1),
    ])
    assert int(res.n_accepted) == 1
    np.testing.assert_allclose(
        np.asarray(step_mine), np.asarray(step_dense), rtol=1e-5, atol=1e-7
    )


def test_camera_param_pack_roundtrip():
    scene, cams = build_problem()
    Rs, Cs = RC_from_camera_params(jnp.asarray(cams))
    np.testing.assert_allclose(np.asarray(Rs), scene["Rs"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(Cs), scene["Cs"], atol=1e-8)


def test_ba_huber_resists_outliers():
    """Gross observation outliers: L2 BA gets dragged, Huber BA doesn't."""
    scene, cams = build_problem(noise_px=0.3, n_cams=4, n_pts=100)
    rng = np.random.default_rng(21)
    obs = scene["obs"].copy()
    # corrupt 8% of observations badly
    n_cam, n_pts = scene["vis"].shape
    for _ in range(int(0.08 * n_cam * n_pts)):
        i, j = rng.integers(n_cam), rng.integers(n_pts)
        obs[i, j] += rng.uniform(-60, 60, 2)
    cams_n = cams + rng.normal(0, 0.005, cams.shape)
    pts_n = scene["points"] + rng.normal(0, 0.03, scene["points"].shape)

    def inlier_rms(res):
        from sfm_nerf_tpu.ops.ba import RC_from_camera_params
        from sfm_nerf_tpu.ops.triangulation import reprojection_errors

        Rs, Cs = RC_from_camera_params(res.camera_params)
        errs = np.stack([
            np.sqrt(np.asarray(reprojection_errors(
                jnp.asarray(scene["K"]), Rs[c], Cs[c], res.points,
                jnp.asarray(scene["obs"][c]))))   # vs CLEAN ground-truth obs
            for c in range(n_cam)
        ])
        return float(np.median(errs))

    res_l2 = bundle_adjust(
        jnp.asarray(scene["K"]), jnp.asarray(cams_n), jnp.asarray(pts_n),
        jnp.asarray(obs), jnp.asarray(scene["vis"].astype(np.float64)),
        n_iters=40,
    )
    res_hu = bundle_adjust(
        jnp.asarray(scene["K"]), jnp.asarray(cams_n), jnp.asarray(pts_n),
        jnp.asarray(obs), jnp.asarray(scene["vis"].astype(np.float64)),
        n_iters=40, loss="huber", huber_delta=2.0,
    )
    rms_l2, rms_hu = inlier_rms(res_l2), inlier_rms(res_hu)
    assert rms_hu < rms_l2 * 0.7, (rms_l2, rms_hu)
    assert rms_hu < 1.0, rms_hu


def test_rotation_to_rvec_near_pi(rng):
    """180-degree rotations: the antisymmetric part vanishes — the symmetric-
    part branch must still recover the axis (cv2 oracle roundtrip)."""
    for axis in ([0, 0, 1], [1, 0, 0], [0.6, -0.8, 0], [1, 1, 1]):
        a = np.asarray(axis, np.float64)
        a /= np.linalg.norm(a)
        for theta in (np.pi, np.pi - 1e-5, np.pi - 1e-7):
            rvec = a * theta
            R, _ = cv2.Rodrigues(rvec)
            back = np.asarray(rotation_to_rvec(jnp.asarray(R)))
            R_back, _ = cv2.Rodrigues(back)
            # axis sign is ambiguous at exactly pi — compare rotations
            np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_behind_camera_projection_is_not_a_mirror():
    """Regression: u = f*x/z is invariant under reflecting a point through
    the camera center, so a sign-preserving z clamp in the BA residual let
    LM walk the whole rig through a distant point cloud to a mirrored
    optimum (99% of observations behind the cameras at sub-pixel 'error'
    on the bundled 5-view data).  The one-sided z floor makes the
    behind-camera projection astronomically different from the in-front
    one — the cost itself is the cheirality barrier."""
    from sfm_nerf_tpu.ops.ba import _observe

    K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    cam = jnp.zeros(6)
    X_front = jnp.asarray([0.5, 0.3, 4.0])
    p_front = np.asarray(_observe(cam, X_front, K))
    p_mirror = np.asarray(_observe(cam, -X_front, K))
    np.testing.assert_allclose(
        p_front, [382.5, 277.5], atol=1e-9)          # honest projection
    assert np.linalg.norm(p_mirror - p_front) > 1e6  # barrier, not mirror


def test_ba_does_not_flip_rig_through_distant_cloud():
    """Small-baseline camera cluster + distant points: the configuration
    where the mirrored optimum is nearly cost-equal.  After many LM
    iterations every active observation must still have positive depth."""
    rng = np.random.default_rng(3)
    n_cams, n_pts = 5, 150
    # cameras clustered in a 0.3-unit ball, points 8-15 units away
    Cs = rng.normal(0, 0.1, (n_cams, 3))
    Rs = np.stack([np.eye(3)] * n_cams)
    pts = np.concatenate(
        [rng.uniform(-3, 3, (n_pts, 2)), rng.uniform(8, 15, (n_pts, 1))], 1)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    cams = np.asarray(camera_params_from_RC(jnp.asarray(Rs), jnp.asarray(Cs)))
    xc = np.einsum("nij,mj->nmi", Rs, pts) - np.einsum(
        "nij,nj->ni", Rs, Cs)[:, None]
    obs = xc[..., :2] / xc[..., 2:] * 500.0 + np.array([320.0, 240.0])
    obs += rng.normal(0, 1.0, obs.shape)              # 1px observation noise
    vis = np.ones((n_cams, n_pts))
    # perturb the initialization so LM has real work to do
    cams0 = cams + rng.normal(0, 0.01, cams.shape)
    pts0 = pts + rng.normal(0, 0.05, pts.shape)
    res = bundle_adjust(
        jnp.asarray(K), jnp.asarray(cams0), jnp.asarray(pts0),
        jnp.asarray(obs), jnp.asarray(vis), n_iters=60,
    )
    Rs_f = np.asarray(rodrigues(jnp.asarray(res.camera_params[:, :3])))
    z = (np.einsum("nij,mj->nmi", Rs_f, np.asarray(res.points))
         + np.asarray(res.camera_params)[:, None, 3:])[..., 2]
    assert (z > 0).all(), f"{(z <= 0).sum()} observations behind cameras"
    assert float(res.cost) < float(res.initial_cost)


def _spherical_rig(n_cams=8, n_pts=400, seed=0,
                   theta_true=(600.0, 610.0, 320.0, 240.0, 0.05, -0.01),
                   noise_px=0.3):
    """Well-conditioned rig for intrinsics recovery: cameras on a sphere
    around a deep cloud, each looking at the centroid with a random roll
    (rotation diversity in all axes — make_sfm_scene's yaw-only rig leaves
    fy/cy near-unobservable and the recovery test meaningless)."""
    from scipy.spatial.transform import Rotation

    from sfm_nerf_tpu.ops.ba import _observe_theta

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, (n_pts, 3)) * [1, 1, 1.2] + [0, 0, 5.0]
    cams = []
    for _ in range(n_cams):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        C = np.array([0, 0, 5.0]) + 6.0 * d
        z = np.array([0, 0, 5.0]) - C
        z /= np.linalg.norm(z)
        up = rng.normal(size=3)
        up -= up @ z * z
        up /= np.linalg.norm(up)
        R = np.stack([np.cross(up, z), up, z])
        cams.append(np.concatenate([Rotation.from_matrix(R).as_rotvec(),
                                    -R @ C]))
    cams = np.asarray(cams)
    th = jnp.asarray(theta_true)
    proj = jax.vmap(jax.vmap(_observe_theta, (None, 0, None)),
                    (0, None, None))
    obs = np.array(proj(jnp.asarray(cams), jnp.asarray(pts), th))
    obs = obs + rng.normal(0, noise_px, obs.shape)
    return cams, pts, obs, np.ones((len(cams), n_pts))


def test_ba_refine_intrinsics_recovers_truth():
    """Observations generated with fx=600 fy=610 pp=(320,240) k1=.05
    k2=-.01; BA initialized with a 5%-wrong focal, shifted pp, and zero
    distortion recovers all six shared intrinsics to the noise floor."""
    cams_true, pts, obs, vis = _spherical_rig()
    rng = np.random.default_rng(1)
    K0 = np.array([[630.0, 0, 310.0], [0, 580.0, 250.0], [0, 0, 1.0]])
    res = bundle_adjust(
        jnp.asarray(K0),
        jnp.asarray(cams_true + rng.normal(0, 0.01, cams_true.shape)),
        jnp.asarray(pts + rng.normal(0, 0.05, pts.shape)),
        jnp.asarray(obs), jnp.asarray(vis),
        n_iters=80, refine_intrinsics="f,pp,k1,k2",
    )
    th = np.asarray(res.intrinsics)
    assert abs(th[0] - 600.0) < 1.0, th
    assert abs(th[1] - 610.0) < 1.0, th
    assert abs(th[2] - 320.0) < 1.0, th
    assert abs(th[3] - 240.0) < 1.0, th
    assert abs(th[4] - 0.05) < 3e-3, th
    assert abs(th[5] + 0.01) < 6e-3, th
    rms = float(np.sqrt(2 * res.cost / res.n_residuals))
    assert rms < 0.6, rms   # ~noise floor (0.3 px/axis)


def test_ba_refine_frozen_params_stay_exactly():
    """Refining only 'f' leaves the frozen pp/k coordinates EXACTLY at
    their initial values (their update solves to 0 by construction)."""
    cams_true, pts, obs, vis = _spherical_rig(
        theta_true=(600.0, 610.0, 320.0, 240.0, 0.0, 0.0))
    K0 = np.array([[620.0, 0, 320.0], [0, 630.0, 240.0], [0, 0, 1.0]])
    res = bundle_adjust(
        jnp.asarray(K0), jnp.asarray(cams_true), jnp.asarray(pts),
        jnp.asarray(obs), jnp.asarray(vis),
        n_iters=40, refine_intrinsics="f",
    )
    th = np.asarray(res.intrinsics)
    assert abs(th[0] - 600.0) < 1.0 and abs(th[1] - 610.0) < 1.0, th
    np.testing.assert_array_equal(th[2:], [320.0, 240.0, 0.0, 0.0])


def test_ba_refine_off_returns_input_K_verbatim():
    scene, cams = build_problem()
    res = bundle_adjust(
        jnp.asarray(scene["K"]), jnp.asarray(cams),
        jnp.asarray(scene["points"]), jnp.asarray(scene["obs"]),
        jnp.asarray(scene["vis"]), n_iters=2,
    )
    np.testing.assert_array_equal(
        np.asarray(res.intrinsics),
        [800.0, 800.0, 400.0, 300.0, 0.0, 0.0])


def test_ba_refine_intrinsics_bad_token_raises():
    import pytest

    with pytest.raises(ValueError, match="unknown intrinsics token"):
        scene, cams = build_problem()
        bundle_adjust(
            jnp.asarray(scene["K"]), jnp.asarray(cams),
            jnp.asarray(scene["points"]), jnp.asarray(scene["obs"]),
            jnp.asarray(scene["vis"]), n_iters=1,
            refine_intrinsics="focal",
        )


def test_inv3x3_lanes_matches_numpy_inverse(rng):
    """The closed-form adjugate/det inverse of the damped per-point normal
    blocks (batch axis LAST, full 128-wide lanes on TPU — see ops/ba.py
    layout note) equals numpy's inverse on random symmetric PSD blocks,
    including rank-deficient ones where only the lam*I damping makes the
    block invertible."""
    from sfm_nerf_tpu.ops.ba import _inv3x3_lanes

    M = 257                              # deliberately not lane-aligned
    J = rng.normal(size=(M, 5, 3))
    W_batch = np.einsum("mri,mrj->mij", J, J)         # PSD, full rank a.s.
    W_batch[:7] = np.einsum(
        "mri,mrj->mij", J[:7, :1], J[:7, :1])          # rank-1 blocks
    lam = 1e-3
    got = np.asarray(
        _inv3x3_lanes(jnp.asarray(W_batch.transpose(1, 2, 0)),
                      jnp.asarray(lam)))               # (3,3,M)
    want = np.linalg.inv(W_batch + lam * np.eye(3))
    np.testing.assert_allclose(got.transpose(2, 0, 1), want,
                               rtol=2e-5, atol=1e-8)
