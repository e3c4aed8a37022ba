"""Epipolar ops against synthetic ground truth and OpenCV oracles —
the automated version of the reference's inline cv2 cross-checks
(SURVEY §4.1: cv2.findFundamentalMat / cv2.recoverPose comparisons)."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.ops.epipolar import (
    decompose_essential,
    eight_point,
    essential_from_fundamental,
    normalization_matrix,
    ransac_fundamental,
    sampson_distance,
)
from sfm_nerf_tpu.ops.linalg import homogenize

from util_synthetic import make_sfm_scene


def two_view_correspondences(noise=0.0, n=300, outlier_frac=0.0, seed=0):
    scene = make_sfm_scene(n_cams=2, n_points=n, noise_px=noise, seed=seed)
    pts1, pts2 = scene["obs"][0], scene["obs"][1]
    rng = np.random.default_rng(seed + 1)
    if outlier_frac > 0:
        n_out = int(n * outlier_frac)
        out_idx = rng.choice(n, n_out, replace=False)
        pts2 = pts2.copy()
        pts2[out_idx] += rng.uniform(-80, 80, (n_out, 2))
        inlier_mask = np.ones(n, bool)
        inlier_mask[out_idx] = False
    else:
        inlier_mask = np.ones(n, bool)
    return scene, pts1, pts2, inlier_mask


def epipolar_residual(F, pts1, pts2):
    h1, h2 = homogenize(jnp.asarray(pts1)), homogenize(jnp.asarray(pts2))
    # standard constraint h2^T F h1 = 0 (see _constraint_rows deviation note)
    return np.asarray(jnp.einsum("ni,ij,nj->n", h2, F, h1))


def test_normalization_matrix_properties(rng):
    pts = rng.uniform(0, 800, (100, 2)).astype(np.float64)
    T = np.asarray(normalization_matrix(jnp.asarray(pts)))
    h = np.hstack([pts, np.ones((100, 1))]) @ T.T
    np.testing.assert_allclose(h[:, :2].mean(0), 0, atol=1e-4)
    rms = np.sqrt((h[:, :2] ** 2).sum(1).mean())
    np.testing.assert_allclose(rms, np.sqrt(2), rtol=1e-5)


def test_eight_point_exact_correspondences():
    _, pts1, pts2, _ = two_view_correspondences()
    F = eight_point(jnp.asarray(pts1[:64]), jnp.asarray(pts2[:64]))
    res = epipolar_residual(F, pts1, pts2)
    # F is scaled so F[2,2]=1; residuals of exact correspondences ~ 0
    assert np.abs(res).max() < 1e-2
    # rank 2
    s = np.linalg.svd(np.asarray(F), compute_uv=False)
    assert s[2] / s[0] < 1e-6


def test_eight_point_batched_consistent():
    _, pts1, pts2, _ = two_view_correspondences()
    single = eight_point(jnp.asarray(pts1[:8]), jnp.asarray(pts2[:8]))
    batched = eight_point(
        jnp.asarray(pts1[:16]).reshape(2, 8, 2),
        jnp.asarray(pts2[:16]).reshape(2, 8, 2),
    )
    np.testing.assert_allclose(
        np.asarray(batched[0]), np.asarray(single), rtol=1e-3, atol=1e-4
    )


def test_sampson_distance_zero_for_exact_fit():
    """Our fit and scorer use the same h2^T F h1 = 0 convention (unlike the
    reference, whose 8-point layout is transposed vs its scorer — see the
    _constraint_rows deviation note), so exact correspondences score ~0."""
    _, pts1, pts2, _ = two_view_correspondences()
    T1 = normalization_matrix(jnp.asarray(pts1))
    T2 = normalization_matrix(jnp.asarray(pts2))
    h1 = homogenize(jnp.asarray(pts1)) @ T1.T
    h2 = homogenize(jnp.asarray(pts2)) @ T2.T
    F = eight_point(h1[:32, :2], h2[:32, :2])
    d = np.asarray(sampson_distance(F, h1, h2))
    assert d.max() < 1e-9


def test_ransac_rejects_outliers():
    _, pts1, pts2, inlier_mask = two_view_correspondences(
        noise=0.3, outlier_frac=0.3
    )
    res = ransac_fundamental(
        jax.random.key(0),
        jnp.asarray(pts1, jnp.float32), jnp.asarray(pts2, jnp.float32),
        n_iters=2000, threshold=5e-4, chunk=256,
    )
    found = np.asarray(res.inliers)
    true_in = inlier_mask
    recall = (found & true_in).sum() / true_in.sum()
    precision = (found & true_in).sum() / max(found.sum(), 1)
    assert recall > 0.85, f"recall {recall}"
    assert precision > 0.9, f"precision {precision}"


def test_ransac_f_close_to_opencv_oracle():
    import cv2

    _, pts1, pts2, _ = two_view_correspondences(noise=0.2, outlier_frac=0.2)
    res = ransac_fundamental(
        jax.random.key(1),
        jnp.asarray(pts1, jnp.float32), jnp.asarray(pts2, jnp.float32),
        n_iters=2000, threshold=5e-4, chunk=256,
    )
    F_cv, _ = cv2.findFundamentalMat(pts1, pts2, cv2.FM_RANSAC)
    # compare as epipolar operators on clean points (scale-free):
    # both should produce near-zero residuals on true inliers
    F_mine = np.asarray(res.F)
    F_mine = F_mine / F_mine[2, 2]   # denormalized F isn't unit-scaled
    res_mine = epipolar_residual(jnp.asarray(F_mine), pts1, pts2)
    # note our F satisfies h1^T F h2; OpenCV's satisfies h2^T F h1
    h1, h2 = homogenize(jnp.asarray(pts1)), homogenize(jnp.asarray(pts2))
    res_cv = np.asarray(jnp.einsum("nj,ji,ni->n", h2, jnp.asarray(F_cv), h1))
    med_mine = np.median(np.abs(res_mine))
    med_cv = np.median(np.abs(res_cv / F_cv[2, 2]))
    assert med_mine < max(5 * med_cv, 1.0), (med_mine, med_cv)


def test_essential_decomposition_recovers_pose():
    scene, pts1, pts2, _ = two_view_correspondences()
    K = scene["K"]
    # ground-truth relative pose: world == cam1 frame here (R0=I, C0=0)
    R1, C1 = scene["Rs"][0], scene["Cs"][0]
    R2, C2 = scene["Rs"][1], scene["Cs"][1]
    R_rel = R2 @ R1.T
    C_rel = R1 @ (C2 - C1)           # cam2 center in cam1 frame
    t_rel = -R_rel @ C_rel           # extrinsic translation

    F = eight_point(jnp.asarray(pts1[:100]), jnp.asarray(pts2[:100]))
    E = essential_from_fundamental(jnp.asarray(K), F)
    Cs, Rs = decompose_essential(E)
    Cs, Rs = np.asarray(Cs), np.asarray(Rs)
    # one candidate must recover R_rel exactly; the C slot carries the
    # TRANSLATION direction (reference's center-convention quirk — see
    # decompose_essential docstring)
    t_unit = t_rel / np.linalg.norm(t_rel)
    r_errs = [np.linalg.norm(Rs[i] - R_rel) for i in range(4)]
    best = int(np.argmin(r_errs))
    assert r_errs[best] < 5e-2, r_errs
    cb = Cs[best] / np.linalg.norm(Cs[best])
    assert min(np.linalg.norm(cb - t_unit), np.linalg.norm(cb + t_unit)) < 5e-2


def test_full_two_view_chain_reprojection_error():
    """F -> E -> candidates -> triangulate -> cheirality on exact synthetic
    correspondences with real rotation: linear reprojection error must land
    in the reference's ballpark (its Table I reports 1.93 px; the residual
    is the decompose C-convention quirk) and far below the 50-70 px the
    reference's transposed-F layout would produce."""
    from sfm_nerf_tpu.ops.triangulation import (
        disambiguate_pose, reprojection_errors,
    )

    scene, pts1, pts2, _ = two_view_correspondences()
    K = jnp.asarray(scene["K"])
    F = eight_point(jnp.asarray(pts1[:150]), jnp.asarray(pts2[:150]))
    E = essential_from_fundamental(K, F)
    Cs, Rs = decompose_essential(E)
    X, C, R, _, _ = disambiguate_pose(
        K, Cs, Rs, jnp.asarray(pts1), jnp.asarray(pts2)
    )
    e1 = np.sqrt(np.asarray(reprojection_errors(
        K, jnp.eye(3), jnp.zeros(3), X, jnp.asarray(pts1))))
    e2 = np.sqrt(np.asarray(reprojection_errors(K, R, C, X, jnp.asarray(pts2))))
    assert e1.mean() < 10.0, e1.mean()
    assert e2.mean() < 10.0, e2.mean()


def test_ransac_score_msac_breaks_count_ties():
    """Two hypotheses with IDENTICAL inlier counts but different residual
    quality: 'count' ties them (the platform-dependent-argmax hazard that
    swung 506 vs 574 final inliers on the bundled data), 'msac' ranks the
    tighter one strictly higher.  Padded rows (gated to inf) must shift
    every hypothesis by the same constant."""
    from sfm_nerf_tpu.ops.epipolar import _ransac_score

    thr = 1.0
    d_tight = jnp.asarray([[0.1, 0.2, 0.1, 5.0, 9.0]])
    d_loose = jnp.asarray([[0.9, 0.8, 0.9, 5.0, 9.0]])
    for scoring, tie in (("msac", False), ("count", True)):
        s_t = float(_ransac_score(d_tight, thr, scoring)[0])
        s_l = float(_ransac_score(d_loose, thr, scoring)[0])
        assert (s_t == s_l) == tie, (scoring, s_t, s_l)
        if not tie:
            assert s_t > s_l
    # inf-gated padding adds a hypothesis-independent constant
    pad = jnp.full((1, 3), jnp.inf)
    s_pad = _ransac_score(jnp.concatenate([d_tight, pad], -1), thr, "msac")
    s_raw = _ransac_score(d_tight, thr, "msac")
    np.testing.assert_allclose(
        float(s_pad[0] - s_raw[0]), -3.0 * thr, rtol=1e-6)
    # NaN residuals are outliers, not poison
    d_nan = d_tight.at[0, 0].set(jnp.nan)
    assert np.isfinite(float(_ransac_score(d_nan, thr, "msac")[0]))


def test_ransac_count_scoring_still_supported():
    """scoring='count' (reference parity mode) must still find the model."""
    _, pts1, pts2, inlier_mask = two_view_correspondences(
        noise=0.3, outlier_frac=0.3
    )
    res = ransac_fundamental(
        jax.random.key(0),
        jnp.asarray(pts1, jnp.float32), jnp.asarray(pts2, jnp.float32),
        n_iters=2000, threshold=5e-4, chunk=256, scoring="count",
    )
    found = np.asarray(res.inliers)
    recall = (found & inlier_mask).sum() / inlier_mask.sum()
    precision = (found & inlier_mask).sum() / max(found.sum(), 1)
    assert recall > 0.85 and precision > 0.9, (recall, precision)


def test_ransac_bucketed_matches_unpadded():
    """Padded-bucket RANSAC must find an equivalent model: same inlier
    support (identical sampling given identical draw range is not expected —
    bucketing changes nothing about the distribution, only the shapes)."""
    from sfm_nerf_tpu.ops.epipolar import ransac_fundamental_bucketed

    _, pts1, pts2, inlier_mask = two_view_correspondences(
        noise=0.3, outlier_frac=0.3
    )
    res = ransac_fundamental_bucketed(
        jax.random.key(0), pts1, pts2, n_iters=2000, chunk=256,
    )
    found = np.asarray(res.inliers)
    assert found.shape == (len(pts1),)
    recall = (found & inlier_mask).sum() / inlier_mask.sum()
    precision = (found & inlier_mask).sum() / max(found.sum(), 1)
    assert recall > 0.85 and precision > 0.9, (recall, precision)


def test_bucket_floor_invariance():
    """Raising the point-axis bucket floor (SfMConfig.bucket_floor — the
    accelerator default merges the small buckets into one executable for
    the REGISTRATION-side ops) must not change the WINNER: draws are
    U[i, n_valid) keyed by shape (n_hyp, k) only, and scoring masks padded
    rows, so the winning inlier set is identical across buckets.  The
    fitted model agrees to rounding only — reductions over a longer padded
    axis reassociate (same phenomenon as the parallel/ba.py tolerance
    contract).  The F-RANSAC cores opt OUT of the floor entirely (their
    executables' per-process relay cost scales sharply with the bucket —
    pow2_bucket docstring), pinned here via the floored= flag."""
    from sfm_nerf_tpu.ops.pnp import pnp_ransac_bucketed
    from sfm_nerf_tpu.utils.buckets import pow2_bucket, set_point_bucket_floor

    from test_pnp import cam_setup

    X, x, K, _, _ = cam_setup(noise=1.0, n=100)
    key = jax.random.key(5)
    run = lambda: pnp_ransac_bucketed(key, X, x, K, n_iters=512)
    try:
        set_point_bucket_floor(None)
        assert pow2_bucket(len(X)) == 128
        base = run()
        set_point_bucket_floor(4096)
        assert pow2_bucket(len(X)) == 4096
        assert pow2_bucket(5, floor=8) == 8   # camera-axis floors untouched
        # F-RANSAC call sites keep natural buckets under any floor
        assert pow2_bucket(len(X), floored=False) == 128
        merged = run()
    finally:
        set_point_bucket_floor(None)
    np.testing.assert_array_equal(
        np.asarray(base.inliers), np.asarray(merged.inliers))
    np.testing.assert_allclose(
        np.asarray(base.R), np.asarray(merged.R), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(base.C), np.asarray(merged.C), rtol=1e-9, atol=1e-9)


def test_draw_minimal_samples_duplicate_free_and_valid_only():
    """Minimal-sample draws: no repeats within a hypothesis (the
    reference's replace=False), padded rows never drawn, and every valid
    row reachable (coverage over many draws)."""
    from sfm_nerf_tpu.ops.epipolar import draw_minimal_samples

    n_pts, n_valid, k = 64, 11, 8
    idx = np.asarray(draw_minimal_samples(
        jax.random.key(0), 4096, k, n_pts, jnp.asarray(n_valid)))
    assert idx.shape == (4096, k)
    assert (idx < n_valid).all() and (idx >= 0).all()  # padding excluded
    for row in idx[:512]:
        assert len(set(row.tolist())) == k            # duplicate-free
    # uniform subset: every valid row appears with roughly equal frequency
    counts = np.bincount(idx.reshape(-1), minlength=n_valid)
    expected = idx.size / n_valid
    assert (np.abs(counts - expected) < 0.1 * expected).all()
    # bucket invariance: a different pad width cannot change the draws
    idx2 = np.asarray(draw_minimal_samples(
        jax.random.key(0), 4096, k, 2 * n_pts, jnp.asarray(n_valid)))
    np.testing.assert_array_equal(idx, idx2)


def test_draw_minimal_samples_permutation_uniform():
    """The sparse Fisher-Yates draw is exactly uniform over ordered
    k-tuples (chi-square over all 3-of-8 permutations)."""
    from collections import Counter

    from sfm_nerf_tpu.ops.epipolar import draw_minimal_samples

    n_draws, k, n = 120000, 3, 8
    idx = np.asarray(draw_minimal_samples(
        jax.random.key(42), n_draws, k, n))
    tuples = Counter(tuple(r.tolist()) for r in idx)
    n_cells = n * (n - 1) * (n - 2)                   # 336 ordered tuples
    assert len(tuples) == n_cells
    expected = n_draws / n_cells
    chi2 = sum((c - expected) ** 2 / expected for c in tuples.values())
    # dof=335: mean 335, sd ~26 -> 500 is ~6 sigma; a biased draw
    # (e.g. with-replacement or a broken swap map) lands in the 1000s
    assert chi2 < 500, chi2


def test_adaptive_trials_needed_formula():
    """H&Z Alg. 4.5 bound: N = log(1-p) / log(1 - w^s)."""
    from sfm_nerf_tpu.ops.epipolar import adaptive_trials_needed

    n = adaptive_trials_needed(150, 300, 8, 0.999)
    expected = np.log(1e-3) / np.log1p(-0.5 ** 8)
    np.testing.assert_allclose(n, expected, rtol=1e-12)
    assert adaptive_trials_needed(0, 300, 8, 0.999) == float("inf")
    assert adaptive_trials_needed(300, 300, 8, 0.999) < 15


def test_ransac_adaptive_early_stop_and_quality():
    """Adaptive F-RANSAC terminates far below the cap at a healthy inlier
    ratio and keeps the fixed path's inlier recall/precision."""
    from sfm_nerf_tpu.ops.epipolar import ransac_fundamental_adaptive

    _, pts1, pts2, inlier_mask = two_view_correspondences(
        noise=0.3, outlier_frac=0.3
    )
    res, used = ransac_fundamental_adaptive(
        jax.random.key(0),
        jnp.asarray(pts1, jnp.float32), jnp.asarray(pts2, jnp.float32),
        confidence=0.999, max_iters=50000, threshold=5e-4, chunk=256,
    )
    # 70% inliers, k=8 -> ~120 draws needed; chunk granularity + the
    # 2-chunk floor puts the stop at 512
    assert used <= 1024, used
    found = np.asarray(res.inliers)
    recall = (found & inlier_mask).sum() / inlier_mask.sum()
    precision = (found & inlier_mask).sum() / max(found.sum(), 1)
    assert recall > 0.85, f"recall {recall}"
    assert precision > 0.9, f"precision {precision}"


def test_ransac_adaptive_is_prefix_of_fixed():
    """Same key => an adaptive run that scores c*chunk hypotheses returns
    EXACTLY the FIXED path's result at n_iters=c*chunk: jax.random.split
    is prefix-stable in the count (split(key, c) == split(key, C)[:c]),
    so both paths score the identical hypothesis sequence through the
    shared _score_chunk_body and re-estimate the identical winner.  This
    pins the PARITY.md-advertised prefix property against divergence
    between the fixed and adaptive scorers."""
    from sfm_nerf_tpu.ops.epipolar import (
        ransac_fundamental, ransac_fundamental_adaptive,
    )

    _, pts1, pts2, _ = two_view_correspondences(noise=0.3, outlier_frac=0.3)
    key = jax.random.key(7)
    p1 = jnp.asarray(pts1, jnp.float32)
    p2 = jnp.asarray(pts2, jnp.float32)
    res_a, used = ransac_fundamental_adaptive(
        key, p1, p2, confidence=0.999, max_iters=50000,
        threshold=5e-4, chunk=256,
    )
    assert used % 256 == 0 and used < 50000
    res_f = ransac_fundamental(
        key, p1, p2, n_iters=used, threshold=5e-4, chunk=256,
    )
    np.testing.assert_array_equal(np.asarray(res_a.F), np.asarray(res_f.F))
    np.testing.assert_array_equal(
        np.asarray(res_a.inliers), np.asarray(res_f.inliers))
    assert int(res_a.best_iter) == int(res_f.best_iter)

    # and a second adaptive run capped exactly at `used` reproduces it
    res_b, used_b = ransac_fundamental_adaptive(
        key, p1, p2, confidence=1.0 - 1e-12, max_iters=used,
        threshold=5e-4, chunk=256,
    )
    assert used_b == used
    np.testing.assert_array_equal(np.asarray(res_a.F), np.asarray(res_b.F))


def test_ransac_adaptive_bucketed_matches_unpadded():
    """confidence>0 through the bucketed wrapper: padded draws are
    bucket-invariant, so the padded run matches the unpadded one."""
    from sfm_nerf_tpu.ops.epipolar import (
        ransac_fundamental_adaptive, ransac_fundamental_bucketed,
    )

    _, pts1, pts2, _ = two_view_correspondences(
        noise=0.3, outlier_frac=0.3, n=300
    )
    key = jax.random.key(3)
    iters_out = []
    res_b = ransac_fundamental_bucketed(
        key, pts1, pts2, n_iters=50000, threshold=5e-4, chunk=256,
        confidence=0.999, iters_out=iters_out,
    )
    res_u, used = ransac_fundamental_adaptive(
        key, jnp.asarray(pts1), jnp.asarray(pts2),
        confidence=0.999, max_iters=50000, threshold=5e-4, chunk=256,
    )
    assert iters_out == [used]
    # the padded run re-derives the normalization stats through the masked
    # branch (sum/n vs mean) — ulp-level drift, so compare with tolerance
    # and allow boundary-threshold inlier flips
    Fb, Fu = np.asarray(res_b.F), np.asarray(res_u.F)
    np.testing.assert_allclose(Fb / Fb[2, 2], Fu / Fu[2, 2], rtol=1e-6)
    mismatch = (np.asarray(res_b.inliers)
                != np.asarray(res_u.inliers)).sum()
    assert mismatch <= 3, mismatch


def test_ransac_adaptive_mesh_is_rejected():
    import pytest

    from sfm_nerf_tpu.ops.epipolar import ransac_fundamental_bucketed

    _, pts1, pts2, _ = two_view_correspondences(n=64)
    with pytest.raises(ValueError, match="mutually exclusive"):
        ransac_fundamental_bucketed(
            jax.random.key(0), pts1, pts2, confidence=0.999,
            mesh=object(),
        )


def test_ransac_pairs_bucketed_bit_equal_to_loop():
    """Pair-axis batched F-RANSAC (one launch per bucket) is BIT-EQUAL per
    pair to the sequential bucketed loop for the same key stream — mixed
    pair sizes exercise the bucket grouping AND the cross-bucket ordering."""
    from sfm_nerf_tpu.ops.epipolar import (
        ransac_fundamental_bucketed, ransac_fundamental_pairs_bucketed,
    )

    sizes = [300, 210, 70, 290]       # buckets 512, 256, 128, 512
    items = []
    for s, seed in zip(sizes, range(4)):
        _, p1, p2, _ = two_view_correspondences(
            noise=0.4, n=s, outlier_frac=0.25, seed=seed)
        items.append((jax.random.key(100 + seed), p1, p2))

    batched = ransac_fundamental_pairs_bucketed(
        items, n_iters=1024, chunk=256)
    for (key, p1, p2), res in zip(items, batched):
        ref = ransac_fundamental_bucketed(key, p1, p2, n_iters=1024, chunk=256)
        np.testing.assert_array_equal(np.asarray(res.F), np.asarray(ref.F))
        np.testing.assert_array_equal(
            np.asarray(res.inliers), np.asarray(ref.inliers))
        assert int(res.n_inliers) == int(ref.n_inliers)
        assert int(res.best_iter) == int(ref.best_iter)


def test_ransac_pairs_adaptive_truncates_to_fixed():
    """Batched ADAPTIVE pair RANSAC: per pair, the result equals the FIXED
    path truncated at the batched run's stop count (prefix-stable key
    split) — and the stage stops early on easy data."""
    from sfm_nerf_tpu.ops.epipolar import (
        ransac_fundamental_bucketed, ransac_fundamental_pairs_bucketed,
    )

    items = []
    for seed in range(3):
        _, p1, p2, _ = two_view_correspondences(
            noise=0.3, n=250, outlier_frac=0.2, seed=10 + seed)
        items.append((jax.random.key(seed), p1, p2))
    iters_out = []
    batched = ransac_fundamental_pairs_bucketed(
        items, n_iters=8192, chunk=256, confidence=0.999,
        iters_out=iters_out)
    assert len(iters_out) == 3
    assert max(iters_out) < 8192          # the stage exited early
    for (key, p1, p2), res, used in zip(items, batched, iters_out):
        ref = ransac_fundamental_bucketed(
            key, p1, p2, n_iters=used, chunk=256)    # fixed run, truncated
        np.testing.assert_array_equal(np.asarray(res.F), np.asarray(ref.F))
        np.testing.assert_array_equal(
            np.asarray(res.inliers), np.asarray(ref.inliers))
        assert int(res.best_iter) == int(ref.best_iter)


def test_ransac_adaptive_device_matches_host():
    """The device-side adaptive driver (confidence exit inside ONE
    lax.while_loop launch) returns the SAME winner and stop count as the
    host-driven chunk loop for the same key — both score the identical
    prefix of the fixed path's draw sequence through _score_chunk_body,
    and both evaluate the identical H&Z bound (host in Python floats,
    device in traced f64 under x64)."""
    from sfm_nerf_tpu.ops.epipolar import (
        ransac_fundamental_adaptive, ransac_fundamental_adaptive_device,
    )

    _, pts1, pts2, _ = two_view_correspondences(noise=0.3, outlier_frac=0.3)
    key = jax.random.key(11)
    p1 = jnp.asarray(pts1)
    p2 = jnp.asarray(pts2)
    res_h, used_h = ransac_fundamental_adaptive(
        key, p1, p2, confidence=0.999, max_iters=50000,
        threshold=5e-4, chunk=256,
    )
    res_d, used_d = ransac_fundamental_adaptive_device(
        key, p1, p2, confidence=0.999, max_iters=50000,
        threshold=5e-4, chunk=256,
    )
    assert int(used_d) == used_h
    assert int(res_d.best_iter) == int(res_h.best_iter)
    np.testing.assert_array_equal(np.asarray(res_d.F), np.asarray(res_h.F))
    np.testing.assert_array_equal(
        np.asarray(res_d.inliers), np.asarray(res_h.inliers))


def test_ransac_adaptive_device_bucketed_routing():
    """adaptive_device=True through the bucketed wrapper (padded points +
    traced n_valid) matches the host-driver route bit-for-bit, including
    the reported stop count."""
    from sfm_nerf_tpu.ops.epipolar import ransac_fundamental_bucketed

    _, pts1, pts2, _ = two_view_correspondences(
        noise=0.3, outlier_frac=0.3, n=300
    )
    key = jax.random.key(4)
    outs = {}
    for dev in (False, True):
        iters_out = []
        outs[dev] = (
            ransac_fundamental_bucketed(
                key, pts1, pts2, n_iters=50000, threshold=5e-4, chunk=256,
                confidence=0.999, iters_out=iters_out,
                adaptive_device=dev,
            ),
            iters_out[0],
        )
    res_h, used_h = outs[False]
    res_d, used_d = outs[True]
    assert used_d == used_h and used_h < 50000
    assert int(res_d.best_iter) == int(res_h.best_iter)
    np.testing.assert_array_equal(np.asarray(res_d.F), np.asarray(res_h.F))
    np.testing.assert_array_equal(
        np.asarray(res_d.inliers), np.asarray(res_h.inliers))


def test_ransac_pairs_adaptive_device_matches_host():
    """Pair-axis device-side adaptive driver == host-driven batched
    adaptive driver (winner per pair AND the shared stage stop count),
    mixed pair sizes through the pairs wrapper."""
    from sfm_nerf_tpu.ops.epipolar import ransac_fundamental_pairs_bucketed

    items = []
    for seed, n in zip(range(3), (250, 180, 250)):
        _, p1, p2, _ = two_view_correspondences(
            noise=0.3, n=n, outlier_frac=0.2, seed=20 + seed)
        items.append((jax.random.key(seed), p1, p2))
    outs = {}
    for dev in (False, True):
        iters_out = []
        outs[dev] = (
            ransac_fundamental_pairs_bucketed(
                items, n_iters=8192, chunk=256, confidence=0.999,
                iters_out=iters_out, adaptive_device=dev,
            ),
            iters_out,
        )
    res_h, used_h = outs[False]
    res_d, used_d = outs[True]
    assert used_d == used_h and max(used_h) < 8192
    for rh, rd in zip(res_h, res_d):
        assert int(rd.best_iter) == int(rh.best_iter)
        np.testing.assert_array_equal(np.asarray(rd.F), np.asarray(rh.F))
        np.testing.assert_array_equal(
            np.asarray(rd.inliers), np.asarray(rh.inliers))
