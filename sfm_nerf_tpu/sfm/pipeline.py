"""Incremental SfM: outlier refinement -> two-view init -> PnP registration
-> re-triangulation -> global bundle adjustment.

Host-side orchestration of the jitted ops, mirroring the reference driver
(Phase1/Wrapper.py:624-889) stage by stage, with its artifact filenames and
printouts.  Two DOCUMENTED deviations, both load-bearing for correctness:

1. Incremental triangulation uses the KNOWN global poses of both cameras
   (from two-view init / PnP) rather than re-deriving a relative pose from
   each pair's F via essential decomposition.  The reference re-decomposes
   per pair and treats the relative pose as global (Wrapper.py:739 ->
   triangulate:397), and also passes camera CENTERS where ``triangulate``
   expects translations (Wrapper.py:437-439 vs :739) — for camera 1 at the
   origin both coincide, which is why its two-view numbers are unaffected,
   but for j>1 the added points land in an inconsistent frame.
2. Like the reference, newly triangulated feature ids never overwrite
   existing 3D points (Wrapper.py:743-751).

Everything device-side is float64 on CPU / float32 on TPU — RANSAC scoring
(the hot loop) is precision-insensitive after Hartley normalization; the
solvers accept either dtype.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sfm_nerf_tpu.utils.buckets import pow2_bucket
import numpy as np

from sfm_nerf_tpu.config import SfMConfig
from sfm_nerf_tpu.io import artifacts as art
from sfm_nerf_tpu.io.sfm_data import (
    load_calibration,
    load_images,
    parse_matching_files,
)
from sfm_nerf_tpu.ops.ba import (
    RC_from_camera_params,
    bundle_adjust,
    camera_params_from_RC,
    fix_gauge_to_first_camera,
)
from sfm_nerf_tpu.ops.epipolar import (
    cleanup_essential,
    decompose_essential,
    essential_from_fundamental,
    ransac_fundamental_bucketed,
)
from sfm_nerf_tpu.ops.pnp import (
    nonlinear_pnp_bucketed,
    pnp_ransac_bucketed,
    pnp_ransac_f64_host,
)
from sfm_nerf_tpu.ops.triangulation import (
    disambiguate_pose,
    projection_matrix_RC,
    project,
    relative_pose_pairs,
    reprojection_errors,
    triangulate_linear,
    triangulate_nonlinear,
    triangulate_pair_bucketed,
)


def _reproj_err_px(K, R, C, X, uv):
    """Host-side per-point reprojection error |proj(X) - uv| in px
    (numpy — gate sites run per camera/view on the host where a device
    launch would pay tunnel RTT).  Points at or behind the camera plane
    (z <= 1e-8) and non-finite projections map to +inf, so callers can
    gate with ``err <= thresh`` / ``np.isfinite(err)`` uniformly."""
    K = np.asarray(K)
    R = np.asarray(R)
    C = np.asarray(C).reshape(3)
    xc = (np.asarray(X) - C) @ R.T
    z = xc[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = K[0, 0] * xc[:, 0] / z + K[0, 2]
        v = K[1, 1] * xc[:, 1] / z + K[1, 2]
        e = np.hypot(u - np.asarray(uv)[:, 0], v - np.asarray(uv)[:, 1])
    return np.where((z > 1e-8) & np.isfinite(e), e, np.inf)


def _mean_err_px_np(K, R, C, X, uv, w) -> float:
    """Host-side weighted-mean Euclidean pixel error — the numpy mirror of
    ops.pnp.reprojection_error_mean_px (P = K R [I|-C], plain perspective
    divide, no gating) for the per-registration stat prints.  These run
    once per camera with that camera's raw correspondence count, so on a
    relay-attached accelerator each print would load a fresh per-shape
    executable chain; the quantity is informational (reference parity:
    PnP.py:132-158 prints) and f64 numpy on the host is both exact and
    free."""
    K = np.asarray(K, np.float64)
    R = np.asarray(R, np.float64)
    C = np.asarray(C, np.float64).reshape(3)
    P = K @ R @ np.hstack([np.eye(3), -C[:, None]])
    Xh = np.hstack([np.asarray(X, np.float64), np.ones((len(X), 1))])
    x = Xh @ P.T
    proj = x[:, :2] / x[:, 2:3]
    err = np.linalg.norm(proj - np.asarray(uv, np.float64), axis=-1)
    w = np.asarray(w, np.float64)
    return float(np.sum(err * w) / max(np.sum(w), 1.0))


@dataclasses.dataclass
class TwoViewResult:
    C: np.ndarray
    R: np.ndarray
    X: np.ndarray                      # refined 3D points (N,3)
    X_linear: np.ndarray
    all_candidate_points: np.ndarray   # (4,N,3) for the x-vs-z plot
    mean_error_linear: float           # mean px error over both frames
    mean_error_nonlinear: float
    per_frame_linear: Tuple[float, float]
    per_frame_nonlinear: Tuple[float, float]


class SfMPipeline:
    def __init__(self, cfg: SfMConfig):
        self.cfg = cfg
        self.key = jax.random.key(cfg.seed)
        self.stats: Dict = {}
        # point-axis bucket policy (SfMConfig.bucket_floor): merge the
        # small pow2 buckets into one on accelerator backends, where each
        # distinct executable pays a one-time per-process relay load.
        # bucket_floor=-1 (auto) is resolved lazily at the first bucketed
        # dispatch — constructing a pipeline must not initialize a backend
        # (advisor r4: the eager jax.default_backend() probe here pulled up
        # the relay TPU even for runs that force CPU later)
        from sfm_nerf_tpu.utils.buckets import set_point_bucket_floor

        set_point_bucket_floor(cfg.bucket_floor)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------------------
    def refine_all_matches(self, matches_dict, all_feature_points, visibility):
        """Per-pair F-RANSAC; drop outlier observations from tracks+mask
        (Phase1/Wrapper.py:236-290)."""
        cfg = self.cfg
        refined = {}
        mesh = None
        if cfg.ransac_devices > 1:
            # hypothesis-parallel RANSAC over a device mesh
            # (parallel/ransac.py; bit-equal to the single-device path
            # when the device count divides ceil(n_iters/chunk) — else
            # the chunk count rounds up and the draw sequence differs;
            # see config.ransac_devices)
            from sfm_nerf_tpu.parallel import make_mesh

            n_avail = len(jax.devices())
            if n_avail < cfg.ransac_devices:
                raise ValueError(
                    f"--ransac_devices {cfg.ransac_devices} but only "
                    f"{n_avail} JAX device(s) available; on CPU set "
                    f"XLA_FLAGS=--xla_force_host_platform_device_count="
                    f"{cfg.ransac_devices} before the first jax import"
                )
            mesh = make_mesh(dp=cfg.ransac_devices, tp=1)
        adaptive_iters: list = []
        pairs = sorted(matches_dict.items())
        if cfg.ransac_batch_pairs and mesh is None:
            # pair-axis batched: the whole stage is one launch per shape
            # bucket instead of one per pair (bit-equal per pair — the key
            # stream below is exactly the sequential loop's)
            from sfm_nerf_tpu.ops.epipolar import (
                ransac_fundamental_pairs_bucketed,
            )

            results = ransac_fundamental_pairs_bucketed(
                [(self._next_key(), arr[:, 0:2], arr[:, 2:4])
                 for _, arr in pairs],
                n_iters=cfg.ransac_iters, threshold=cfg.ransac_threshold,
                normalize=cfg.normalize, scoring=cfg.ransac_scoring,
                confidence=cfg.ransac_confidence, iters_out=adaptive_iters,
                adaptive_device=cfg.ransac_adaptive_device,
            )
        else:
            results = [
                # bucketed: one accelerator compile per size bucket, not
                # per pair; mesh=None -> single-device core, else
                # hypothesis-sharded
                ransac_fundamental_bucketed(
                    self._next_key(), arr[:, 0:2], arr[:, 2:4],
                    n_iters=cfg.ransac_iters, threshold=cfg.ransac_threshold,
                    normalize=cfg.normalize, scoring=cfg.ransac_scoring,
                    mesh=mesh, confidence=cfg.ransac_confidence,
                    iters_out=adaptive_iters,
                    adaptive_device=cfg.ransac_adaptive_device,
                )
                for _, arr in pairs
            ]
        for ((i, j), arr), res in zip(pairs, results):
            inliers = np.asarray(res.inliers)
            used = (
                f" ({adaptive_iters[len(refined)]}/{cfg.ransac_iters} iters)"
                if adaptive_iters else ""
            )
            print(
                f"RANSAC: Found {int(res.n_inliers)} inliers out of "
                f"{len(arr)} matches.{used}"
            )
            refined[(i, j)] = (np.asarray(res.F), arr[inliers])
            for row in arr[~inliers]:
                f_idx = int(row[-1])
                for img in (i, j):
                    if img in all_feature_points[f_idx]:
                        del all_feature_points[f_idx][img]
                        visibility[img][f_idx] = 0
        return refined, all_feature_points, visibility

    # ------------------------------------------------------------------
    def two_view_reconstruct(
        self, K, F, R1, C1, pts1, pts2,
        images: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        emit_artifacts: bool = False,
    ) -> TwoViewResult:
        """F -> E -> 4 poses -> batched DLT -> cheirality -> vmapped LM
        refinement (the reference's ``triangulate``, Wrapper.py:397-594)."""
        cfg = self.cfg
        Kj = jnp.asarray(K)
        if cfg.essential_method == "5pt":
            # direct minimal-solver estimate on the already-refined matches
            # (ADDITION: the reference only knows F->E conjugation)
            from sfm_nerf_tpu.ops.essential5 import ransac_essential_5pt

            E_np, _ = ransac_essential_5pt(
                np.asarray(pts1), np.asarray(pts2), np.asarray(K),
                n_iters=cfg.e5_ransac_iters,
                threshold_px=cfg.e5_threshold_px,
                seed=cfg.seed,
            )
            E = jnp.asarray(E_np)
        else:
            E = essential_from_fundamental(Kj, jnp.asarray(F))
        if cfg.essential_cleanup:
            E = cleanup_essential(E)
        Cs, Rs = decompose_essential(E, cfg.center_convention)
        X_lin, C2, R2, all_pts, _ = disambiguate_pose(
            Kj, Cs, Rs, jnp.asarray(pts1), jnp.asarray(pts2),
            R1=jnp.asarray(R1), T1=jnp.asarray(-R1 @ np.asarray(C1).reshape(3)),
        )
        e1_lin = np.sqrt(np.asarray(reprojection_errors(
            Kj, jnp.asarray(R1), jnp.asarray(C1).reshape(3), X_lin,
            jnp.asarray(pts1))))
        e2_lin = np.sqrt(np.asarray(reprojection_errors(
            Kj, R2, C2, X_lin, jnp.asarray(pts2))))

        X_opt, _, _ = triangulate_nonlinear(
            Kj, jnp.asarray(R1), jnp.asarray(C1).reshape(3), R2, C2,
            jnp.asarray(pts1), jnp.asarray(pts2), X_lin,
            n_iters=cfg.tri_refine_iters,
        )

        if cfg.two_view_refine_pose:
            # Joint pose+points refinement: the reference refines POINTS only
            # under the E-decomposition pose, whose center-convention quirk
            # leaves a systematic floor (measured ~1.9 px mean on the bundled
            # pair vs 1.46 px even for a cv2 oracle pose).  A 2-camera BA with
            # camera 1 gauge-fixed removes the pose error entirely.
            R1j = jnp.asarray(R1)
            C1j = jnp.asarray(C1).reshape(3)
            cams2 = camera_params_from_RC(
                jnp.stack([R1j, R2]), jnp.stack([C1j, C2])
            )
            obs2 = jnp.stack([jnp.asarray(pts1), jnp.asarray(pts2)])
            vis2 = jnp.ones(obs2.shape[:2], Kj.dtype)
            ba2 = bundle_adjust(
                Kj, cams2, X_opt, obs2, vis2, n_iters=cfg.ba_max_iters
            )
            cams_fx, pts_fx = fix_gauge_to_first_camera(
                ba2.camera_params, ba2.points
            )
            # map back from the gauge-fixed frame (== original camera-1
            # camera frame, x' = R1 X_world + t1) to world coordinates:
            # X_w = R1^T (X' - t1);  R2_w = R2' R1;  C2_w = R1^T C2' + C1
            # HI: plain matmuls demote to bf16 on TPU (~0.2% on poses —
            # the exact leak the geometry-op HI sweep closed; review catch)
            HI = jax.lax.Precision.HIGHEST
            t1 = -jnp.matmul(R1j, C1j, precision=HI)
            Rs_fx, Cs_fx = RC_from_camera_params(cams_fx)
            R2_ba = jnp.matmul(Rs_fx[1], R1j, precision=HI)
            C2_ba = jnp.einsum("ji,j->i", R1j, Cs_fx[1], precision=HI) + C1j
            X_ba = jnp.matmul(pts_fx - t1, R1j, precision=HI)

            # bundle_adjust freezes its cheirality mask at the INITIAL
            # geometry (ops/ba.py:82-92): a two-view point behind either
            # camera loses that camera's residuals, leaving <=1 active view
            # -> unconstrained along its ray, and LM slides it arbitrarily
            # (measured: 0.27 px init -> individual masked points at 300 /
            # 5500 px after BA while the constrained median IMPROVED to
            # 0.16 px).  Keep the per-point LM-refined estimate for those
            # points; take the BA result only for fully-constrained ones.
            z1b = jnp.einsum("ij,nj->ni", R1j, X_opt - C1j)[:, 2]
            z2b = jnp.einsum("ij,nj->ni", R2, X_opt - C2)[:, 2]
            constrained = (z1b > 1e-8) & (z2b > 1e-8)
            X_ba = jnp.where(constrained[:, None], X_ba, X_opt)

            # accept the refined pose only if it actually reduced the mean
            # error — a joint BA is a refinement and must never make the
            # two-view solution worse (a near-degenerate inlier set can
            # put LM in a bad basin; the 5-point path hit this in round 1)
            def _mean_err(Rb, Cb, Xb):
                ea = reprojection_errors(Kj, R1j, C1j, Xb, jnp.asarray(pts1))
                eb = reprojection_errors(Kj, Rb, Cb, Xb, jnp.asarray(pts2))
                return float(jnp.sqrt(ea).mean() + jnp.sqrt(eb).mean()) / 2
            if _mean_err(R2_ba, C2_ba, X_ba) <= _mean_err(R2, C2, X_opt):
                R2, C2, X_opt = R2_ba, C2_ba, X_ba

        e1_nl = np.sqrt(np.asarray(reprojection_errors(
            Kj, jnp.asarray(R1), jnp.asarray(C1).reshape(3), X_opt,
            jnp.asarray(pts1))))
        e2_nl = np.sqrt(np.asarray(reprojection_errors(
            Kj, R2, C2, X_opt, jnp.asarray(pts2))))

        result = TwoViewResult(
            C=np.asarray(C2), R=np.asarray(R2), X=np.asarray(X_opt),
            X_linear=np.asarray(X_lin),
            all_candidate_points=np.asarray(all_pts),
            mean_error_linear=float((e1_lin.mean() + e2_lin.mean()) / 2),
            mean_error_nonlinear=float((e1_nl.mean() + e2_nl.mean()) / 2),
            per_frame_linear=(float(e1_lin.mean()), float(e2_lin.mean())),
            per_frame_nonlinear=(float(e1_nl.mean()), float(e2_nl.mean())),
        )
        print("number of triangulated points:", len(result.X))
        print(
            "Mean Reprojection error after linear triangulation error: "
            f"{result.mean_error_linear}"
        )
        print(
            "Mean Reprojection error after non linear triangulation error: "
            f"{result.mean_error_nonlinear}"
        )

        if emit_artifacts:
            art.save_x_vs_z_plot(result.all_candidate_points, cfg.output_dir)
            art.save_3d_points_plot(
                result.X_linear, result.C, result.X, cfg.output_dir
            )
            if images is not None:
                P1 = projection_matrix_RC(
                    Kj, jnp.asarray(R1), jnp.asarray(C1).reshape(3))
                P2 = projection_matrix_RC(Kj, R2, C2)
                for stage, Xs in (
                    ("lineartriangulation", X_lin),
                    ("nonlineartriangulation", X_opt),
                ):
                    art.save_projection_overlays(
                        images[0], images[1],
                        np.asarray(project(P1, Xs)), np.asarray(project(P2, Xs)),
                        pts1, pts2, stage, cfg.output_dir,
                    )
        return result

    # ------------------------------------------------------------------
    def _select_init_pair(self, refined, K) -> Tuple[int, int]:
        """Score candidate initial pairs (ADDITION — keyframe selection;
        the reference hardcodes (1,2), Phase1/Wrapper.py:666): inlier
        support x median triangulation parallax over the top candidates
        by inlier count.  A high-inlier pair with ~zero baseline
        triangulates garbage depth; a wide-baseline pair with a handful
        of matches is noise-limited — the product (parallax capped at
        20 deg, medians below cfg.min_parallax_deg rejected) rewards
        both."""
        cfg = self.cfg
        Kj = jnp.asarray(K)
        cands = sorted(refined.items(), key=lambda kv: -len(kv[1][1]))[:5]
        best, best_score = None, -1.0
        scores: Dict[Tuple[int, int], float] = {}
        for (i, j), (F, m) in cands:
            if len(m) < 8:
                continue
            E = essential_from_fundamental(Kj, jnp.asarray(F))
            if cfg.essential_cleanup:
                E = cleanup_essential(E)
            Cs, Rs = decompose_essential(E, cfg.center_convention)
            # bucket the match count (cyclic-repeat pad, slice the outputs)
            # so the 5 candidate pairs share a compile instead of paying one
            # multi-minute remote compile per distinct shape (the same
            # policy every other per-pair dispatch uses).  n_valid masks the
            # padded rows out of the cheirality vote, so the pose pick is
            # exactly bucket-floor-invariant (advisor r4).
            n = len(m)
            bucket = pow2_bucket(n)
            p1 = np.resize(np.asarray(m[:, 0:2]), (bucket, 2))
            p2 = np.resize(np.asarray(m[:, 2:4]), (bucket, 2))
            X, C2, R2, _, _ = disambiguate_pose(
                Kj, Cs, Rs, jnp.asarray(p1), jnp.asarray(p2),
                n_valid=jnp.asarray(n, jnp.int32))
            X = np.asarray(X)[:n]
            C2 = np.asarray(C2).reshape(3)
            R2n = np.asarray(R2)
            # cheirality-valid points only (camera i at the origin here)
            z1 = X[:, 2]
            z2 = (X - C2) @ R2n[2]
            ok = np.isfinite(X).all(axis=1) & (z1 > 1e-8) & (z2 > 1e-8)
            if int(ok.sum()) < 8:
                scores[(i, j)] = 0.0
                continue
            r1 = X[ok]
            r2 = X[ok] - C2
            cosang = np.sum(r1 * r2, axis=1) / (
                np.linalg.norm(r1, axis=1) * np.linalg.norm(r2, axis=1)
                + 1e-12)
            med = float(np.median(
                np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0)))))
            if med < cfg.min_parallax_deg:
                scores[(i, j)] = 0.0
                continue
            score = float(ok.sum()) * min(med, 20.0)
            scores[(i, j)] = score
            if score > best_score:
                best, best_score = (i, j), score
        if best is None:
            best = (1, 2) if (1, 2) in refined else cands[0][0]
        print(f"Initial pair (auto): {best}")
        self.stats["init_pair"] = {
            "pair": list(best),
            "scores": {f"{p[0]}_{p[1]}": s for p, s in scores.items()},
        }
        return best

    # ------------------------------------------------------------------
    def register_camera(self, i, obj_points, img_points, K):
        """PnPRANSAC + NonlinearPnP (the reference's get_pose,
        Wrapper.py:597-620)."""
        cfg = self.cfg
        # bucketed: one accelerator compile per size bucket, not one per
        # camera's correspondence count (remote compiles cost minutes)
        res = pnp_ransac_bucketed(
            self._next_key(), obj_points, img_points, K,
            n_iters=cfg.pnp_iters, threshold=cfg.pnp_threshold,
            scoring=cfg.ransac_scoring, confidence=cfg.ransac_confidence,
            adaptive_device=cfg.ransac_adaptive_device,
        )
        rescue_on = cfg.pnp_f64_rescue == "on" or (
            cfg.pnp_f64_rescue == "auto"
            and not bool(jax.config.jax_enable_x64))
        if int(res.n_inliers) < 6 and rescue_on:
            # f64 host rescue (ADDITION, no reference counterpart): the
            # f32 device DLT hypothesis space collapses for a handful of
            # deep-chain cameras at scale (measured: 2/200 and 8/500
            # registrations lost, PERFORMANCE.md round-5).  Re-run THIS
            # camera's RANSAC in pure-numpy float64 on the host —
            # independent of the process-wide x64 flag, which cannot be
            # flipped mid-run on an accelerator — before giving up.
            # Skipped when x64 is on (the main path was already f64).
            n_prior = self.stats.get("pnp_failures", {}).get(i, 0)
            res_h = pnp_ransac_f64_host(
                cfg.seed * 1000003 + i * 31 + n_prior,
                obj_points, img_points, K,
                n_iters=cfg.pnp_iters, threshold=cfg.pnp_threshold,
                scoring=cfg.ransac_scoring,
            )
            if int(res_h.n_inliers) >= 6:
                print(
                    f"PnP f64 host rescue for image {i}: "
                    f"{int(res_h.n_inliers)} inliers"
                )
                self.stats.setdefault("pnp_rescues", {})[i] = int(
                    res_h.n_inliers)
                res = res_h
        if int(res.n_inliers) < 6:
            print(f"Not enough inliers for reliable PnP with image {i}")
            fails = self.stats.setdefault("pnp_failures", {})
            fails[i] = fails.get(i, 0) + 1
            dump_dir = os.environ.get("SFM_NERF_DUMP_PNP_FAILURES")
            if dump_dir:
                # debugging aid: capture the exact failing inputs so the
                # consensus collapse can be replayed offline on any
                # platform/dtype (used to root-cause the 200-camera f32
                # registration failures)
                os.makedirs(dump_dir, exist_ok=True)
                np.savez(
                    os.path.join(dump_dir, f"fail_cam{i}_try{fails[i]}.npz"),
                    obj=np.asarray(obj_points), img=np.asarray(img_points),
                    K=np.asarray(K), n_inliers=int(res.n_inliers),
                )
            return None, None
        w = np.asarray(res.inliers, np.float64)
        err_lin = _mean_err_px_np(
            K, res.R, res.C, obj_points, img_points, w)
        C, R, rms = nonlinear_pnp_bucketed(
            K, res.R, res.C, obj_points, img_points, w,
            n_iters=cfg.pnp_refine_iters,
        )
        err_nl = _mean_err_px_np(K, R, C, obj_points, img_points, w)
        print(
            f"Error after linear PnP: {err_lin}, "
            f"Error after non-linear PnP: {err_nl}"
        )
        self.stats.setdefault("pnp_errors", {})[i] = (err_lin, err_nl)
        return np.asarray(C), np.asarray(R)

    # ------------------------------------------------------------------
    def _triangulate_feature_groups(self, K, camera_info, tracks, groups,
                                    fidx_to_3d, on_new=None) -> int:
        """Triangulate each ``(i, j) -> [feature]`` group from views i/j
        under the current poses (batched per view pair) and write the
        results into ``fidx_to_3d``.  Writes are finite+cheirality-gated:
        a degenerate result (near-zero baseline -> inf/NaN; or the point
        lands behind either camera) keeps the previous estimate / stays
        unmapped.  Returns the number of NEWLY mapped features;
        ``on_new`` fires for each."""
        cfg = self.cfg
        added = 0
        for (i, j), fs in groups.items():
            p1 = np.asarray([tracks[f][i][:2] for f in fs])
            p2 = np.asarray([tracks[f][j][:2] for f in fs])
            Ri = camera_info[i]["R"]
            Ci = np.asarray(camera_info[i]["C"]).reshape(3)
            Rj = camera_info[j]["R"]
            Cj = np.asarray(camera_info[j]["C"]).reshape(3)
            _, Xn = triangulate_pair_bucketed(
                K, Ri, Ci, Rj, Cj, p1, p2, n_iters=cfg.tri_refine_iters,
            )
            Rin, Rjn = np.asarray(Ri), np.asarray(Rj)
            z1 = (Xn - Ci) @ Rin[2]
            z2 = (Xn - Cj) @ Rjn[2]
            ok = np.isfinite(Xn).all(axis=1) & (z1 > 1e-8) & (z2 > 1e-8)
            if cfg.tri_reproj_gate_px > 0:
                # source-view reprojection gate (tri_reproj_gate_px): a
                # refinement that cannot reproject into its OWN two views
                # is solver junk, not geometry — keep it out of the map
                for Rv, Cv, pv in ((Rin, Ci, p1), (Rjn, Cj, p2)):
                    ok &= (_reproj_err_px(K, Rv, Cv, Xn, pv)
                           <= cfg.tri_reproj_gate_px)
            for f, x, good in zip(fs, Xn, ok):
                if good:
                    if f not in fidx_to_3d:
                        added += 1
                        if on_new is not None:
                            on_new(f)
                    fidx_to_3d[f] = x
        return added

    # ------------------------------------------------------------------
    def _retriangulate_all(self, K, camera_info, tracks, fidx_to_3d,
                           cam_ids) -> None:
        """Re-triangulate every mapped feature from its first/last
        registered views under the CURRENT camera poses, updating
        ``fidx_to_3d`` in place (gated — see _triangulate_feature_groups)."""
        groups: Dict[Tuple[int, int], list] = {}
        for f in list(fidx_to_3d):
            views = [c for c in cam_ids if c in tracks[f]]
            if len(views) >= 2:
                groups.setdefault((views[0], views[-1]), []).append(f)
        self._triangulate_feature_groups(
            K, camera_info, tracks, groups, fidx_to_3d)

    # ------------------------------------------------------------------
    def _map_unmapped_from_tracks(self, K, camera_info, tracks, fidx_to_3d,
                                  on_new=None) -> int:
        """Triangulate UNMAPPED features directly from their TRACK
        observations in two registered views (first/last), cheirality-
        gated.  Matching files namespace features by their FIRST image
        (io/sfm_data.py module docstring), so a feature first seen by a
        still-unregistered image never appears in a refined pair between
        two registered cameras — orderings that don't start at image 1
        (--init_pair auto / --view_order greedy) need this pass to
        un-strand those images (ADDITION; the reference's fixed order
        never hits the case)."""
        reg = sorted(camera_info)
        groups: Dict[Tuple[int, int], list] = {}
        for f, track in enumerate(tracks):
            if f in fidx_to_3d:
                continue
            views = [c for c in reg if c in track]
            if len(views) >= 2:
                groups.setdefault((views[0], views[-1]), []).append(f)
        return self._triangulate_feature_groups(
            K, camera_info, tracks, groups, fidx_to_3d, on_new=on_new)

    # ------------------------------------------------------------------
    def _intermediate_ba(self, K, camera_info, fidx_to_3d, tracks):
        """Light global BA over the registered-so-far reconstruction
        (``--ba_interval``, ADDITION — the reference registers every camera
        and adjusts once at the end, Phase1/Wrapper.py:679-788).  At 100+
        cameras the incremental chain drifts (measured 24.7 px RMS initial
        geometry at 200 cameras) and the single final BA converges into a
        poor basin; adjusting every K registrations keeps the geometry that
        later PnP solves against tight.

        Both the camera and point axes are pow2-bucketed (padded cameras sit
        at the identity with zero visibility — their damped Schur diagonal
        is lam*I — padded points likewise), so a whole incremental run
        compiles O(log^2) distinct BA programs instead of one per
        registration: remote TPU compiles cost minutes each.  Gross
        outliers are gated on the HOST at the current geometry (numpy —
        per-camera device launches would pay tunnel RTT), mirroring the
        final pre-BA gate.  Poses and points are written back in place;
        the LM accept/reject loop guarantees the cost never worsens under
        its own mask.
        """
        cfg = self.cfg
        camera_ids = sorted(camera_info.keys())
        feat_ids = [
            f for f in fidx_to_3d
            if sum(1 for c in camera_ids if c in tracks[f]) >= 2
        ]
        n_cam, m_pts = len(camera_ids), len(feat_ids)
        if n_cam < 2 or m_pts < 8:
            return
        Rs = np.stack([camera_info[c]["R"] for c in camera_ids])
        Cs = np.stack([
            np.asarray(camera_info[c]["C"]).reshape(3) for c in camera_ids
        ])
        pts_real = np.stack([fidx_to_3d[f] for f in feat_ids])
        nb = pow2_bucket(n_cam, floor=8)
        mb = pow2_bucket(m_pts)
        rowmap = {c: ri for ri, c in enumerate(camera_ids)}
        obs = np.full((nb, mb, 2), -1.0)
        vis = np.zeros((nb, mb))
        for col, f in enumerate(feat_ids):
            for c, uv in tracks[f].items():
                ri = rowmap.get(c)
                if ri is not None:
                    obs[ri, col] = uv[:2]
                    vis[ri, col] = 1.0

        # host-side gross-outlier gate at the current geometry
        errs = np.full((nb, mb), np.inf)
        for ri in range(n_cam):
            errs[ri, :m_pts] = _reproj_err_px(
                K, Rs[ri], Cs[ri], pts_real, obs[ri, :m_pts])
        sel = (vis > 0) & np.isfinite(errs)
        med = float(np.median(errs[sel])) if sel.any() else 0.0
        thresh = max(5.0 * cfg.ba_prune_px, 10.0 * med)
        # NaN/inf compare False -> drop; same 50%-cap as the final pre-BA
        # gate below: with bimodal errors (a tight cluster + a drifted
        # cluster the intermediate BA exists to CORRECT) an uncapped gate
        # would discard the drifted evidence and refit to the remainder
        drop = ~(errs <= thresh) & (vis > 0)
        if drop.sum() <= 0.5 * vis.sum():
            vis_work = vis * (~drop)
        else:
            vis_work = vis

        cams0 = np.zeros((nb, 6))
        cams0[:n_cam] = np.asarray(camera_params_from_RC(
            jnp.asarray(Rs), jnp.asarray(Cs)))
        pts0 = np.zeros((mb, 3))
        pts0[:m_pts] = pts_real
        res = bundle_adjust(
            jnp.asarray(K), jnp.asarray(cams0), jnp.asarray(pts0),
            jnp.asarray(obs), jnp.asarray(vis_work),
            n_iters=cfg.ba_interval_iters,
            loss=cfg.ba_loss, huber_delta=cfg.ba_huber_delta,
        )
        n_obs = max(float(res.n_residuals), 1.0)
        rb = float(np.sqrt(2 * float(res.initial_cost) / n_obs))
        ra = float(np.sqrt(2 * float(res.cost) / n_obs))
        Rs_n, Cs_n = RC_from_camera_params(res.camera_params)
        Rs_n, Cs_n = np.asarray(Rs_n), np.asarray(Cs_n)
        for ri, c in enumerate(camera_ids):
            camera_info[c] = {"R": Rs_n[ri], "C": Cs_n[ri]}
        pts_new = np.asarray(res.points)
        for col, f in enumerate(feat_ids):
            fidx_to_3d[f] = pts_new[col]
        print(
            f"  Intermediate BA ({n_cam} cams, {m_pts} pts, bucket "
            f"{nb}x{mb}): RMS {rb:.2f} -> {ra:.2f} px over {int(n_obs)} obs"
        )
        self.stats.setdefault("intermediate_ba", []).append({
            "n_cams": n_cam, "n_points": m_pts,
            "rms_px_before": rb, "rms_px_after": ra, "n_obs": int(n_obs),
        })

    def run(self) -> Dict:
        cfg = self.cfg
        t_start = time.time()
        # wall-clock per stage (deltas), printed at the end and saved in
        # stats["stage_seconds"] — on the tunneled TPU the host-loop RTT
        # dominates and this is the attribution tool
        stage_log: list = []

        def _stage(name):
            prev = stage_log[-1][1] if stage_log else 0.0
            now = time.time() - t_start
            stage_log.append((name, now, now - prev))

        images = load_images(cfg.data_path, cfg.num_images)
        K = load_calibration(f"{cfg.data_path}/calibration.txt")
        print("Camera intrinsic matrix K:")
        print(K)
        matches_dict, tracks, visibility = parse_matching_files(
            cfg.data_path, cfg.num_images
        )
        _stage("load+parse")
        refined, tracks, visibility = self.refine_all_matches(
            matches_dict, tracks, visibility
        )
        _stage("ransac_refine")
        if cfg.merge_tracks:
            # Merge AFTER per-pair RANSAC refinement: (a) unions are built
            # from verified observations only, and (b) one pair's outlier
            # verdict can no longer delete an observation that another
            # pair's inliers vouch for (refine's per-image deletion was
            # scoped to single-file tracks; merged tracks span files).
            from sfm_nerf_tpu.sfm.tracks import merge_tracks

            n_before = len(tracks)
            inlier_matches = {pair: m for pair, (_, m) in refined.items()}
            remapped, tracks, visibility, _ = merge_tracks(
                inlier_matches, tracks, tol=cfg.merge_tol
            )
            refined = {
                pair: (F, remapped[pair]) for pair, (F, _) in refined.items()
            }
            print(f"Track merging: {n_before} -> {len(tracks)} tracks")
            self.stats["track_merge"] = {
                "before": n_before, "after": len(tracks)
            }

        # --- two-view initialization -----------------------------------
        # reference: hardcoded pair (1,2) (Wrapper.py:666); --init_pair
        # auto scores candidates by inliers x parallax (ADDITION)
        init_pair = (1, 2)
        if cfg.init_pair == "auto":
            init_pair = self._select_init_pair(refined, K)
        a, b = init_pair
        F12, m12 = refined[init_pair]
        # load_images keeps unreadable frames as None placeholders so these
        # 1-based indexes stay aligned; both frames must have decoded
        have_imgs = (
            len(images) >= max(a, b)
            and images[a - 1] is not None
            and images[b - 1] is not None
        )
        if have_imgs:
            art.save_match_visualization(
                images[a - 1], images[b - 1], m12, cfg.output_dir,
                name=f"feature_matches_{a}_{b}.png",
            )
        camera_info = {a: {"R": np.eye(3), "C": np.zeros(3)}}
        tv = self.two_view_reconstruct(
            K, F12, camera_info[a]["R"], camera_info[a]["C"],
            m12[:, 0:2], m12[:, 2:4],
            images=(images[a - 1], images[b - 1]) if have_imgs else None,
            emit_artifacts=True,
        )
        camera_info[b] = {"R": tv.R, "C": tv.C}
        self.stats["two_view"] = {
            "linear": tv.per_frame_linear, "nonlinear": tv.per_frame_nonlinear,
            "mean_linear": tv.mean_error_linear,
            "mean_nonlinear": tv.mean_error_nonlinear,
        }

        fidx_to_3d: Dict[int, np.ndarray] = {
            int(row[-1]): tv.X[n] for n, row in enumerate(m12)
        }
        _stage("two_view_init")

        # --- incremental registration ---------------------------------
        # support[i] = number of mapped features observed by unregistered
        # image i, maintained incrementally as points are added.  Index
        # order (reference, Wrapper.py:679) visits each image once,
        # ascending; greedy (--view_order greedy, ADDITION) registers the
        # best-supported view next, which also reaches images that index
        # order would have visited before their support existed.
        support: Dict[int, int] = {
            i: 0
            for i in range(1, cfg.num_images + 1) if i not in camera_info
        }

        def _count_support(f_idx):
            for img in tracks[f_idx]:
                if img in support:
                    support[img] += 1

        for f_idx in fidx_to_3d:
            _count_support(f_idx)

        since_ba = 0
        # ADDITION (no reference counterpart — the reference's single
        # ascending pass over 5 images never fails): a camera whose PnP
        # fails is retried in a later pass instead of being dropped for
        # good.  At 200-camera chain depth a failure is usually *drift at
        # that moment*, not a property of the image — after more
        # registrations (and an intermediate BA correcting the map) the
        # same camera's inlier set recovers.  Bounded by
        # cfg.registration_retries passes; a pass that registers nothing
        # ends the retries early.
        failed: list = []
        retries_left = cfg.registration_retries
        progressed = True
        while True:
            if not support:
                if not (failed and retries_left > 0 and progressed):
                    break
                # refresh the map first when interval BA is on — the
                # whole point of the retry is that geometry has improved
                # since the failure
                if cfg.ba_interval > 0 and since_ba > 0:
                    self._intermediate_ba(K, camera_info, fidx_to_3d, tracks)
                    since_ba = 0
                print(
                    f"  Retry pass "
                    f"{cfg.registration_retries - retries_left + 1}: "
                    f"re-attempting {len(failed)} skipped images."
                )
                for r in failed:
                    support[r] = sum(
                        1 for f_idx in fidx_to_3d if r in tracks[f_idx]
                    )
                failed = []
                retries_left -= 1
                progressed = False
            if cfg.view_order == "greedy":
                i = max(support, key=support.get)
                if support[i] < 8:
                    # stalled: try mapping unmapped multi-view tracks
                    # directly (features first seen by an unregistered
                    # image are invisible to the pair-based triangulation
                    # above — see _map_unmapped_from_tracks)
                    added = self._map_unmapped_from_tracks(
                        K, camera_info, tracks, fidx_to_3d,
                        on_new=_count_support,
                    )
                    if added:
                        print(
                            f"  Track-completion pass mapped {added} "
                            "points; retrying registration."
                        )
                        continue
                    print(
                        f"  Best remaining view {i} has only {support[i]} "
                        "2D-3D correspondences; stopping registration."
                    )
                    break
            else:
                i = min(support)           # reference: ascending index
            del support[i]
            print(f"Registering Image: {i} ......")
            obj_points, img_points = [], []
            for f_idx, xyz in fidx_to_3d.items():
                if i in tracks[f_idx]:
                    u, v = tracks[f_idx][i][:2]
                    obj_points.append(xyz)
                    img_points.append([u, v])
            if len(obj_points) < 8:
                print(
                    f"  Not enough 2D-3D correspondences to solve PnP for "
                    f"image {i}. Skipping."
                )
                failed.append(i)
                continue
            C, R = self.register_camera(
                i, np.asarray(obj_points), np.asarray(img_points), K
            )
            if C is None:
                print(f"  Could not estimate camera pose for image {i}. Skipping.")
                failed.append(i)
                continue
            camera_info[i] = {"R": R, "C": C}

            # triangulate NEW points against every other registered camera
            for j in sorted(camera_info):
                if j == i:
                    continue
                pair = (j, i) if j < i else (i, j)
                if pair not in refined:
                    print(f"No matches for pair {pair}. Skipping.")
                    continue
                _, matches = refined[pair]
                new_rows = [
                    row for row in matches if int(row[-1]) not in fidx_to_3d
                ]
                if not new_rows:
                    continue
                arr = np.asarray(new_rows)
                # matching rows store (min-image cols 0:2, max-image 2:4)
                p_j, p_i = (
                    (arr[:, 0:2], arr[:, 2:4]) if j < i
                    else (arr[:, 2:4], arr[:, 0:2])
                )
                Rj, Cj = camera_info[j]["R"], camera_info[j]["C"]
                # deviation 1: triangulate with KNOWN global poses
                # (bucketed: one compile per size bucket across all pairs)
                _, Xnew = triangulate_pair_bucketed(
                    K, Rj, Cj, R, C, p_j, p_i,
                    n_iters=cfg.tri_refine_iters,
                )
                # finite+cheirality gate, like every other triangulation
                # site (the reference inserts ungated, Wrapper.py:743-751,
                # but a degenerate pair's inf/NaN/behind-camera points
                # would inflate the greedy support counter — an ADDITION
                # with no reference counterpart — and feed BA unconstrained
                # blocks; gated-out features stay unmapped and get another
                # chance from later pairs / the track-completion pass)
                Rjn, Rn = np.asarray(Rj), np.asarray(R)
                Cjn = np.asarray(Cj).reshape(3)
                Cn = np.asarray(C).reshape(3)
                z1 = (Xnew - Cjn) @ Rjn[2]
                z2 = (Xnew - Cn) @ Rn[2]
                ok_new = (
                    np.isfinite(Xnew).all(axis=1) & (z1 > 1e-8) & (z2 > 1e-8)
                )
                if cfg.tri_reproj_gate_px > 0:
                    # source-view reprojection gate (tri_reproj_gate_px;
                    # see _triangulate_feature_groups)
                    for Rv, Cv, pv in ((Rjn, Cjn, p_j), (Rn, Cn, p_i)):
                        ok_new &= (_reproj_err_px(K, Rv, Cv, Xnew, pv)
                                   <= cfg.tri_reproj_gate_px)
                for n, row in enumerate(arr):
                    f_new = int(row[-1])
                    if ok_new[n] and f_new not in fidx_to_3d:
                        fidx_to_3d[f_new] = Xnew[n]
                        _count_support(f_new)
            print(f"Registered Camera: {i}")
            progressed = True
            since_ba += 1
            if cfg.ba_interval > 0 and since_ba >= cfg.ba_interval:
                self._intermediate_ba(K, camera_info, fidx_to_3d, tracks)
                since_ba = 0
        _stage("registration")

        # --- optional global rotation re-initialization ----------------
        # Incremental chaining compounds rotation error camera-by-camera;
        # averaging solves all rotations jointly from the pairwise
        # measurements (ADDITION; ops/rotation_avg.py) before BA polishes.
        if (cfg.global_rotation_init or cfg.global_init) \
                and len(camera_info) >= 3:
            from sfm_nerf_tpu.ops.rotation_avg import (
                relative_rotation_residuals, rotation_averaging,
            )

            cam_ids = sorted(camera_info.keys())
            col = {c: n for n, c in enumerate(cam_ids)}
            Kj0 = jnp.asarray(K)
            # Pose-graph edges.  The relative pose of every edge is
            # extracted with the ALWAYS-correct 'hz' center convention,
            # regardless of cfg.center_convention: global rotation/
            # translation averaging is an addition (no reference
            # counterpart to be bug-compatible with), and
            # pair_direction_world needs C_rel to be camera j's true
            # CENTER in camera i's frame — under the 'reference' quirk
            # U[:,2] is treated as the center when it is ±t, which would
            # rotate every edge direction by that pair's relative rotation
            # and bias the averaged centers consistently (no outlier gate
            # can see it).
            items = [
                ((i, j), Fij, mij)
                for (i, j), (Fij, mij) in refined.items()
                if i in col and j in col and len(mij) >= 8
            ]
            pairs = [(col[i], col[j]) for (i, j), _, _ in items]
            n_inl = [len(mij) for _, _, mij in items]
            rels = [None] * len(items)
            crels = [None] * len(items)
            chunk = cfg.global_init_batch_pairs
            if chunk > 0 and items:
                # pair-axis batched path (ops.relative_pose_pairs): group
                # edges by match bucket, pad each group's pair axis to the
                # fixed chunk (pad rows repeat row 0 — finite numerics,
                # sliced away), ONE dispatch per chunk.  n_valid masks
                # bucket padding out of each pair's cheirality vote.
                from collections import defaultdict

                groups = defaultdict(list)
                for idx, (_, _, mij) in enumerate(items):
                    groups[pow2_bucket(len(mij))].append(idx)
                for bucket, idxs in sorted(groups.items()):
                    for s in range(0, len(idxs), chunk):
                        sel = idxs[s:s + chunk]
                        Fb = np.stack([np.asarray(items[ix][1])
                                       for ix in sel])
                        p1 = np.stack([
                            np.resize(np.asarray(items[ix][2][:, 0:2]),
                                      (bucket, 2)) for ix in sel])
                        p2 = np.stack([
                            np.resize(np.asarray(items[ix][2][:, 2:4]),
                                      (bucket, 2)) for ix in sel])
                        nv = np.asarray(
                            [len(items[ix][2]) for ix in sel], np.int32)
                        pad = chunk - len(sel)
                        if pad:
                            Fb = np.concatenate(
                                [Fb, np.repeat(Fb[:1], pad, 0)])
                            p1 = np.concatenate(
                                [p1, np.repeat(p1[:1], pad, 0)])
                            p2 = np.concatenate(
                                [p2, np.repeat(p2[:1], pad, 0)])
                            nv = np.concatenate(
                                [nv, np.repeat(nv[:1], pad)])
                        C_b, R_b = relative_pose_pairs(
                            Kj0, jnp.asarray(Fb), jnp.asarray(p1),
                            jnp.asarray(p2), jnp.asarray(nv),
                            cleanup=cfg.essential_cleanup,
                        )
                        C_b, R_b = np.asarray(C_b), np.asarray(R_b)
                        for n, ix in enumerate(sel):
                            crels[ix] = C_b[n]
                            rels[ix] = R_b[n]
            else:
                for ix, (_, Fij, mij) in enumerate(items):
                    Eij = essential_from_fundamental(
                        Kj0, jnp.asarray(Fij))
                    if cfg.essential_cleanup:
                        Eij = cleanup_essential(Eij)
                    Cs, Rs = decompose_essential(Eij, "hz")
                    # pow2-bucketed like every other per-pair dispatch;
                    # n_valid masks the padded rows out of the cheirality
                    # vote (bucket-floor-invariant, advisor r4)
                    nm = len(mij)
                    bucket = pow2_bucket(nm)
                    pb1 = np.resize(np.asarray(mij[:, 0:2]), (bucket, 2))
                    pb2 = np.resize(np.asarray(mij[:, 2:4]), (bucket, 2))
                    _, C_rel, R_rel, _, _ = disambiguate_pose(
                        Kj0, Cs, Rs, jnp.asarray(pb1), jnp.asarray(pb2),
                        n_valid=jnp.asarray(nm, jnp.int32),
                    )
                    rels[ix] = np.asarray(R_rel)
                    crels[ix] = np.asarray(C_rel)
            # the spectral solve is only meaningful on a CONNECTED pose
            # graph containing the anchor — a disconnected component's
            # eigenvector blocks are independent (measured: 131-170 deg
            # garbage that would overwrite every camera)
            from sfm_nerf_tpu.sfm.tracks import _UnionFind

            uf = _UnionFind(len(cam_ids))
            for a, b in pairs:
                uf.union(a, b)
            connected = len({uf.find(n) for n in range(len(cam_ids))}) == 1
            if not connected:
                print(
                    "Rotation averaging skipped: pose graph disconnected"
                )
            if connected and len(pairs) >= len(cam_ids) - 1:
                R_avg = np.asarray(rotation_averaging(
                    pairs, np.stack(rels), len(cam_ids),
                    anchor=col[cam_ids[0]],
                ))
                # gauge: averaged rotations are relative to the anchor,
                # whose global rotation stays what it is (identity here)
                R_anchor = camera_info[cam_ids[0]]["R"]
                res = np.degrees(np.asarray(relative_rotation_residuals(
                    pairs, np.stack(rels), jnp.asarray(R_avg))))
                print(
                    f"Rotation averaging over {len(pairs)} pairs: "
                    f"mean pairwise residual {res.mean():.2f} deg"
                )
                for c in cam_ids:
                    camera_info[c]["R"] = R_avg[col[c]] @ R_anchor
                self.stats["rotation_avg"] = {
                    "n_pairs": len(pairs),
                    "mean_residual_deg": float(res.mean()),
                }
                # --- optional translation averaging (--global_init) ----
                # With rotations now globally consistent, each pair's
                # relative center gives a world-frame DIRECTION of
                # C_j - C_i; solve all centers jointly (IRLS least squares
                # + outlier-edge rejection, ops/translation_avg.py), then
                # rescale to the incremental solution's baseline so plots
                # and downstream magnitudes stay comparable.
                if cfg.global_init:
                    from sfm_nerf_tpu.ops.translation_avg import (
                        direction_residuals_deg,
                        pair_direction_world,
                        translation_averaging,
                    )

                    u_world = np.stack([
                        pair_direction_world(
                            camera_info[cam_ids[a]]["R"], c_rel)
                        for (a, b), c_rel in zip(pairs, crels)
                    ])
                    C_glob = translation_averaging(
                        pairs, u_world, len(cam_ids), anchor=0,
                        weights=np.asarray(n_inl, np.float64),
                    )
                    # gauge: translate so the anchor keeps its center;
                    # scale to match the incremental pair-(1,2) baseline
                    C_glob = C_glob - C_glob[0]
                    ref_base = np.linalg.norm(
                        camera_info[cam_ids[1]]["C"].reshape(3)
                        - camera_info[cam_ids[0]]["C"].reshape(3))
                    new_base = np.linalg.norm(C_glob[1] - C_glob[0])
                    if new_base > 1e-12 and ref_base > 1e-12:
                        C_glob = C_glob * (ref_base / new_base)
                    C0 = camera_info[cam_ids[0]]["C"].reshape(3)
                    tres = direction_residuals_deg(
                        pairs, u_world, C_glob)
                    print(
                        f"Translation averaging over {len(pairs)} pairs: "
                        f"median direction residual "
                        f"{float(np.median(tres)):.2f} deg"
                    )
                    for n_c, c in enumerate(cam_ids):
                        camera_info[c]["C"] = C_glob[n_c] + C0
                    self.stats["translation_avg"] = {
                        "n_pairs": len(pairs),
                        "median_residual_deg": float(np.median(tres)),
                    }
                # the existing points were triangulated under the OLD
                # rotations — re-triangulate everything under the
                # re-initialized cameras (global-SfM shape: rotations ->
                # structure -> BA), else the stale points trip the frozen
                # cheirality mask
                self._retriangulate_all(
                    K, camera_info, tracks, fidx_to_3d, cam_ids)

        # --- pre-BA artifacts ------------------------------------------
        _stage("global_init")
        all_points = np.asarray(list(fidx_to_3d.values()))
        art.save_reconstruction_plot(all_points, camera_info, cfg.output_dir)
        art.save_topdown_plot(all_points, camera_info, cfg.output_dir)

        # --- global bundle adjustment ----------------------------------
        print("Bundle adjustment...")
        camera_ids = sorted(camera_info.keys())
        n_cam = len(camera_ids)
        # pack only features with a 3D estimate AND >=2 registered views
        feat_ids = [
            f for f in fidx_to_3d
            if sum(1 for c in camera_ids if c in tracks[f]) >= 2
        ]
        m_pts = len(feat_ids)
        cams0 = np.asarray(camera_params_from_RC(
            jnp.asarray(np.stack([camera_info[c]["R"] for c in camera_ids])),
            jnp.asarray(np.stack([
                camera_info[c]["C"].reshape(3) for c in camera_ids
            ])),
        ))
        pts0 = np.stack([fidx_to_3d[f] for f in feat_ids])
        obs = np.full((n_cam, m_pts, 2), -1.0)
        vis = np.zeros((n_cam, m_pts))
        for col, f in enumerate(feat_ids):
            for rowi, c in enumerate(camera_ids):
                if c in tracks[f]:
                    obs[rowi, col] = tracks[f][c][:2]
                    vis[rowi, col] = 1
        # BA with outlier pruning between rounds: mismatched track
        # observations (never RANSAC-verified for their particular pair)
        # would otherwise dominate the L2 cost; the reference gets accidental
        # robustness from its z<=1e-8 residual drop on never-initialized
        # (0,0,0) points (BundleAdjustment.py:95-98).
        Kj = jnp.asarray(K)
        vis_work = vis.copy()
        # Pre-BA observation gate.  Track observations can be wrong yet
        # epipolar-consistent (a coincidental match ON the epipolar line
        # passes F-RANSAC but belongs to a different 3D point) — with
        # multi-view tracks (--merge_tracks) these surface as 100px-class
        # residuals that poison the first L2 round before inter-round
        # pruning can react (observed: the poisoned optimum pushes points
        # behind cameras and the next round's frozen cheirality mask drops
        # 96% of observations).  Gate generously against the INITIAL
        # geometry so only gross mismatches go.
        Rs_i, Cs_i = RC_from_camera_params(jnp.asarray(cams0))
        errs0 = np.stack([
            np.sqrt(np.asarray(reprojection_errors(
                Kj, Rs_i[c], Cs_i[c], jnp.asarray(pts0), jnp.asarray(obs[c])
            )))
            for c in range(n_cam)
        ])
        med0 = (
            float(np.nanmedian(errs0[vis_work > 0])) if vis_work.any() else 0.0
        )
        if not np.isfinite(med0):
            med0 = 0.0
        pre_thresh = max(5.0 * cfg.ba_prune_px, 10.0 * med0)
        # NaN-safe: a non-finite error (degenerate triangulation near a
        # principal plane) must be DROPPED, not kept — `> thresh` is False
        # for NaN, which would silently disable exactly this gate
        drop0 = ~(errs0 <= pre_thresh) & (vis_work > 0)
        if 0 < drop0.sum() <= 0.5 * vis_work.sum():
            print(
                f"pre-BA gate: dropping {int(drop0.sum())} / "
                f"{int(vis_work.sum())} observations above "
                f"{pre_thresh:.1f} px at the initial geometry"
            )
            vis_work = vis_work * (~drop0)
        rms_before = None
        if cfg.ba_devices > 1:
            # point-sharded BA over a device mesh (parallel/ba.py): point
            # blocks stay device-local, the small camera system is psummed
            # and solved replicated — results match single-device up to
            # reduction-order rounding
            import functools as _ft

            from sfm_nerf_tpu.parallel import make_mesh
            from sfm_nerf_tpu.parallel.ba import bundle_adjust_sharded

            n_avail = len(jax.devices())
            if n_avail < cfg.ba_devices:
                raise ValueError(
                    f"--ba_devices {cfg.ba_devices} but only {n_avail} "
                    f"JAX device(s) available; on CPU set XLA_FLAGS="
                    f"--xla_force_host_platform_device_count="
                    f"{cfg.ba_devices} before the first jax import"
                )
            ba_fn = _ft.partial(
                bundle_adjust_sharded, mesh=make_mesh(dp=cfg.ba_devices, tp=1)
            )
        else:
            ba_fn = bundle_adjust

        def _ba_errs(res):
            """(N,M) per-observation reprojection error at the BA optimum,
            under the model BA actually optimized: the refined shared
            intrinsics (incl. radial terms) when --ba_refine_intrinsics is
            on, the fixed pinhole K otherwise."""
            if cfg.ba_refine_intrinsics:
                from sfm_nerf_tpu.ops.ba import _observe_theta

                proj = jax.vmap(
                    jax.vmap(_observe_theta, (None, 0, None)),
                    (0, None, None),
                )(res.camera_params, res.points, res.intrinsics)
                return np.linalg.norm(np.asarray(proj) - obs, axis=-1)
            Rs_r, Cs_r = RC_from_camera_params(res.camera_params)
            return np.stack([
                np.sqrt(np.asarray(reprojection_errors(
                    Kj, Rs_r[c], Cs_r[c], res.points, jnp.asarray(obs[c])
                )))
                for c in range(n_cam)
            ])

        for ba_round in range(max(1, cfg.ba_rounds)):
            res = ba_fn(
                Kj, jnp.asarray(cams0), jnp.asarray(pts0),
                jnp.asarray(obs), jnp.asarray(vis_work),
                n_iters=cfg.ba_max_iters,
                loss=cfg.ba_loss, huber_delta=cfg.ba_huber_delta,
                refine_intrinsics=cfg.ba_refine_intrinsics,
            )
            n_obs = max(float(res.n_residuals), 1)
            if rms_before is None:
                rms_before = float(np.sqrt(2 * float(res.initial_cost) / n_obs))
            cams0 = np.asarray(res.camera_params)
            pts0 = np.asarray(res.points)
            if ba_round >= cfg.ba_rounds - 1:   # >=: ba_rounds=0 runs one
                break                           # round with NO prune after
            # prune observations whose reprojection error exceeds threshold
            errs = _ba_errs(res)
            # adaptive threshold: never prune below the bulk of the current
            # error distribution (a poorly-converged round would otherwise
            # gut the observation set — observed: 91% pruned at a fixed 3px).
            # NaN-safe like the pre-BA gate above: an unconstrained point's
            # block can go NaN inside BA (frozen cheirality mask zeroes its
            # residuals) — nanmedian keeps the threshold finite and
            # `~(<=)` DROPS non-finite errors instead of silently
            # disabling every remaining prune round
            med = float(np.nanmedian(errs[vis_work > 0]))
            if not np.isfinite(med):
                med = 0.0
            thresh = max(cfg.ba_prune_px, 3.0 * med)
            drop = ~(errs <= thresh) & (vis_work > 0)
            if drop.sum() == 0 or drop.sum() > 0.5 * n_obs:
                break
            print(
                f"BA round {ba_round + 1}: pruning {int(drop.sum())} / "
                f"{int(n_obs)} observations above {thresh:.2f} px"
            )
            vis_work = vis_work * (~drop)
        n_obs = max(float(res.n_residuals), 1)
        rms_after = float(np.sqrt(2 * float(res.cost) / n_obs))
        print(
            f"Bundle adjustment converged. Final cost: {float(res.cost)} "
            f"(RMS {rms_before:.4f} -> {rms_after:.4f} px over {int(n_obs)} obs)"
        )
        self.stats["ba"] = {
            "cost": float(res.cost), "initial_cost": float(res.initial_cost),
            "rms_px_before": rms_before, "rms_px_after": rms_after,
            "n_obs": int(n_obs), "n_cams": n_cam, "n_points": m_pts,
        }
        if cfg.ba_refine_intrinsics:
            th = np.asarray(res.intrinsics)
            self.stats["ba"]["intrinsics"] = th.tolist()
            print(
                "BA refined intrinsics "
                f"({cfg.ba_refine_intrinsics}): fx={th[0]:.2f} "
                f"fy={th[1]:.2f} cx={th[2]:.2f} cy={th[3]:.2f} "
                f"k1={th[4]:.5f} k2={th[5]:.5f} "
                f"(calibration: fx={float(Kj[0, 0]):.2f} "
                f"fy={float(Kj[1, 1]):.2f} cx={float(Kj[0, 2]):.2f} "
                f"cy={float(Kj[1, 2]):.2f})"
            )

        Rs, Cs = RC_from_camera_params(res.camera_params)
        Rs, Cs = np.asarray(Rs), np.asarray(Cs)
        for rowi, c in enumerate(camera_ids):
            camera_info[c] = {"R": Rs[rowi], "C": Cs[rowi]}
        pts_opt = np.asarray(res.points)
        for col, f in enumerate(feat_ids):
            fidx_to_3d[f] = pts_opt[col]

        # --- post-BA artifacts -----------------------------------------
        all_points = np.asarray(list(fidx_to_3d.values()))
        art.save_reconstruction_plot(all_points, camera_info, cfg.output_dir)
        art.save_topdown_plot(all_points, camera_info, cfg.output_dir)
        # colored point cloud: sample each feature's pixel in its first view
        colors = []
        for f in fidx_to_3d:
            c = (180, 180, 180)
            for img_id, (u, v) in sorted(tracks[f].items()):
                if 1 <= img_id <= len(images) \
                        and images[img_id - 1] is not None:
                    img = images[img_id - 1]
                    ui = int(np.clip(round(u), 0, img.shape[1] - 1))
                    vi = int(np.clip(round(v), 0, img.shape[0] - 1))
                    b, g, r = img[vi, ui][:3]     # cv2 loads BGR
                    c = (int(r), int(g), int(b))
                    break
            colors.append(c)
        art.save_ply(all_points, np.asarray(colors, np.uint8), cfg.output_dir)
        # per-observation error percentiles at the BA optimum (comparable to
        # the reference's Table III mean reprojection errors)
        errs = _ba_errs(res)
        # finite-only: an unconstrained point's NaN block must not poison
        # the reported mean (its residuals were masked out of the cost)
        vmask = (vis_work > 0) & np.isfinite(errs)
        if vmask.sum():
            e = errs[vmask]
            self.stats["ba"]["final_err_px"] = {
                "mean": float(e.mean()), "median": float(np.median(e)),
                "p90": float(np.percentile(e, 90)),
            }
            print(
                f"BA per-observation error: mean {e.mean():.4f} px, "
                f"median {np.median(e):.4f} px"
            )

        _stage("ba+artifacts")
        self.stats["elapsed_s"] = time.time() - t_start
        self.stats["n_points_total"] = len(fidx_to_3d)
        self.stats["n_registered"] = len(camera_info)
        self.stats["stage_seconds"] = {n: round(d, 2) for n, _, d in stage_log}
        print("stage timing: " + " | ".join(
            f"{n} {d:.1f}s" for n, _, d in stage_log))
        import json

        with open(f"{cfg.output_dir}/sfm_stats.json", "w") as f:
            json.dump(self.stats, f, indent=1, default=float)
        print("Done")
        return {
            "camera_info": camera_info,
            "points": fidx_to_3d,
            "stats": self.stats,
        }
