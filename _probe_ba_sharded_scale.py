#!/usr/bin/env python
"""Point-sharded BA at the REAL 200-camera x 150k-point shape, executed on
the 8-virtual-device CPU mesh (VERDICT r3 #8).

Two claims are promoted from extrapolation to measurement here:

1. **Correctness at scale**: ``bundle_adjust_sharded`` on 8 devices runs the
   full 200 x 150k problem (the largest single-chip row in PERFORMANCE.md)
   and matches the single-device ``bundle_adjust`` cost trajectory to
   reduction-order rounding — same tolerance contract as the small-mesh
   tests (parallel/ba.py docstring).
2. **Comm bytes**: the per-LM-iteration all-reduce payload is read off the
   COMPILED 8-way SPMD HLO at the real shape and compared against the
   (36*N^2 + 48*N) * 4 bytes prediction from PERFORMANCE.md (the bundled
   psum tuple (U, g_cam, S_off, rhs2), independent of the point count M).

Reference anchor: the dense scipy BA this replaces,
/root/reference/Phase1/BundleAdjustment.py:122-160 (its Jacobian at this
scale would be 2*9.2M x (6*200+3*150k) ~ 3.9e13 entries — unbuildable).

Run:  python _probe_ba_sharded_scale.py [--cams 200] [--points 150000]
      [--iters 3]   (forces CPU; safe next to a TPU job)
"""

import argparse
import json
import re
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def build_problem(N, M, seed=1, dtype=np.float32):
    """Same ring-of-cameras generator as bench_sfm.bench_ba (kept f64 on the
    host, cast at the end) so the measured RMS rows are comparable."""
    import jax.numpy as jnp

    from sfm_nerf_tpu.ops.ba import camera_params_from_RC

    rng = np.random.default_rng(seed)
    K = np.array([[800.0, 0, 400.0], [0, 800.0, 300.0], [0, 0, 1.0]])
    points = rng.uniform(-1.5, 1.5, (M, 3))
    Rs, Cs, obs = [], [], []
    for i in range(N):
        th = 2 * np.pi * i / N
        C = np.array([6 * np.cos(th), 0.5 * np.sin(3 * th), 6 * np.sin(th)])
        fwd = -C / np.linalg.norm(C)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd])
        P = K @ R @ np.hstack([np.eye(3), -C[:, None]])
        x = (P @ np.hstack([points, np.ones((M, 1))]).T).T
        x = x[:, :2] / x[:, 2:3] + rng.normal(0, 0.5, (M, 2))
        Rs.append(R), Cs.append(C), obs.append(x)
    cams = np.asarray(
        camera_params_from_RC(jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(Cs)))
    )
    cams = cams + rng.normal(0, 0.003, cams.shape)
    pts = points + rng.normal(0, 0.02, points.shape)
    vis = rng.uniform(size=(N, M)) < 0.3
    vis[:2] = True
    to = lambda a: jnp.asarray(np.asarray(a), dtype)
    return (to(K), to(cams), to(pts), to(np.stack(obs)),
            to(vis.astype(float)))


def measured_comm_bytes(hlo: str, n_iters: int):
    """Sum the all-reduce payloads inside the compiled SPMD module.

    The LM loop lowers to a scan (while-loop) body that executes n_iters
    times; the structural probe (_probe_ba_comm.py) established that the
    point-axis reductions live INSIDE that body as one bundled tuple
    all-reduce plus two scalar cost reductions, and any all-reduce outside
    the loop (initial-cost) runs once.  We count every all-reduce's result
    bytes, classify by payload size (the bundled tuple dominates), and
    report per-iteration bytes for the in-loop ops.
    """
    dt_bytes = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1}
    ars = re.findall(r"(\S+) = \(?([^)=]*?)\)?\s*all-reduce\(", hlo)
    sizes = []
    for name, shapes in ars:
        total = 0
        for m in re.finditer(r"(f32|f64|s32|u32|pred)\[([0-9,]*)\]", shapes):
            dims = [int(d) for d in m.group(2).split(",") if d]
            total += dt_bytes[m.group(1)] * int(np.prod(dims)) if dims else dt_bytes[m.group(1)]
        sizes.append((name, total))
    return sizes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=200)
    ap.add_argument("--points", type=int, default=150000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--skip_single", action="store_true",
                    help="skip the single-device control (halves runtime)")
    args = ap.parse_args()

    assert jax.device_count() >= args.devices, (
        "run under XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from sfm_nerf_tpu.ops.ba import bundle_adjust
    from sfm_nerf_tpu.parallel.ba import bundle_adjust_sharded

    N, M = args.cams, args.points
    print(f"building {N} cams x {M} pts problem ...", flush=True)
    K, cams, pts, obs, vis = build_problem(N, M)
    n_obs = int(np.asarray(jnp.sum(vis)))
    print(f"n_obs = {n_obs/1e6:.2f}M", flush=True)

    mesh = Mesh(np.array(jax.devices()[: args.devices]), ("data",))
    fn = jax.jit(
        lambda *a: bundle_adjust_sharded(
            *a, mesh=mesh, axis="data", n_iters=args.iters
        )
    )

    t0 = time.time()
    lowered = fn.lower(K, cams, pts, obs, vis)
    compiled = lowered.compile()
    t_compile = time.time() - t0
    hlo = compiled.as_text()
    sizes = measured_comm_bytes(hlo, args.iters)
    pred = (36 * N * N + 48 * N) * 4
    print(f"compile {t_compile:.1f}s; all-reduces in HLO: {len(sizes)}")
    for name, b in sizes:
        print(f"  {name}: {b/1e6:.3f} MB")
    bundled = max(b for _, b in sizes) if sizes else 0

    t0 = time.time()
    res_sh = fn(K, cams, pts, obs, vis)
    cost_sh = float(res_sh.cost)
    t_sh = time.time() - t0
    rms = lambda c: float(np.sqrt(2 * c / n_obs))
    out = {
        "metric": "ba_sharded_200x150k_virtual8",
        "n_cams": N, "n_points": M, "n_obs": n_obs,
        "n_iters": args.iters, "devices": args.devices,
        "sharded_cost": cost_sh,
        "sharded_rms_px": round(rms(cost_sh), 4),
        "initial_rms_px": round(rms(float(res_sh.initial_cost)), 4),
        "sharded_wall_s": round(t_sh, 1),
        "comm_bytes_bundled_allreduce": bundled,
        "comm_bytes_predicted": pred,
        "comm_ratio_vs_pred": round(bundled / pred, 4) if pred else None,
    }
    if not args.skip_single:
        t0 = time.time()
        res_1 = bundle_adjust(K, cams, pts, obs, vis, n_iters=args.iters)
        cost_1 = float(res_1.cost)
        out["single_cost"] = cost_1
        out["single_rms_px"] = round(rms(cost_1), 4)
        out["single_wall_s"] = round(time.time() - t0, 1)
        out["cost_rel_diff"] = abs(cost_sh - cost_1) / cost_1
        pt_err = float(
            np.max(np.abs(np.asarray(res_sh.points) - np.asarray(res_1.points)))
        )
        out["points_max_abs_diff"] = pt_err
        assert out["cost_rel_diff"] < 1e-5, out
    print(json.dumps(out))


if __name__ == "__main__":
    main()
