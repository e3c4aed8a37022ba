#!/usr/bin/env python
"""SfM RANSAC scale benchmark: hypotheses/second at production match counts.

The reference's RANSAC is a 50k-iteration Python loop of LAPACK SVDs
(Phase1/Fundamental.py:95-129) — this measures our batched implementation
against a faithful numpy re-creation of that loop, at growing match counts.

Usage: python bench_sfm.py [--platform cpu|default] [--n_matches N]
Prints one JSON line per configuration.
"""

import argparse
import json
import time

import numpy as np


def numpy_reference_ransac(pts1, pts2, n_iters, threshold=5e-4):
    """The reference's loop, re-created (normalization pre-applied)."""
    rng = np.random.default_rng(0)
    h1 = np.hstack([pts1, np.ones((len(pts1), 1))])
    h2 = np.hstack([pts2, np.ones((len(pts2), 1))])
    best_count = -1
    for _ in range(n_iters):
        idx = rng.choice(len(pts1), 8, replace=False)
        A = np.zeros((8, 9))
        for r, (p1, p2) in enumerate(zip(pts1[idx], pts2[idx])):
            x1, y1 = p1
            x2, y2 = p2
            A[r] = [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, 1]
        _, _, Vt = np.linalg.svd(A)
        F = Vt[-1].reshape(3, 3)
        U, S, Vt2 = np.linalg.svd(F)
        S[2] = 0
        F = U @ np.diag(S) @ Vt2
        F = F / F[2, 2]
        Fx1 = F @ h1.T
        n1 = np.linalg.norm(Fx1[:2], axis=0)
        Fx1n = Fx1 / n1
        Fx2 = F @ h2.T
        n2 = np.linalg.norm(Fx2[:2], axis=0)
        Fx2n = Fx2 / n2
        d = (h2 * Fx1n.T).sum(1) ** 2 / (
            Fx1n[0] ** 2 + Fx1n[1] ** 2 + Fx2n[0] ** 2 + Fx2n[1] ** 2
        )
        count = (d < threshold).sum()
        if count > best_count:
            best_count = count
    return best_count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="default",
                    choices=["cpu", "default"])
    ap.add_argument("--n_matches", type=int, default=4096)
    ap.add_argument("--n_iters", type=int, default=50000)
    ap.add_argument("--ref_iters", type=int, default=500,
                    help="reference-loop iterations to extrapolate from")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sfm_nerf_tpu.ops.epipolar import ransac_fundamental

    rng = np.random.default_rng(0)
    n = args.n_matches
    # synthetic correspondences with 30% outliers (pixel coordinates)
    pts1 = rng.uniform(0, 800, (n, 2))
    pts2 = pts1 + rng.normal(0, 1.0, (n, 2))
    out = rng.choice(n, n // 3, replace=False)
    pts2[out] += rng.uniform(-100, 100, (len(out), 2))

    # reference loop (extrapolated), fed Hartley-normalized points exactly
    # as reject_outliers does (Fundamental.py:79-90) so its 5e-4 threshold
    # is meaningful
    def hartley(p):
        c = p.mean(0)
        s = np.sqrt(2) / np.sqrt(((p - c) ** 2).sum(1).mean())
        return (p - c) * s

    t0 = time.time()
    numpy_reference_ransac(hartley(pts1), hartley(pts2), args.ref_iters)
    ref_per_iter = (time.time() - t0) / args.ref_iters
    ref_hps = 1.0 / ref_per_iter

    # ours: one jitted call
    p1 = jnp.asarray(pts1, jnp.float32)
    p2 = jnp.asarray(pts2, jnp.float32)
    res = ransac_fundamental(jax.random.key(0), p1, p2,
                             n_iters=args.n_iters, chunk=2048)
    int(res.n_inliers)  # completion barrier (incl. compile)
    t0 = time.time()
    res = ransac_fundamental(jax.random.key(1), p1, p2,
                             n_iters=args.n_iters, chunk=2048)
    n_inl = int(res.n_inliers)  # forces completion
    dt = time.time() - t0
    ours_hps = args.n_iters / dt

    print(json.dumps({
        "metric": "ransac_hypotheses_per_sec",
        "n_matches": n,
        "n_iters": args.n_iters,
        "platform": str(jax.devices()[0]),
        "value": round(ours_hps, 1),
        "reference_loop_hps": round(ref_hps, 1),
        "speedup": round(ours_hps / ref_hps, 1),
        "n_inliers": n_inl,
    }))


if __name__ == "__main__":
    main()
