"""Spectral rotation averaging: exact recovery, noise resilience,
partial graphs, gauge anchoring."""

import numpy as np
import jax
import pytest

from sfm_nerf_tpu.ops.rotation_avg import (
    project_to_so3,
    relative_rotation_residuals,
    rotation_averaging,
)


def random_rotations(rng, n):
    Rs = []
    for _ in range(n):
        Q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        Rs.append(Q)
    return np.stack(Rs)


def perturb(rng, R, angle):
    v = rng.normal(size=3)
    v = v / np.linalg.norm(v) * angle
    K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    from scipy.linalg import expm

    return expm(K) @ R


def angular_err(A, B):
    cos = (np.trace(A @ B.T) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def make_problem(rng, n, edges, noise=0.0):
    R_true = random_rotations(rng, n)
    pairs, rels = [], []
    for i, j in edges:
        R_ij = R_true[j] @ R_true[i].T
        if noise:
            R_ij = perturb(rng, R_ij, noise)
        pairs.append((i, j))
        rels.append(R_ij)
    return R_true, pairs, np.stack(rels)


def full_graph(n):
    return [(i, j) for i in range(n) for j in range(i + 1, n)]


def test_exact_full_graph():
    rng = np.random.default_rng(0)
    R_true, pairs, rels = make_problem(rng, 6, full_graph(6))
    R = np.asarray(rotation_averaging(pairs, rels, 6, anchor=0))
    # same gauge: anchor both to camera 0
    R_ref = R_true @ R_true[0].T
    for a, b in zip(R, R_ref):
        assert angular_err(a, b) < 1e-5


def test_noisy_full_graph_averages_down_error():
    rng = np.random.default_rng(1)
    noise = np.radians(2.0)
    R_true, pairs, rels = make_problem(rng, 10, full_graph(10), noise=noise)
    R = np.asarray(rotation_averaging(pairs, rels, 10))
    R_ref = R_true @ R_true[0].T
    errs = [angular_err(a, b) for a, b in zip(R, R_ref)]
    # averaging over 9 edges/camera should beat the per-edge noise
    assert np.mean(errs) < 2.0, errs
    res = np.asarray(relative_rotation_residuals(pairs, rels, R))
    assert np.degrees(res.mean()) < 3.0


def test_sparse_chain_plus_loop():
    rng = np.random.default_rng(2)
    n = 8
    edges = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1), (0, 4)]
    R_true, pairs, rels = make_problem(rng, n, edges)
    R = np.asarray(rotation_averaging(pairs, rels, n))
    R_ref = R_true @ R_true[0].T
    for a, b in zip(R, R_ref):
        assert angular_err(a, b) < 1e-4


def test_anchor_and_orthonormality():
    rng = np.random.default_rng(3)
    R_true, pairs, rels = make_problem(rng, 5, full_graph(5), noise=0.05)
    R = np.asarray(rotation_averaging(pairs, rels, 5, anchor=2))
    np.testing.assert_allclose(R[2], np.eye(3), atol=1e-6)
    for Ri in R:
        np.testing.assert_allclose(Ri @ Ri.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(Ri) > 0.99


def test_project_to_so3_batched():
    rng = np.random.default_rng(4)
    M = rng.normal(size=(7, 3, 3))
    R = np.asarray(project_to_so3(M))
    for Ri in R:
        np.testing.assert_allclose(Ri @ Ri.T, np.eye(3), atol=1e-8)
        assert np.linalg.det(Ri) > 0


def test_jit_compatible():
    rng = np.random.default_rng(5)
    R_true, pairs, rels = make_problem(rng, 4, full_graph(4))
    fn = jax.jit(lambda r: rotation_averaging(pairs, r, 4))
    R = np.asarray(fn(rels))
    R_ref = R_true @ R_true[0].T
    for a, b in zip(R, R_ref):
        assert angular_err(a, b) < 1e-4


def test_rotation_averaging_isolated_camera_does_not_corrupt():
    """An edge-less camera's exact eigenvalue-1 identity block used to
    displace the connected component's top eigenvectors (151-deg errors on
    the CONNECTED cameras).  The op now restricts the solve to the
    anchor's component and returns identity elsewhere, as documented."""
    rng = np.random.default_rng(0)
    Rs = random_rotations(rng, 4)
    pairs = [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)]
    noise = np.radians(0.5)
    R_rel = np.stack([
        perturb(rng, Rs[j] @ Rs[i].T, noise) for i, j in pairs
    ])
    # camera 4 exists but has NO edges
    R_avg = np.asarray(rotation_averaging(pairs, R_rel, 5, anchor=0))
    for c in range(4):
        err = angular_err(R_avg[c], Rs[c] @ Rs[0].T)
        assert err < 2.0, f"camera {c}: {err:.1f} deg"
    np.testing.assert_allclose(R_avg[4], np.eye(3), atol=1e-12)


def test_rotation_averaging_duplicate_edge_accumulates():
    """A pair measured twice must contribute both measurements (block
    sum, consistent with the degree count) instead of silently dropping
    one — identical duplicates therefore match the single-edge result."""
    rng = np.random.default_rng(1)
    Rs = random_rotations(rng, 3)
    pairs = [(0, 1), (1, 2), (0, 2)]
    R_rel = np.stack([Rs[j] @ Rs[i].T for i, j in pairs])
    base = np.asarray(rotation_averaging(pairs, R_rel, 3))
    dup = np.asarray(rotation_averaging(
        pairs + [(0, 1)], np.concatenate([R_rel, R_rel[:1]]), 3))
    for c in range(3):
        err = angular_err(base[c], dup[c])
        assert err < 0.01, f"camera {c}: {err:.3f} deg"


def test_ring_200_cameras_window_edges():
    """200-node ring with window-7 edges (the 200-camera bench's pose
    graph shape, incl. the wrap-around loop closures) and 0.5-degree edge
    noise: the spectral solve must hold global error near the noise floor
    instead of accumulating it along the chain — the property the
    --global_rotation_init path buys at scale (VERDICT r3 next #2)."""
    rng = np.random.default_rng(3)
    n = 200
    edges = [(i, (i + d) % n) for i in range(n) for d in range(1, 8)]
    edges = [(min(a, b), max(a, b)) for a, b in edges]
    edges = sorted(set(edges))
    R_true, pairs, rels = make_problem(rng, n, edges,
                                       noise=np.deg2rad(0.5))
    R_est = np.asarray(rotation_averaging(pairs, rels, n, anchor=0))
    # gauge: the solve returns rotations relative to the anchor
    # (R_est[0] == I), so truth in the same gauge is R_true[i] R_true[0]^T
    errs = [angular_err(R_est[i], R_true[i] @ R_true[0].T)
            for i in range(n)]
    # chained accumulation over ~100 ring steps at 0.5-deg edge noise
    # would reach several degrees; the joint solve must sit at the noise
    # floor instead
    assert np.mean(errs) < 0.5, np.mean(errs)
    assert np.max(errs) < 1.5, np.max(errs)
