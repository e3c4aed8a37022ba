"""Five-point essential matrix estimation (Stewenius' action-matrix method).

The reference estimates two-view geometry only through the 8-point
fundamental algorithm (Phase1/Fundamental.py) + K-conjugation; a MINIMAL
5-point solver estimates E directly from calibrated correspondences —
fewer samples per RANSAC hypothesis (5 vs 8: far fewer iterations for the
same outlier-rate guarantee) and the rank/trace constraints are enforced
exactly instead of post-hoc.

Method (Stewenius, Engels, Nister, "Recent developments on direct relative
orientation", ISPRS 2006 — implemented from the published math, no code
consulted):

1. E lies in the 4-dim null space of the 5x9 epipolar constraint matrix:
   E(x,y,z) = x*E1 + y*E2 + z*E3 + E4.
2. det(E) = 0 and 2*E*Et*E - tr(E*Et)*E = 0 give 10 cubic equations in
   (x, y, z).  The coefficient expansion over the 20 monomials of degree
   <= 3 is done by GENERIC polynomial arithmetic below (dicts of exponent
   tuples -> batched coefficient arrays), not hand-derived tables.
3. Gauss-Jordan on the (10, 20) system expresses every degree-3 monomial
   in the 10-dim quotient basis B = {x^2, xy, xz, y^2, yz, z^2, x, y, z, 1};
   the action matrix T_x of multiplication by x on B then has the property
   T_x v = x v at every root, with v = B evaluated at the root.  Its (up
   to 10) eigenvectors yield all real solutions simultaneously.

Numerics: batched float64 numpy (the nonsymmetric eigendecomposition has
no TPU lowering; the SfM pipeline's minimal solvers run host-side — CPU
f64 is its default platform — while hypothesis SCORING stays batched on
device).  All stages are vectorized over the sample batch.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# monomial bases (exponent tuples for x^i y^j z^k)
_DEG3 = [
    (3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1),
    (1, 0, 2), (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3),
]
_BASIS = [
    (2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1),
    (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
]
_COLS = {m: i for i, m in enumerate(_DEG3 + _BASIS)}


def _pmul(a: Dict, b: Dict) -> Dict:
    """Product of two polynomials {exponents: (B,) coeffs}."""
    out: Dict[Tuple[int, int, int], np.ndarray] = {}
    for ea, ca in a.items():
        for eb, cb in b.items():
            e = (ea[0] + eb[0], ea[1] + eb[1], ea[2] + eb[2])
            c = ca * cb
            out[e] = out[e] + c if e in out else c
    return out


def _padd(a: Dict, b: Dict, sb: float = 1.0) -> Dict:
    out = dict(a)
    for e, c in b.items():
        out[e] = out[e] + sb * c if e in out else sb * c
    return out


def five_point_essential(pts1: np.ndarray, pts2: np.ndarray) -> np.ndarray:
    """All real essential matrices for batches of 5 NORMALIZED (K^-1 px)
    correspondences.

    pts1, pts2: (B, 5, 2).  Returns (B, 10, 3, 3) candidates with invalid
    slots set to NaN (a minimal problem has up to 10 real solutions).
    """
    pts1 = np.asarray(pts1, np.float64)
    pts2 = np.asarray(pts2, np.float64)
    B = pts1.shape[0]
    x1, y1 = pts1[..., 0], pts1[..., 1]
    x2, y2 = pts2[..., 0], pts2[..., 1]
    one = np.ones_like(x1)
    # epipolar rows: x2.T E x1 = 0, E flattened row-major (B, 5, 9)
    A = np.stack([
        x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one,
    ], axis=-1)
    # 4-dim null space via SVD (smallest four right singular vectors)
    _, _, Vt = np.linalg.svd(A)
    Ebasis = Vt[:, 5:9, :][:, ::-1, :].reshape(B, 4, 3, 3)  # E1..E3, E4 last

    # E entries as degree-1 polynomials in (x, y, z, 1)
    X, Y, Z, W = (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)
    Epoly = [[{X: Ebasis[:, 0, r, c], Y: Ebasis[:, 1, r, c],
               Z: Ebasis[:, 2, r, c], W: Ebasis[:, 3, r, c]}
              for c in range(3)] for r in range(3)]

    # det(E) = 0 (1 cubic)
    def det3(M):
        t = {}
        for (i, j, k), s in (
            ((0, 1, 2), 1), ((1, 2, 0), 1), ((2, 0, 1), 1),
            ((2, 1, 0), -1), ((1, 0, 2), -1), ((0, 2, 1), -1),
        ):
            t = _padd(t, _pmul(_pmul(M[0][i], M[1][j]), M[2][k]), s)
        return t

    eqs = [det3(Epoly)]

    # 2 E Et E - tr(E Et) E = 0 (9 cubics)
    EEt = [[{} for _ in range(3)] for _ in range(3)]
    for r in range(3):
        for c in range(3):
            acc = {}
            for k in range(3):
                acc = _padd(acc, _pmul(Epoly[r][k], Epoly[c][k]))
            EEt[r][c] = acc
    trace = _padd(_padd(EEt[0][0], EEt[1][1]), EEt[2][2])
    for r in range(3):
        for c in range(3):
            acc = {}
            for k in range(3):
                acc = _padd(acc, _pmul(EEt[r][k], Epoly[k][c]))
            eq = _padd({e: 2.0 * v for e, v in acc.items()},
                       _pmul(trace, Epoly[r][c]), -1.0)
            eqs.append(eq)

    # assemble (B, 10, 20) coefficient matrix over the fixed monomial order
    M = np.zeros((B, 10, 20))
    for i, eq in enumerate(eqs):
        for e, c in eq.items():
            M[:, i, _COLS[e]] = c

    # Gauss-Jordan: deg-3 block becomes I; guard singular (degenerate) ones
    M1, M2 = M[:, :, :10], M[:, :, 10:]
    ok = np.abs(np.linalg.det(M1)) > 1e-18
    M1safe = np.where(ok[:, None, None], M1, np.eye(10))
    Ared = np.linalg.solve(M1safe, M2)          # deg3_i = -Ared[i] . basis

    # action matrix of multiplication by x on the quotient basis
    T = np.zeros((B, 10, 10))
    for i, b in enumerate(_BASIS):
        xb = (b[0] + 1, b[1], b[2])
        if xb in _COLS and _COLS[xb] >= 10:     # still degree <= 2
            T[:, i, _COLS[xb] - 10] = 1.0
        else:                                   # reduce via G-J row
            T[:, i, :] = -Ared[:, _DEG3.index(xb), :]

    lam, V = np.linalg.eig(T)                   # (B,10), (B,10,10)
    # real eigenvectors -> (x, y, z) from the linear entries over the 1
    realish = (np.abs(lam.imag) < 1e-6) & ok[:, None]
    Vr = V.real
    denom = Vr[:, 9, :]
    safe = np.abs(denom) > 1e-12
    denom = np.where(safe, denom, 1.0)
    xs = Vr[:, 6, :] / denom
    ys = Vr[:, 7, :] / denom
    zs = Vr[:, 8, :] / denom
    valid = realish & safe                       # (B, 10)

    E = (
        xs[..., None, None] * Ebasis[:, None, 0]
        + ys[..., None, None] * Ebasis[:, None, 1]
        + zs[..., None, None] * Ebasis[:, None, 2]
        + Ebasis[:, None, 3]
    )                                            # (B, 10, 3, 3)
    norm = np.linalg.norm(E, axis=(-2, -1), keepdims=True)
    E = E / np.where(norm > 1e-12, norm, 1.0)
    return np.where(valid[..., None, None], E, np.nan)


def ransac_essential_5pt(
    pts1: np.ndarray,
    pts2: np.ndarray,
    K: np.ndarray,
    n_iters: int = 1000,
    threshold_px: float = 1.0,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """RANSAC over 5-point minimal samples; Sampson scoring in PIXELS.

    pts1, pts2: (N, 2) pixel coordinates; K: (3, 3).  Returns (E, inlier
    mask) with E normalized (||E||=1).  Scoring uses the fundamental-form
    Sampson distance of F = K^-T E K^-1 so the threshold is in pixels —
    consistent with how inliers are consumed downstream.
    """
    pts1 = np.asarray(pts1, np.float64)
    pts2 = np.asarray(pts2, np.float64)
    K = np.asarray(K, np.float64)
    n = pts1.shape[0]
    if n < 5:
        raise ValueError("need >= 5 correspondences")
    Kinv = np.linalg.inv(K)
    h1 = np.concatenate([pts1, np.ones((n, 1))], 1) @ Kinv.T
    h2 = np.concatenate([pts2, np.ones((n, 1))], 1) @ Kinv.T
    rng = np.random.default_rng(seed)
    # duplicate-free minimal samples: with-replacement draws are degenerate
    # (rank <= 4 constraints) surprisingly often — for n=10 about 70% of
    # 5-tuples would contain a repeat
    if n == 5:
        idx = np.tile(np.arange(5), (n_iters, 1))
    else:
        u = rng.random((n_iters, n))
        idx = np.argpartition(u, 5, axis=1)[:, :5]
    cands = five_point_essential(
        h1[idx][..., :2] / h1[idx][..., 2:],
        h2[idx][..., :2] / h2[idx][..., 2:],
    ).reshape(-1, 3, 3)                          # (n_iters*10, 3, 3)
    good = np.isfinite(cands[:, 0, 0])
    cands = cands[good]
    if cands.shape[0] == 0:
        raise RuntimeError("5-point solver produced no candidates")

    # Sampson distance in px; hypotheses scored in fixed-size chunks so
    # peak memory stays bounded (mirrors ransac_fundamental's chunked
    # lax.map — (H, N, 3) f64 at H=10k, N=10k would be gigabytes)
    p1 = np.concatenate([pts1, np.ones((n, 1))], 1)
    p2 = np.concatenate([pts2, np.ones((n, 1))], 1)
    chunk = max(1, int(2**22 // max(n, 1)))      # ~100 MB of f64 temporaries
    thr2 = threshold_px ** 2
    best_score, best_E, best_inl = -np.inf, None, None
    for s in range(0, cands.shape[0], chunk):
        Ec = cands[s:s + chunk]
        F = np.einsum("ij,bjk,kl->bil", Kinv.T, Ec, Kinv)
        Fx1 = np.einsum("bij,nj->bni", F, p1)    # (h, N, 3)
        Ftx2 = np.einsum("bji,nj->bni", F, p2)
        num = np.einsum("ni,bni->bn", p2, Fx1) ** 2
        den = (Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2
               + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2)
        d = num / np.maximum(den, 1e-18)
        inl = d < thr2
        # MSAC ranking (mirrors ops/epipolar.py:_ransac_score): raw counts
        # tie dozens of hypotheses; the truncated-loss sum breaks ties by
        # inlier quality
        scores = -np.minimum(d, thr2).sum(1)
        b = int(np.argmax(scores))
        if scores[b] > best_score:
            best_score = float(scores[b])
            best_E, best_inl = Ec[b], inl[b]

    # Re-estimate the winner on its full inlier set (mirrors the 8-point
    # path's re-estimation, ops/epipolar.py:205-211, itself mirroring the
    # reference /root/reference/Phase1/Fundamental.py:133-137).  A minimal
    # 5-point E is exact on 5 correspondences but noise on those 5 points
    # propagates to the whole set; the linear re-fit on all inliers plus
    # essential-manifold projection averages that noise out.  Without this,
    # a near-tied minimal hypothesis can win the count yet sit far enough
    # from the true E that the downstream joint two-view BA falls into a
    # bad pose basin (round-1 regression: 1.18 px linear -> 11.2 px after
    # "refinement" on the bundled pair (1,2)).
    def _sampson_px(E):
        F = Kinv.T @ E @ Kinv
        Fx1 = p1 @ F.T                           # (N, 3)
        Ftx2 = p2 @ F
        num = np.einsum("ni,ni->n", p2, Fx1) ** 2
        den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
        return num / np.maximum(den, 1e-18)

    for _ in range(3):                           # inner local-optimization loop
        if best_inl.sum() < 8:
            break
        a1, a2 = h1[best_inl], h2[best_inl]      # normalized coords, z=1
        A = np.stack(
            [a2[:, 0] * a1[:, 0], a2[:, 0] * a1[:, 1], a2[:, 0],
             a2[:, 1] * a1[:, 0], a2[:, 1] * a1[:, 1], a2[:, 1],
             a1[:, 0], a1[:, 1], np.ones(len(a1))], axis=1)
        _, _, Vt = np.linalg.svd(A, full_matrices=False)
        E_lin = Vt[-1].reshape(3, 3)
        U, s, Vt = np.linalg.svd(E_lin)          # project to essential manifold
        sm = (s[0] + s[1]) / 2.0
        E_new = U @ np.diag([sm, sm, 0.0]) @ Vt
        E_new /= np.linalg.norm(E_new)
        d_new = _sampson_px(E_new)
        inl_new = d_new < thr2
        # accept/reject by the SAME objective that ranked the hypotheses
        # (MSAC truncated-loss sum) — judging refits by raw count would
        # re-admit the near-tie sensitivity the MSAC ranking removed
        score_new = -float(np.minimum(d_new, thr2).sum())
        if score_new < best_score:
            break                                # refit lost support; keep prior
        if score_new == best_score and np.array_equal(inl_new, best_inl):
            best_E = E_new
            break
        best_E, best_inl = E_new, inl_new
        best_score = score_new
    return best_E, best_inl
