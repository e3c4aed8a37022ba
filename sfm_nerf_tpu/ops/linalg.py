"""Small-matrix linear algebra building blocks, batched and jit-safe.

The reference runs one LAPACK SVD per RANSAC hypothesis / per triangulated
point inside Python loops (e.g. Phase1/Fundamental.py:95-129 — 50,000
iterations x two SVDs).  Here every null-space problem becomes a batched
symmetric eigendecomposition of the normal matrix A^T A (the null vector of A
is the minimal eigenvector of A^T A), which XLA batches into one launch —
cheaper than batched SVD for our tiny (8x9, 6x4, 2Nx12) systems and
numerically adequate at these conditionings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


def smallest_eigvec_of_normal(A: jnp.ndarray) -> jnp.ndarray:
    """Unit vector v minimizing ||A v|| for ``A[..., m, n]`` -> ``[..., n]``.

    Equivalent to the last right-singular vector (Vt[-1]) the reference takes
    from np.linalg.svd (up to sign).
    """
    AtA = jnp.einsum("...mi,...mj->...ij", A, A, precision=HI)
    _, vecs = jnp.linalg.eigh(AtA)        # ascending eigenvalues
    return vecs[..., :, 0]


def _round_robin_rounds(n: int):
    """Tournament schedule: each round is a set of disjoint index pairs;
    over the rounds every unordered pair appears exactly once.  Odd n gets
    a bye slot (circle method on n+1 with a phantom)."""
    m = n if n % 2 == 0 else n + 1
    players = list(range(m))
    rounds = []
    for _ in range(m - 1):
        pairs = []
        for k in range(m // 2):
            a, b = players[k], players[m - 1 - k]
            if a < n and b < n:
                pairs.append((min(a, b), max(a, b)))
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return rounds


def jacobi_eigh_small(M: jnp.ndarray, sweeps: int = 10):
    """Batched symmetric eigendecomposition for SMALL n (<= ~16) via
    parallel-ordered cyclic Jacobi with a FIXED sweep count.

    XLA's general ``eigh`` costs ~18 us per 9x9 matrix on v5e (measured:
    89% of the F-RANSAC budget, PERFORMANCE.md) — it carries convergence
    machinery sized for big matrices.  Here each tournament round applies
    all disjoint (p,q) rotations at once as ONE batched n x n matmul pair
    (A <- G^T A G, V <- V G), with G assembled from static masks — no
    scatters, no branches, nothing batch-dependent but the angles.  Ten
    sweeps take 9x9 to ~1e-7 relative off-diagonal mass (cyclic Jacobi is
    quadratically convergent).

    Returns ``(eigvals (..., n), V (..., n, n))`` with ``M ~ V diag V^T``;
    eigenvalues are NOT sorted (use argmin/argmax or one-hot selection).
    """
    n = M.shape[-1]
    rounds = _round_robin_rounds(n)
    eye = jnp.eye(n, dtype=M.dtype)

    A = M
    # + 0*M: V must carry M's type exactly (inside shard_map a bare eye is
    # replicated while the post-sweep V varies over the manual axes, which
    # trips lax.scan's carry typing)
    V = jnp.broadcast_to(eye, M.shape) + 0.0 * M

    def rotate_rows(B, pairs, c, s):
        # (G^T B)[p] = c B[p] - s B[q];  (G^T B)[q] = s B[p] + c B[q]
        rows = [B[..., i, :] for i in range(n)]
        for k, (p, q) in enumerate(pairs):
            ck, sk = c[..., k:k + 1], s[..., k:k + 1]
            rp, rq = rows[p], rows[q]
            rows[p] = ck * rp - sk * rq
            rows[q] = sk * rp + ck * rq
        return jnp.stack(rows, -2)

    def rotate_cols(B, pairs, c, s):
        # (B G)[:, p] = c B[:, p] - s B[:, q];  (B G)[:, q] = s ... + c ...
        cols = [B[..., :, i] for i in range(n)]
        for k, (p, q) in enumerate(pairs):
            ck, sk = c[..., k:k + 1], s[..., k:k + 1]
            cp, cq = cols[p], cols[q]
            cols[p] = ck * cp - sk * cq
            cols[q] = sk * cp + ck * cq
        return jnp.stack(cols, -1)

    def sweep(carry, _):
        A, V = carry
        for pairs in rounds:
            app = jnp.stack([A[..., p, p] for p, _ in pairs], -1)
            aqq = jnp.stack([A[..., q, q] for _, q in pairs], -1)
            apq = jnp.stack([A[..., p, q] for p, q in pairs], -1)
            theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c, s = jnp.cos(theta), jnp.sin(theta)
            # all updates are static-index row ops with the BATCH in the
            # vector lanes — n x n matmuls pad the MXU to death (measured
            # 1.2x eigh via batched-G matmuls vs ~10x this way); every op
            # here is an exact-f32 VPU FMA, so no bf16 demotion either.
            A = rotate_cols(rotate_rows(A, pairs, c, s), pairs, c, s)
            V = rotate_cols(V, pairs, c, s)
        return (A, V), None

    (A, V), _ = jax.lax.scan(sweep, (A, V), None, length=sweeps)
    evals = jnp.diagonal(A, axis1=-2, axis2=-1)
    return evals, V


def smallest_eigvec_of_normal_fast(A: jnp.ndarray,
                                   sweeps: int = 10) -> jnp.ndarray:
    """``smallest_eigvec_of_normal`` via ``jacobi_eigh_small`` — the
    RANSAC-hypothesis hot path (~10x the throughput of XLA eigh at n=9;
    the winner re-estimation keeps the LAPACK-grade ``eigh``)."""
    AtA = jnp.einsum("...mi,...mj->...ij", A, A, precision=HI)
    evals, V = jacobi_eigh_small(AtA, sweeps=sweeps)
    sel = jax.nn.one_hot(jnp.argmin(evals, -1), evals.shape[-1],
                         dtype=V.dtype)
    # HI: a plain einsum bf16-demotes V on TPU — 0.4% error on the null
    # vector broke downstream RANSAC inlier counts (506 vs 574 measured)
    return jnp.einsum("...ij,...j->...i", V, sel, precision=HI)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix [v]_x for ``v[..., 3]`` (Phase1/Utils.py:108-113)."""
    zero = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], zero], -1),
    ]
    return jnp.stack(rows, -2)


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (...,3) -> rotation matrix (...,3,3); stable at theta->0.

    Replaces cv2.Rodrigues (used by the reference BA,
    Phase1/BundleAdjustment.py:78) with a closed-form, differentiable version:
    R = I + sin(t)/t [r]_x + (1-cos(t))/t^2 [r]_x^2, with Taylor fallbacks.
    """
    theta2 = jnp.sum(rvec**2, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    # sin(t)/t and (1-cos t)/t^2 with series at small t (safe under grad)
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = skew(rvec)
    K2 = jnp.einsum("...ij,...jk->...ik", K, K, precision=HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def rotation_to_rvec(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (...,3,3) -> axis-angle (...,3) (inverse Rodrigues).

    Near theta=pi the antisymmetric part vanishes (R is symmetric), so the
    axis is recovered from the symmetric part instead: R + I = 2 aa^T +
    (1+cos t)(I - aa^T) ~ 2 aa^T at t=pi -> axis from the largest column of
    R + I, signs fixed against the off-diagonals."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # antisymmetric part gives axis*2sin(theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    sin_t = jnp.sin(theta)
    scale = jnp.where(
        theta < 1e-6, 0.5 + theta**2 / 12.0, theta / (2.0 * sin_t + 1e-32)
    )
    rvec_generic = w * scale[..., None]

    # near-pi branch: axis^2 from diag(R+I)/2, signs from the largest axis
    # component against the symmetric off-diagonals
    S = R + jnp.eye(3, dtype=R.dtype)
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], -1)
    axis_abs = jnp.sqrt(jnp.maximum(diag * 0.5, 0.0))
    k = jnp.argmax(axis_abs, axis=-1)

    def signed_axis(Rm, absax, kk):
        # a_i a_j = S_ij / 2; fix a_k > 0 and derive the other signs
        row = Rm[kk] + jnp.zeros(3, Rm.dtype).at[kk].set(1.0)
        signs = jnp.where(row >= 0, 1.0, -1.0)
        ax = absax * signs
        return ax / (jnp.linalg.norm(ax) + 1e-32)

    if R.ndim == 2:
        axis_pi = signed_axis(R, axis_abs, k)
        rvec_pi = axis_pi * theta
    else:
        axis_pi = jax.vmap(signed_axis)(R, axis_abs, k)
        rvec_pi = axis_pi * theta[..., None]

    # the generic branch stays accurate until sin(theta) underflows the
    # symmetric-part noise; switch only in the last ~5e-7 of angle where
    # w -> 0 exactly
    near_pi = (jnp.pi - theta) < 5e-7
    return jnp.where(near_pi[..., None], rvec_pi, rvec_generic)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [x,y,z,w] (scipy order, Phase1/PnP.py:200) -> R (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * (y**2 + z**2), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x**2 + z**2), 2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x**2 + y**2)], -1),
    ]
    return jnp.stack(rows, -2)


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """R (3,3) -> quaternion [x,y,z,w].  Shepperd's method, branch-free via
    picking the numerically largest construction."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def from_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s])

    def from_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s])

    def from_y():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s])

    def from_z():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s])

    cands = jnp.stack([from_w(), from_x(), from_y(), from_z()])
    scores = jnp.stack([tr, m00, m11, m22])
    q = cands[jnp.argmax(scores)]
    return q / jnp.linalg.norm(q)


def homogenize(pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)
