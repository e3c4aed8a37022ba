"""Global rotation averaging (spectral / chordal relaxation).

The reference's incremental registration (Phase1/Wrapper.py main loop)
chains two-view poses camera-by-camera, so pose error compounds along the
chain.  Rotation averaging solves all global rotations AT ONCE from the
pairwise relative rotations — the standard initialization for global SfM
(Martinec & Pajdla CVPR'07; Arie-Nachimson et al. 3DV'12 spectral form
implemented here from the published math).

Convention: world-to-camera rotations, projection K R [I | -C]; the
relative rotation of an (i, j) pair is R_ij = R_j R_i^T (camera-i frame ->
camera-j frame), which is exactly what ``decompose_essential`` + cheirality
yields for a pair.

Method: for consistent rotations the (3N, 3N) block matrix S with
S_ij = R_i R_j^T = R_ij^T equals R_hat R_hat^T for the (3N, 3) stack
R_hat of the R_i — rank 3 with top eigenvalue N.  With noisy/partial
measurements, fill known blocks (identity diagonal), take the top-3
eigenvectors of the degree-normalized S, and project each 3x3 block back
to SO(3) (SVD with det fix).  One eigh — batched, jit-safe, TPU-friendly
(symmetric eigendecomposition lowers everywhere, unlike nonsymmetric eig).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def project_to_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation(s) to (..., 3, 3) in Frobenius norm."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones(M.shape[:-2] + (2,), M.dtype), det[..., None]], axis=-1
    )
    return (U * D[..., None, :]) @ Vt


def rotation_averaging(
    pairs: Sequence[Tuple[int, int]],
    R_rel: jnp.ndarray,
    n_cams: int,
    anchor: int = 0,
) -> jnp.ndarray:
    """Global world-to-camera rotations from pairwise measurements.

    HOST-SIDE DRIVER OP — call it OUTSIDE jit: ``pairs`` must be concrete
    (the connected-component restriction below is data-dependent
    control flow; tracing raises TracerArrayConversionError).  This is a
    deliberate API contract, not an oversight: the op runs once per
    reconstruction from the host pipeline and its cost is the batched
    eigh, which is jitted internally.

    pairs: M (i, j) index pairs (0-based, host-side values);
    R_rel: (M, 3, 3) with R_rel[m] = R_j R_i^T.  Returns (n_cams, 3, 3)
    with the ``anchor`` camera's rotation = identity (the usual gauge).
    Cameras not connected to the anchor come back as identity.

    The solve is RESTRICTED to the anchor's connected component: an
    isolated camera's exact eigenvalue-1 identity diagonal block would
    otherwise displace the connected component's (noise-perturbed, < 1)
    top eigenvectors and corrupt EVERY returned rotation (measured: 151
    deg errors on the connected cameras with one edge-less camera
    present, 0.6 deg without).  Other disconnected components are also
    left at identity — their gauge is unrelated to the anchor's anyway.
    """
    import numpy as np

    pairs_np = np.asarray(pairs, np.int64).reshape(-1, 2)
    # union-find: anchor's connected component
    parent = list(range(n_cams))

    def _find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in pairs_np:
        parent[_find(int(i))] = _find(int(j))
    comp = np.array([_find(c) == _find(anchor) for c in range(n_cams)])
    if not comp.all():
        keep = np.nonzero(comp)[0]
        remap = -np.ones(n_cams, np.int64)
        remap[keep] = np.arange(len(keep))
        edge_in = comp[pairs_np[:, 0]] & comp[pairs_np[:, 1]]
        R_sub = rotation_averaging(
            remap[pairs_np[edge_in]], jnp.asarray(R_rel)[edge_in],
            len(keep), anchor=int(remap[anchor]),
        )
        out = jnp.broadcast_to(
            jnp.eye(3, dtype=R_sub.dtype), (n_cams, 3, 3)
        ).at[keep].set(R_sub)
        return out

    pairs = jnp.asarray(pairs, jnp.int32).reshape(-1, 2)
    R_rel = jnp.asarray(R_rel)
    dtype = R_rel.dtype
    N = n_cams

    S = jnp.zeros((3 * N, 3 * N), dtype)
    eye_blocks = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (N, 3, 3))
    S = _scatter_blocks(S, jnp.arange(N), jnp.arange(N), eye_blocks)
    # S_ij = R_ij^T, S_ji = R_ij (symmetric by construction).  ADD, not
    # set: a pair measured twice contributes both measurements (their
    # block sum — consistent with deg counting every edge below); a
    # last-write-wins set would silently drop one while deg still
    # counted it
    S = _scatter_blocks(S, pairs[:, 0], pairs[:, 1],
                        jnp.swapaxes(R_rel, -1, -2), add=True)
    S = _scatter_blocks(S, pairs[:, 1], pairs[:, 0], R_rel, add=True)

    # degree normalization (D^-1/2 S D^-1/2) evens out uneven graphs
    deg = jnp.ones((N,), dtype)
    deg = deg.at[pairs[:, 0]].add(1.0)
    deg = deg.at[pairs[:, 1]].add(1.0)
    d = jnp.repeat(1.0 / jnp.sqrt(deg), 3)
    Sn = S * d[:, None] * d[None, :]

    _, vecs = jnp.linalg.eigh(Sn)            # ascending eigenvalues
    top3 = vecs[:, -3:]                      # (3N, 3)
    blocks = top3.reshape(N, 3, 3)
    # the eigenbasis is only defined up to a GLOBAL Q in O(3):
    # blocks_i ~ R_i Q^T (possibly det(Q) = -1, which would corrupt a
    # per-block SO(3) projection).  Right-multiplying by the anchor block's
    # transpose cancels Q exactly — blocks_i blocks_a^T = R_i R_a^T — and
    # fixes the gauge (R_anchor -> I) in the same step; project AFTER.
    # Precision note: the top eigenvalue has multiplicity 3 (degenerate),
    # so f32 eigh resolves the eigenSPACE but the basis within it is
    # noisy — measured ~5 deg global error on TPU f32 vs 2e-6 deg in f64.
    # Run in f64 (the SfM host default) when accuracy matters.
    R = jnp.matmul(
        blocks, jnp.swapaxes(blocks[anchor], -1, -2)[None],
        precision=jax.lax.Precision.HIGHEST)
    return project_to_so3(R)


def _scatter_blocks(S, rows, cols, blocks, add=False):
    """S[3r:3r+3, 3c:3c+3] = (or +=) block, vectorized over the index
    arrays; ``add=True`` accumulates duplicate (row, col) pairs instead
    of dropping all but an unspecified one."""
    r0 = 3 * jnp.asarray(rows, jnp.int32)
    c0 = 3 * jnp.asarray(cols, jnp.int32)
    ri = (r0[:, None, None] + jnp.arange(3)[None, :, None])
    ci = (c0[:, None, None] + jnp.arange(3)[None, None, :])
    ri = jnp.broadcast_to(ri, blocks.shape)
    ci = jnp.broadcast_to(ci, blocks.shape)
    return S.at[ri, ci].add(blocks) if add else S.at[ri, ci].set(blocks)


def relative_rotation_residuals(
    pairs, R_rel: jnp.ndarray, R_glob: jnp.ndarray
) -> jnp.ndarray:
    """Per-pair angular error (radians) of global rotations vs measurements
    — the quantity rotation averaging minimizes; useful as a consistency
    check and for outlier-edge detection."""
    pairs = jnp.asarray(pairs, jnp.int32).reshape(-1, 2)
    Ri = R_glob[pairs[:, 0]]
    Rj = R_glob[pairs[:, 1]]
    pred = Rj @ jnp.swapaxes(Ri, -1, -2)
    rel = pred @ jnp.swapaxes(jnp.asarray(R_rel), -1, -2)
    cos = (jnp.trace(rel, axis1=-2, axis2=-1) - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))
