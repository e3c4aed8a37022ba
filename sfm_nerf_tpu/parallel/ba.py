"""Point-sharded bundle adjustment over a device mesh.

The Schur-complement structure of BA (ops/ba.py) IS a sharding structure:
every per-point quantity — the 3x3 point blocks W, their inverses, the
coupling blocks Y, the point gradients and back-substituted point updates —
is independent across points, while the camera system everything reduces
into is tiny ((6N)^2, 30x30 for 5 cameras).  So the TPU-native scale-out is:
shard the POINT axis over the mesh's data axis, turn the point-axis
reductions (U, g_cam, S, rhs, cost) into ``psum`` over ICI, and let every
device redundantly solve the small replicated camera system — zero extra
communication beyond the handful of psums per LM iteration.  Communication
per iteration is O(N^2 * 36) floats (the Schur matrix), independent of the
point count, so the method scales to clouds far beyond one chip's HBM.

This is the multi-chip analog of the reference's dense scipy BA
(Phase1/BundleAdjustment.py:122-160), which at 50 cams x 20k points cannot
even build its Jacobian.  The underlying math and LM schedule are
``ops.ba.bundle_adjust`` with ``axis_name`` set.  Results match the
single-device path to reduction-order rounding ONLY: the per-shard partial
sums reassociate the point-axis additions, so the psummed cost differs by
ulps, and a near-flat LM step can flip its accept/reject decision — the
damping TRAJECTORY may fork even though the converged optimum agrees
tightly (tests assert cost rtol 1e-9 and geometry atol 1e-5, not
bit-equality; cf. the MSAC tie-flip note in CLAUDE.md for the same
platform-rounding phenomenon in RANSAC).

Single-chip callers should keep using ``bundle_adjust``; the SfM driver
switches here when ``--ba_devices > 1``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sfm_nerf_tpu.ops.ba import BAResult, bundle_adjust


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "n_iters", "loss", "refine_intrinsics"),
)
def bundle_adjust_sharded(
    K: jnp.ndarray,              # (3,3)
    camera_params: jnp.ndarray,  # (N,6) [rvec, tvec] world->cam
    points: jnp.ndarray,         # (M,3)
    observations: jnp.ndarray,   # (N,M,2)
    visibility: jnp.ndarray,     # (N,M) 1/0
    *,
    mesh,
    axis: str = "data",
    n_iters: int = 50,
    lambda0: float = 1e-3,
    loss: str = "linear",
    huber_delta: float = 3.0,
    refine_intrinsics: str = "",
) -> BAResult:
    """``bundle_adjust`` with the point axis sharded over ``mesh[axis]``.

    The point count is zero-padded to a device multiple; padded points carry
    zero visibility, so they contribute nothing to any reduction (their
    damped 3x3 blocks are lam*I, trivially invertible) and are trimmed from
    the returned cloud.
    """
    n_dev = mesh.shape[axis]
    n_pts = points.shape[0]
    pad = (-n_pts) % n_dev
    if pad:
        points = jnp.concatenate(
            [points, jnp.zeros((pad, 3), points.dtype)]
        )
        observations = jnp.concatenate(
            [
                observations,
                jnp.full(
                    (observations.shape[0], pad, 2), -1.0,
                    observations.dtype,
                ),
            ],
            axis=1,
        )
        visibility = jnp.concatenate(
            [
                visibility,
                jnp.zeros((visibility.shape[0], pad), visibility.dtype),
            ],
            axis=1,
        )

    res = shard_map(
        functools.partial(
            bundle_adjust,
            n_iters=n_iters, lambda0=lambda0, loss=loss,
            huber_delta=huber_delta, axis_name=axis,
            refine_intrinsics=refine_intrinsics,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(None, axis), P(None, axis)),
        out_specs=BAResult(P(), P(axis), P(), P(), P(), P(), P()),
    )(K, camera_params, points, observations, visibility)
    return res._replace(points=res.points[:n_pts])
