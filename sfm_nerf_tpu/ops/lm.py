"""Generic small-parameter Levenberg-Marquardt, jit/vmap-friendly.

Replaces the reference's per-point / per-pose scipy ``least_squares`` calls
(TRF in Phase1/Triangulation.py:255-267, LM in Phase1/PnP.py:232) with a
fixed-iteration damped Gauss-Newton that runs entirely on device:

- residual function r(x) -> (M,), parameters x -> (P,), P small (3..7-ish);
- Jacobian via jax.jacfwd (forward mode: P columns, cheap);
- classic lambda schedule: accept step -> lambda /= down, reject -> lambda *= up;
- fixed trip count (lax.scan) so thousands of independent solves vmap into
  one launch — the reference loops scipy over points one at a time.
"""

from __future__ import annotations


from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from sfm_nerf_tpu.ops.linalg import HI


def levenberg_marquardt(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    n_iters: int = 20,
    lambda0: float = 1e-3,
    lambda_up: float = 10.0,
    lambda_down: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Minimize ||r(x)||^2.  Returns (x_opt, initial_cost, final_cost)."""

    def cost(x):
        r = residual_fn(x)
        return jnp.sum(r * r)

    jac = jax.jacfwd(residual_fn)

    def step(carry, _):
        x, lam, c = carry
        r = residual_fn(x)
        J = jac(x)                                       # (M, P)
        JtJ = jnp.einsum("mi,mj->ij", J, J, precision=HI)
        Jtr = jnp.einsum("mi,m->i", J, r, precision=HI)
        P = x.shape[-1]
        A = JtJ + lam * jnp.eye(P, dtype=x.dtype)
        dx = -jnp.linalg.solve(A, Jtr)
        x_new = x + dx
        c_new = cost(x_new)
        improved = jnp.isfinite(c_new) & (c_new < c)
        x = jnp.where(improved, x_new, x)
        c = jnp.where(improved, c_new, c)
        lam = jnp.where(improved, lam * lambda_down, lam * lambda_up)
        lam = jnp.clip(lam, 1e-12, 1e12)
        return (x, lam, c), None

    c0 = cost(x0)
    (x, _, c), _ = jax.lax.scan(
        step, (x0, jnp.asarray(lambda0, x0.dtype), c0), None, length=n_iters
    )
    return x, c0, c
