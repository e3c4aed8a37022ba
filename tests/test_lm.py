"""Generic Levenberg-Marquardt solver."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.ops.lm import levenberg_marquardt


def test_lm_solves_rosenbrock():
    def residual(x):
        return jnp.asarray([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    x0 = jnp.asarray([-1.2, 1.0])
    x, c0, c1 = levenberg_marquardt(residual, x0, n_iters=100)
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-6)
    assert float(c1) < 1e-12 < float(c0)


def test_lm_never_increases_cost(rng):
    """Accept/reject: the carried cost is monotone non-increasing even on a
    nasty landscape."""
    A = jnp.asarray(rng.normal(size=(10, 3)))
    b = jnp.asarray(rng.normal(size=(10,)))

    def residual(x):
        return A @ jnp.sin(3.0 * x) - b   # non-convex

    costs = []
    x = jnp.asarray(rng.normal(size=3))
    for n in (1, 5, 20, 60):
        _, c0, c1 = levenberg_marquardt(residual, x, n_iters=n)
        costs.append(float(c1))
    assert all(b <= a + 1e-12 for a, b in zip(costs, costs[1:])), costs


def test_lm_vmaps(rng):
    """The point of the design: thousands of independent solves, one launch."""
    targets = jnp.asarray(rng.normal(size=(64, 2)))

    def make_res(t):
        return lambda x: x - t

    def solve(t):
        return levenberg_marquardt(lambda x: x - t, jnp.zeros(2), n_iters=5)[0]

    xs = jax.vmap(solve)(targets)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(targets), atol=1e-6)
