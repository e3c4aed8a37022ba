"""Decompose the per-process first-big-program overhead on the axon relay:
backend init vs first tiny execution vs cache-hit compile vs first/steady
execution of the big RANSAC program."""
import time, numpy as np
from sfm_nerf_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()

t0 = time.time()
import jax, jax.numpy as jnp
devs = jax.devices()
print(f"import jax + jax.devices(): {time.time()-t0:.1f}s  ({devs})")

t0 = time.time()
x = jnp.ones((8, 8)); float(jnp.sum(x))
print(f"first tiny program (compile+exec): {time.time()-t0:.1f}s")
t0 = time.time()
y = jnp.ones((16, 16)); float(jnp.sum(y))
print(f"second tiny program (new shape): {time.time()-t0:.1f}s")

from sfm_nerf_tpu.ops.epipolar import ransac_fundamental
rng = np.random.default_rng(0)
pts1 = jnp.asarray(rng.uniform(0, 800, (1024, 2)), jnp.float32)
pts2 = jnp.asarray(pts1 + rng.normal(0, 1, (1024, 2)), jnp.float32)

t0 = time.time()
lowered = jax.jit(lambda k, a, b: ransac_fundamental(
    k, a, b, n_iters=50000, threshold=5e-4)).lower(
    jax.random.key(0), pts1, pts2)
print(f"trace+lower: {time.time()-t0:.1f}s")
t0 = time.time()
compiled = lowered.compile()
dt = time.time() - t0
print(f"compile ({'cache hit' if dt < 30 else 'cache miss?'}): {dt:.1f}s")
t0 = time.time()
out = compiled(jax.random.key(0), pts1, pts2)
jax.tree_util.tree_map(lambda v: np.asarray(v), out)
print(f"first exec: {time.time()-t0:.1f}s")
t0 = time.time()
out = compiled(jax.random.key(1), pts1, pts2)
jax.tree_util.tree_map(lambda v: np.asarray(v), out)
print(f"steady exec: {time.time()-t0:.1f}s")
