"""NeRF model families as pure JAX pytrees (no framework classes).

Params are nested dicts of jnp arrays, so they thread straight through jit,
grad, optax, and jax.sharding without adapters.
"""

from sfm_nerf_tpu.models.nerf import (  # noqa: F401
    init_nerf_params,
    nerf_apply,
    param_count,
)
