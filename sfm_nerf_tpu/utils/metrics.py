"""Image/reconstruction metrics.

The reference logs MSE only and never computes PSNR (Phase2/train.py:460,
678-679); PSNR = -10*log10(MSE) is the BASELINE parity metric, so both live
here.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr_from_mse(mse_val) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse_val, 1e-12))


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return psnr_from_mse(mse(pred, target))
