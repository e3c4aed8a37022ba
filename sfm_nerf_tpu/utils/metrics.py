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


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
         sigma: float = 1.5, radius: int = 5) -> jnp.ndarray:
    """Mean structural similarity (Wang et al. 2004) for (H, W, C) images.

    Standard NeRF eval metric (ADDITION — the reference logs MSE only).
    Gaussian 11x11 window (sigma 1.5), K1=0.01 / K2=0.03, VALID-mode
    windows only (no padded borders), matching the original paper and
    skimage's gaussian_weights=True configuration.  Separable convolution
    as two dots so it runs on the MXU; jit/grad-safe.
    """
    if pred.ndim == 2:
        pred, target = pred[..., None], target[..., None]
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    k = _gaussian_kernel1d(sigma, radius)

    def blur(img):  # (H, W, C) -> valid-windowed (H-2r, W-2r, C)
        h, w, c = img.shape
        n = 2 * radius + 1
        # im2col along rows then cols via strided windows is wasteful at
        # these sizes; two small dense dots are simpler and MXU-friendly
        row = jnp.stack([img[i:h - 2 * radius + i] for i in range(n)], -1)
        img = jnp.einsum("hwcn,n->hwc", row, k)
        col = jnp.stack([img[:, i:w - 2 * radius + i] for i in range(n)], -1)
        return jnp.einsum("hwcn,n->hwc", col, k)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_p, mu_t = blur(p), blur(t)
    var_p = blur(p * p) - mu_p ** 2
    var_t = blur(t * t) - mu_t ** 2
    cov = blur(p * t) - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)
