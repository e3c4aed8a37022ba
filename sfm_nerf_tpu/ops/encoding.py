"""Positional encoding.

Order parity with the reference (Phase2/NeRFModel.py:142-156): the output is
``concat([x, sin(2^0 pi x), cos(2^0 pi x), ..., sin(2^(L-1) pi x),
cos(2^(L-1) pi x)], -1)`` — identity first, then per-frequency sin/cos pairs,
each a 3-vector.  This layout matters because converted .pth weights index it.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def positional_encoding(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """Encode ``x[..., D]`` into ``[..., D*(2*n_freqs+1)]``.

    Vectorized over frequencies: instead of a Python loop appending
    sin/cos per frequency, build the whole (..., n_freqs, 2, D) block with one
    broadcast multiply so XLA fuses it into the consuming matmul.
    """
    if n_freqs == 0:
        return x
    # Compute 2^l * pi in float64 then round once to the compute dtype —
    # matches the reference's `2.0**i * np.pi` Python-scalar product
    # (NeRFModel.py:153), which matters at l=9 where the argument reduction of
    # sin/cos amplifies one ULP of the frequency into O(1e-4) encoding error.
    freqs = (np.pi * 2.0 ** np.arange(n_freqs)).astype(x.dtype)  # (L,)
    # (..., L, D): x broadcast against frequency bank
    xb = x[..., None, :] * jnp.asarray(freqs)[:, None]
    # interleave sin/cos per frequency: (..., L, 2, D) -> (..., L*2*D)
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1)
