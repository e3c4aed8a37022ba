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

    Matmul formulation: the whole sin/cos bank is ONE ``x @ F + phase``
    followed by ONE wide ``sin`` (cos via a pi/2 phase shift).  The naive
    per-frequency build does 2L narrow (..., D)-wide vector ops — on TPU
    that is D/128 lane utilization per op (D=3 for NeRF), measured to
    dominate the fused render kernel before this change; the same shape
    problem applies inside the XLA training graph.

    Frequencies are 2^l * pi computed in float64 and rounded once to the
    compute dtype — matching the reference's `2.0**i * np.pi` Python-scalar
    product (NeRFModel.py:153), which matters at l=9 where sin/cos argument
    reduction amplifies one ULP of the frequency into O(1e-4) output error.
    """
    if n_freqs == 0:
        return x
    d = x.shape[-1]
    F, phase = _trig_bank(n_freqs, d, np.dtype(x.dtype).name)
    u = x @ jnp.asarray(F, x.dtype)
    enc = jnp.sin(u + jnp.asarray(phase, x.dtype))
    return jnp.concatenate([x, enc], axis=-1)


def _trig_bank(n_freqs: int, d: int, dtype: str):
    """(F (d, 2*L*d), phase (2*L*d,)) with the reference's column order:
    per frequency l, d sin columns then d cos columns."""
    cols = 2 * n_freqs * d
    F = np.zeros((d, cols))
    phase = np.zeros(cols)
    for c in range(cols):
        l, r = divmod(c, 2 * d)
        j = r % d
        F[j, c] = np.pi * 2.0**l
        if r >= d:
            phase[c] = np.pi / 2      # cos(u) = sin(u + pi/2)
    return F.astype(dtype), phase.astype(dtype)
