"""Device-mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: int = 0,
    tp: int = 1,
    devices: Optional[Sequence] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """('data', 'model') mesh.  ``dp<=0`` consumes all remaining devices.

    On a real slice, jax.devices() ordering follows the physical torus, so a
    contiguous reshape keeps the data axis on ICI neighbours (the
    bandwidth-heavy psum axis), matching the scaling-book recipe.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp < 1 or n % tp:
        raise ValueError(f"tp={tp} must divide device count {n}")
    if dp <= 0:
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"dp*tp={dp * tp} exceeds device count {n}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (data_axis, model_axis))
