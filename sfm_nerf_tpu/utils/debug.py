"""Numerics debugging — the TPU-native analog of the reference's always-on
``torch.autograd.set_detect_anomaly(True)`` (Phase2/train.py:390), but behind
a flag because it costs real throughput."""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax


def enable_nan_debugging(enable: bool = True) -> None:
    """Global NaN trap: any jit-produced NaN raises with a traceback."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def nan_debugging() -> Iterator[None]:
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side finite check over a pytree (use at checkpoint boundaries)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            raise FloatingPointError(
                f"non-finite values in {name} at {jax.tree_util.keystr(path)}"
            )
