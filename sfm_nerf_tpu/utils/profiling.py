"""Profiling & tracing hooks.

The reference has none (SURVEY §5: an unused ``time`` import and tqdm bars).
Here: jax.profiler trace capture around arbitrary code, a step timer that
distinguishes compile from steady-state, and simple TPU HBM telemetry.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step statistics that separate the first (compiling) call
    from steady state — essential on remote-compile attachments where the
    first call costs minutes and naive rays/sec is off by 1000x (measured)."""

    def __init__(self):
        self.first_s: Optional[float] = None
        self.times: list = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if self.first_s is None:
            self.first_s = dt
        else:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        steady = np.asarray(self.times) if self.times else None
        return {
            "compile_call_s": self.first_s or 0.0,
            "steady_mean_s": float(steady.mean()) if steady is not None else 0.0,
            "steady_p50_s": float(np.median(steady)) if steady is not None else 0.0,
            "n_steady": len(self.times),
        }


def device_memory_stats() -> Dict[str, int]:
    """Per-device HBM usage where the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", -1),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", -1),
                "bytes_limit": s.get("bytes_limit", -1),
            }
        except Exception:
            out[str(d)] = {}
    return out
