"""Orbax-backed checkpointing (ROADMAP item: async / multi-host saves).

The default ``train/checkpoint.py`` writes one transparent .npz per step —
perfect for a single host, but saves block the train loop while arrays
cross to the host, and multi-controller meshes need a coordinated writer.
Orbax's CheckpointManager gives both for free: async saves overlap the next
train step (the arrays are snapshotted at save()), every process
participates in a distributed save, and retention is managed.

Opt-in via ``TrainConfig.ckpt_backend='orbax'``; the npz format stays the
default for its greppability and zero extra deps at load time.

Same resume semantics: numerically-latest step wins (orbax steps are ints —
the reference's lexicographic-sort bug class, train.py:414, cannot occur).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


class OrbaxCheckpointer:
    """Minimal wrapper matching the trainer's save/resume contract."""

    def __init__(self, ckpt_dir: str, max_to_keep: Optional[int] = None,
                 async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._dir = os.path.abspath(ckpt_dir)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, params: Any, opt_state: Any = None,
             extra: Optional[dict] = None) -> None:
        if step in self._mgr.all_steps():
            return                       # idempotent (final == cadence step)
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if extra:
            payload["extra"] = dict(extra)
        self._mgr.save(step, args=self._ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, params_template: Any, opt_state_template: Any = None,
        step: Optional[int] = None, extra_template: Optional[dict] = None,
    ) -> Tuple[Any, Any, int]:
        """Restore into the given templates.  ``extra_template`` must mirror
        the ``extra`` dict passed at save time (default: the trainer's
        ``{'loss': ...}``) — orbax restores by matching tree structure."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoint in {self._dir}")
        payload = {"params": params_template}
        if opt_state_template is not None:
            payload["opt_state"] = opt_state_template
        if extra_template is None:
            extra_template = {"loss": 0.0}
        payload["extra"] = extra_template
        out = self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(payload))
        return out["params"], out.get("opt_state"), step

    def wait(self) -> None:
        """Block until any in-flight async save has committed."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
