"""Lightweight, transparent checkpointing (single .npz per step).

Save format: one ``model_{step:06d}.ckpt.npz`` holding params + optimizer
state + step, keys being '/'-joined pytree paths.  Mirrors the reference's
per-iteration dict checkpoints {iteration, model, optimizer, loss}
(Phase2/train.py:509-528) but:

- resume picks the NUMERICALLY newest step — the reference's lexicographic
  ``sorted(glob(...))`` resume (train.py:414) regresses model_9000 over
  model_10000 (SURVEY §5); we keep its filename scheme and fix the sort;
- arrays are stored device-agnostic (numpy) — restoring onto any mesh or
  sharding is the caller's concern.

Reference .pth ingestion lives in ``models/convert.py``.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

SEP = "//"


def flatten_pytree(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if isinstance(p, jax.tree_util.DictKey):
        return f"d:{p.key}"
    if isinstance(p, jax.tree_util.SequenceKey):
        return f"s:{p.idx}"
    if isinstance(p, jax.tree_util.GetAttrKey):
        return f"a:{p.name}"
    return f"x:{p}"


def unflatten_into(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    """Restore values into the structure of ``template`` (same treedef)."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves:
        key = SEP.join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing {key}")
        val = flat[key]
        leaves.append(np.asarray(val, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    ckpt_dir: str, step: int, params: Any, opt_state: Any = None,
    extra: Optional[Dict[str, float]] = None, final: bool = False,
) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    blobs = {f"params{SEP}{k}": v for k, v in flatten_pytree(params).items()}
    if opt_state is not None:
        blobs.update(
            {f"opt{SEP}{k}": v for k, v in flatten_pytree(opt_state).items()}
        )
    blobs["step"] = np.asarray(step, np.int64)
    for k, v in (extra or {}).items():
        blobs[f"extra{SEP}{k}"] = np.asarray(v)
    name = "final_model.ckpt.npz" if final else f"model_{step:06d}.ckpt.npz"
    path = os.path.join(ckpt_dir, name)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **blobs)
    os.replace(tmp, path)
    return path


def latest_checkpoint(ckpt_dir: str, prefer_final: bool = False) -> Optional[str]:
    final = os.path.join(ckpt_dir, "final_model.ckpt.npz")
    if prefer_final and os.path.exists(final):
        return final
    candidates = glob.glob(os.path.join(ckpt_dir, "model_*.ckpt.npz"))
    if not candidates:
        return final if os.path.exists(final) else None

    def step_of(p: str) -> int:
        m = re.search(r"model_(\d+)\.ckpt\.npz$", p)
        return int(m.group(1)) if m else -1

    return max(candidates, key=step_of)


def load_params_untyped(path: str) -> Tuple[dict, int]:
    """Load just the params from a checkpoint WITHOUT a template, rebuilding
    the nested-dict structure from the stored key paths.  Lets CLIs (e.g. the
    gif renderer, whose reference-parity flag set has no --hidden_size) infer
    the architecture from the checkpoint instead of requiring matching flags.
    """
    with np.load(path) as z:
        flat = dict(z)
    step = int(flat.pop("step"))
    params: dict = {}
    prefix = "params" + SEP
    for k, v in flat.items():
        if not k.startswith(prefix):
            continue
        node = params
        parts = [p[2:] for p in k[len(prefix):].split(SEP)]  # strip 'd:' tags
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return params, step


def infer_model_config(params: dict):
    """NeRFModelConfig from a params dict's shapes (active or legacy arch)."""
    from sfm_nerf_tpu.config import NeRFModelConfig

    arch = "active" if "feature" in params else "legacy"
    hidden = int(params["fc1"]["b"].shape[0])
    pos_in = int(params["fc1"]["w"].shape[0])
    dir_in = int(params["rgb1"]["w"].shape[0]) - hidden
    pos_encoding = pos_in != 3
    n_pos = (pos_in // 3 - 1) // 2 if pos_encoding else 10
    n_dir = (dir_in // 3 - 1) // 2 if pos_encoding else 4
    n_block1 = sum(1 for k in params if k.startswith("block1_"))
    return NeRFModelConfig(
        n_pos_freq=n_pos, n_dir_freq=n_dir, hidden=hidden,
        pos_encoding=pos_encoding, arch=arch,
        n_block1_layers=n_block1 or 3, has_skip="skip" in params,
    )


def load_checkpoint(
    path: str, params_template: Any, opt_state_template: Any = None
) -> Tuple[Any, Any, int]:
    with np.load(path) as z:
        flat = dict(z)
    step = int(flat.pop("step"))
    pflat = {
        k[len("params" + SEP):]: v for k, v in flat.items()
        if k.startswith("params" + SEP)
    }
    params = unflatten_into(params_template, pflat)
    opt_state = None
    if opt_state_template is not None:
        oflat = {
            k[len("opt" + SEP):]: v for k, v in flat.items()
            if k.startswith("opt" + SEP)
        }
        opt_state = unflatten_into(opt_state_template, oflat)
    return params, opt_state, step
