"""Convert reference PyTorch checkpoints (.pth) into our parameter pytrees.

The shipped checkpoints serialize the *legacy* Sequential architecture
(SURVEY §2.2): keys like ``fc1.0.weight (256,63)``, ``block1.{0,2,4}.*``,
``skip_layer.0.*``, ``block2.{0,2,4}.*`` (last one (257,256)), ``density_fc.*``
(unused), ``rgb_fc.{0,2}.*``.  The no-positional-encoding ablation checkpoint
is a skip-less variant whose block1 holds 6x(256,256) + 1x(257,256) layers.

Torch stores Linear weights (out, in); we store (in, out) — transposed here.
Requires torch (CPU) only at conversion time; the rest of the framework never
imports it.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from sfm_nerf_tpu.config import NeRFModelConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch  # local import: conversion-only dependency

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def _wb(sd: Dict[str, np.ndarray], prefix: str):
    return {"w": np.ascontiguousarray(sd[prefix + ".weight"].T),
            "b": sd[prefix + ".bias"]}


def convert_legacy_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[dict, NeRFModelConfig]:
    """Map a reference legacy state dict onto our pytree + config.

    Handles both shipped layouts:
    - standard: block1 of 3 layers + skip_layer + block2 of 3 (last 257-wide)
    - no-PE:    block1 of 6 layers + a 257-wide 7th, no skip_layer
    """
    def layer_indices(block: str):
        out = []
        for k in sd:
            m = re.fullmatch(rf"{block}\.(\d+)\.weight", k)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    block1_idx = layer_indices("block1")
    has_skip = "skip_layer.0.weight" in sd
    hidden = sd["fc1.0.weight"].shape[0]
    pos_in = sd["fc1.0.weight"].shape[1]
    dir_concat_in = sd["rgb_fc.0.weight"].shape[1]
    dir_in = dir_concat_in - hidden
    pos_encoding = pos_in != 3
    # PE dims: 3*(2L+1) -> L
    n_pos_freq = (pos_in // 3 - 1) // 2 if pos_encoding else 10
    n_dir_freq = (dir_in // 3 - 1) // 2 if pos_encoding else 4

    params = {"fc1": _wb(sd, "fc1.0")}
    # Split block1 into our block1 (256-wide) and block2 tail (last 3 layers
    # incl. the 257-wide one) when there is no skip layer.
    layers = [f"block1.{i}" for i in block1_idx]
    if has_skip:
        b2 = [f"block2.{i}" for i in layer_indices("block2")]
    else:
        layers, b2 = layers[:-3], layers[-3:]
    for i, name in enumerate(layers):
        params[f"block1_{i}"] = _wb(sd, name)
    if has_skip:
        params["skip"] = _wb(sd, "skip_layer.0")
    assert len(b2) == 3, f"expected 3 tail layers, got {b2}"
    for i, name in enumerate(b2):
        params[f"block2_{i}"] = _wb(sd, name)
    assert params["block2_2"]["w"].shape[1] == hidden + 1
    params["density_fc"] = _wb(sd, "density_fc")
    params["rgb1"] = _wb(sd, "rgb_fc.0")
    params["rgb2"] = _wb(sd, "rgb_fc.2")

    cfg = NeRFModelConfig(
        n_pos_freq=n_pos_freq,
        n_dir_freq=n_dir_freq,
        hidden=hidden,
        pos_encoding=pos_encoding,
        arch="legacy",
        n_block1_layers=len(layers),
        has_skip=has_skip,
    )
    return params, cfg


def convert_active_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[dict, NeRFModelConfig]:
    """Map a reference ACTIVE-class state dict (NeRFmodel, NeRFModel.py:
    101-202 — what the reference's train.py saves for self-trained runs)
    onto our pytree + config.  Keys: fc1, fc_layers.{0..3}, skip_layer,
    fc_layers2.{0..2}, density_layer, feature_layer, rgb_layer{1,2}."""
    hidden = sd["fc1.weight"].shape[0]
    pos_in = sd["fc1.weight"].shape[1]
    dir_in = sd["rgb_layer1.weight"].shape[1] - hidden
    pos_encoding = pos_in != 3
    n_pos_freq = (pos_in // 3 - 1) // 2 if pos_encoding else 10
    n_dir_freq = (dir_in // 3 - 1) // 2 if pos_encoding else 4

    params = {"fc1": _wb(sd, "fc1")}
    for i in range(4):
        params[f"fc_{i}"] = _wb(sd, f"fc_layers.{i}")
    params["skip"] = _wb(sd, "skip_layer")
    for i in range(3):
        params[f"fc2_{i}"] = _wb(sd, f"fc_layers2.{i}")
    params["density"] = _wb(sd, "density_layer")
    params["feature"] = _wb(sd, "feature_layer")
    params["rgb1"] = _wb(sd, "rgb_layer1")
    params["rgb2"] = _wb(sd, "rgb_layer2")
    cfg = NeRFModelConfig(
        n_pos_freq=n_pos_freq, n_dir_freq=n_dir_freq, hidden=hidden,
        pos_encoding=pos_encoding, arch="active",
    )
    return params, cfg


def convert_pth(path: str) -> Tuple[dict, NeRFModelConfig]:
    """One-call conversion: .pth file -> (params pytree of np arrays, config).
    Dispatches on the serialized layout: the shipped checkpoints are all
    legacy Sequential state dicts; self-trained reference checkpoints
    (train.py's saves) serialize the active class."""
    sd = load_torch_state_dict(path)
    if "fc1.weight" in sd:               # active class (plain nn.Linear fc1)
        return convert_active_state_dict(sd)
    return convert_legacy_state_dict(sd)


def export_legacy_to_pth(
    params: dict, cfg: NeRFModelConfig, path: str
) -> None:
    """Our legacy-arch pytree -> a reference-layout .pth state dict, loadable
    by the reference's torch code (round-trip interop: torch -> ours ->
    torch).  Only the standard legacy layout (block1 + skip + block2) and
    the skip-less no-PE layout are expressible."""
    import torch

    def t(a):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))

    sd = {}

    def put(prefix, layer):
        sd[prefix + ".weight"] = t(layer["w"].T)
        sd[prefix + ".bias"] = t(layer["b"])

    put("fc1.0", params["fc1"])
    n_b1 = cfg.n_block1_layers
    if cfg.has_skip:
        for i in range(n_b1):
            put(f"block1.{2 * i}", params[f"block1_{i}"])
        put("skip_layer.0", params["skip"])
        for i in range(3):
            put(f"block2.{2 * i}", params[f"block2_{i}"])
    else:
        # skip-less layout: block1 carries everything incl. the 257-wide tail
        for i in range(n_b1):
            put(f"block1.{2 * i}", params[f"block1_{i}"])
        for k, i in enumerate(range(n_b1, n_b1 + 3)):
            put(f"block1.{2 * i}", params[f"block2_{k}"])
    put("density_fc", params["density_fc"])
    put("rgb_fc.0", params["rgb1"])
    put("rgb_fc.2", params["rgb2"])
    torch.save(sd, path)


def export_active_to_pth(params: dict, path: str) -> None:
    """Our active-arch pytree -> a reference NeRFmodel state dict, loadable
    by the reference's train.py/test paths (round-trip interop)."""
    import torch

    def t(a):
        return torch.from_numpy(
            np.ascontiguousarray(np.asarray(a, np.float32)))

    def put(sd, prefix, layer):
        sd[prefix + ".weight"] = t(np.asarray(layer["w"]).T)
        sd[prefix + ".bias"] = t(layer["b"])

    sd = {}
    put(sd, "fc1", params["fc1"])
    for i in range(4):
        put(sd, f"fc_layers.{i}", params[f"fc_{i}"])
    put(sd, "skip_layer", params["skip"])
    for i in range(3):
        put(sd, f"fc_layers2.{i}", params[f"fc2_{i}"])
    put(sd, "density_layer", params["density"])
    put(sd, "feature_layer", params["feature"])
    put(sd, "rgb_layer1", params["rgb1"])
    put(sd, "rgb_layer2", params["rgb2"])
    torch.save(sd, path)
