"""NeRF MLPs as pure functions over parameter pytrees.

Two architectures, matching the reference byte-for-byte in structure:

- ``active``  — the live class (Phase2/NeRFModel.py:101-202): fc1 -> 4 hidden
  layers -> skip-concat(PE(pos)) -> skip layer -> 3 hidden layers ->
  {softplus density head; ReLU feature layer} -> RGB head
  (concat feature+PE(dir) -> 128 -> 3, sigmoid).
- ``legacy``  — the commented Sequential variant (Phase2/NeRFModel.py:7-99)
  that every shipped checkpoint serializes: fc1 -> block1 (n layers) ->
  optional skip layer -> block2 ending in a (hidden+1)-wide ReLU layer whose
  channel 0 IS the density (post-ReLU, no softplus) -> RGB head.  The shipped
  no-positional-encoding checkpoint is a skip-less legacy net with a 7+1-layer
  block1 (verified by loading checkpoints_no_pos_encoding/final_model.pth).

Weights are stored (fan_in, fan_out) so the forward pass is ``x @ W + b`` —
batched onto the MXU without transposes.  Init replicates torch.nn.Linear's
default U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W and b so training
dynamics are comparable to the reference.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sfm_nerf_tpu.config import NeRFModelConfig
from sfm_nerf_tpu.ops.encoding import positional_encoding

Params = Dict[str, Dict[str, jnp.ndarray]]


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = 1.0 / jnp.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _linear(p, x):
    """x @ W + b with f32 accumulation.  If W is bf16 (mixed-precision
    training / serving), the activation is cast down so the MXU runs a
    bf16 x bf16 -> f32 matmul; bias add stays f32."""
    w = p["w"]
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    acc = jnp.float64 if w.dtype == jnp.float64 else jnp.float32
    out = jnp.dot(x, w, preferred_element_type=acc)
    return out + p["b"].astype(acc)


def cast_params_bf16(params: "Params") -> "Params":
    """bf16 copies of the weight matrices (biases stay f32) — the compute
    cast for mixed-precision; optimizer state keeps f32 masters."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.ndim == 2 else a, params
    )


def init_nerf_params(key: jax.Array, cfg: NeRFModelConfig, dtype=jnp.float32) -> Params:
    h = cfg.hidden
    pos_dim, dir_dim = cfg.pos_dim, cfg.dir_dim
    keys = iter(jax.random.split(key, 32))
    params: Params = {}
    if cfg.arch == "active":
        params["fc1"] = _linear_init(next(keys), pos_dim, h, dtype)
        for i in range(4):
            params[f"fc_{i}"] = _linear_init(next(keys), h, h, dtype)
        params["skip"] = _linear_init(next(keys), h + pos_dim, h, dtype)
        for i in range(3):
            params[f"fc2_{i}"] = _linear_init(next(keys), h, h, dtype)
        params["density"] = _linear_init(next(keys), h, 1, dtype)
        params["feature"] = _linear_init(next(keys), h, h, dtype)
        params["rgb1"] = _linear_init(next(keys), h + dir_dim, 128, dtype)
        params["rgb2"] = _linear_init(next(keys), 128, 3, dtype)
    elif cfg.arch == "legacy":
        params["fc1"] = _linear_init(next(keys), pos_dim, h, dtype)
        for i in range(cfg.n_block1_layers):
            params[f"block1_{i}"] = _linear_init(next(keys), h, h, dtype)
        if cfg.has_skip:
            params["skip"] = _linear_init(next(keys), h + pos_dim, h, dtype)
        params["block2_0"] = _linear_init(next(keys), h, h, dtype)
        params["block2_1"] = _linear_init(next(keys), h, h, dtype)
        params["block2_2"] = _linear_init(next(keys), h, h + 1, dtype)
        # density_fc exists in every shipped state dict but is unused by the
        # forward pass (Phase2/NeRFModel.py:52,91) — kept for round-tripping.
        params["density_fc"] = _linear_init(next(keys), h, 1, dtype)
        params["rgb1"] = _linear_init(next(keys), h + dir_dim, 128, dtype)
        params["rgb2"] = _linear_init(next(keys), 128, 3, dtype)
    else:
        raise ValueError(f"unknown arch {cfg.arch!r}")
    if cfg.density_bias_init:
        # sparse-scene anti-collapse init (config.py:density_bias_init):
        # start the density head's pre-activation positive so the field
        # opens as thin fog and every ray carries gradient
        b = jnp.asarray(cfg.density_bias_init, dtype)
        if cfg.arch == "active":
            params["density"]["b"] = params["density"]["b"] + b
        else:
            # legacy: density is channel 0 of the block2_2 output
            params["block2_2"]["b"] = params["block2_2"]["b"].at[0].add(b)
    return params


def nerf_apply(
    params: Params,
    pos: jnp.ndarray,
    direction: jnp.ndarray,
    cfg: NeRFModelConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the MLP at ``pos[..., 3]`` viewed along ``direction[..., 3]``.

    Returns ``(density[..., 1], rgb[..., 3])``.  Pure function of leading
    batch dims — callers flatten (rays, samples) into one big matmul batch.
    """
    if cfg.pos_encoding:
        pe = positional_encoding(pos, cfg.n_pos_freq)
        de = positional_encoding(direction, cfg.n_dir_freq)
    else:
        pe, de = pos, direction

    relu = jax.nn.relu
    if cfg.arch == "active":
        hcur = relu(_linear(params["fc1"], pe))
        for i in range(4):
            hcur = relu(_linear(params[f"fc_{i}"], hcur))
            if i == 3:  # skip-concat after the 4th layer (NeRFModel.py:180-185)
                hcur = relu(_linear(params["skip"], jnp.concatenate([hcur, pe], -1)))
        for i in range(3):
            hcur = relu(_linear(params[f"fc2_{i}"], hcur))
        density = jax.nn.softplus(_linear(params["density"], hcur))
        feature = relu(_linear(params["feature"], hcur))
        rgb_in = jnp.concatenate([feature, de], -1)
        rgb = jax.nn.sigmoid(_linear(params["rgb2"], relu(_linear(params["rgb1"], rgb_in))))
        return density, rgb

    # legacy
    hcur = relu(_linear(params["fc1"], pe))
    for i in range(cfg.n_block1_layers):
        hcur = relu(_linear(params[f"block1_{i}"], hcur))
    if cfg.has_skip:
        hcur = relu(_linear(params["skip"], jnp.concatenate([hcur, pe], -1)))
    hcur = relu(_linear(params["block2_0"], hcur))
    hcur = relu(_linear(params["block2_1"], hcur))
    out = relu(_linear(params["block2_2"], hcur))  # (..., hidden+1)
    density = out[..., :1]          # post-ReLU channel 0 (NeRFModel.py:90)
    feature = out[..., 1:]
    rgb_in = jnp.concatenate([feature, de], -1)
    rgb = jax.nn.sigmoid(_linear(params["rgb2"], relu(_linear(params["rgb1"], rgb_in))))
    return density, rgb


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
