"""Sharded NeRF train steps.

Two composable strategies (SURVEY §2.3's TPU-native equivalents):

1. ``make_dp_train_step`` — explicit data parallelism with shard_map: each
   chip draws its own ray sub-batch from a fold_in'd key, computes local
   grads, and ``pmean``s them over the 'data' axis (ICI collective).  This is
   BASELINE config 5 (rays sharded across a v4-8, grads psum over ICI).

2. ``make_spmd_train_step`` — GSPMD path: the same global-batch step traced
   once under jit with sharding annotations; params are sharded over the
   'model' axis (alternating column/row parallel on the MLP hidden dim) and
   the ray batch is constrained to the 'data' axis.  XLA inserts the
   all-reduce/all-gather collectives.  For this 0.5M-param model tp is pure
   generality (SURVEY §2.3: "not needed for model size; expose anyway").

Both keep optimizer math identical to the single-device step, so DP grads ==
single-device grads on the concatenated batch (tested to float tolerance).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax

import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sfm_nerf_tpu.config import NeRFPipelineConfig


def make_dp_train_step(
    cfg: NeRFPipelineConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable:
    """Explicit-collective DP step over ``mesh``'s data axis.

    Signature matches the single-device step:
    ``step(params, opt_state, key, images, poses, K) -> (params, opt_state, loss)``.
    Params/opt state replicated; each chip renders n_rays_batch/dp rays.
    """
    from sfm_nerf_tpu.train.nerf_trainer import make_loss_fn

    # every non-model mesh axis carries rays: ('data',) on one host, or
    # ('dcn', 'data') on a multi-host mesh (make_multihost_mesh) — one
    # pmean over the tuple reduces over ICI first, then DCN
    axes = tuple(
        a for a in mesh.axis_names if a != cfg.parallel.model_axis
    )
    sizes = [mesh.shape[a] for a in axes]
    world = 1
    for s in sizes:
        world *= s
    if cfg.train.n_rays_batch % world:
        raise ValueError(
            f"n_rays_batch={cfg.train.n_rays_batch} not divisible by "
            f"world={world}"
        )
    loss_fn = make_loss_fn(cfg, n_rays=cfg.train.n_rays_batch // world)

    def shard_step(params, opt_state, key, images, poses, K):
        # Per-chip RNG: fold the step key by linearized mesh position so
        # the union of per-chip draws is a deterministic function of
        # (key, mesh shape).
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        key_local = jax.random.fold_in(key, idx)
        key_sample, key_render = jax.random.split(key_local)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, key_sample, key_render, images, poses, K
        )
        grads = jax.lax.pmean(grads, axes)
        loss = jax.lax.pmean(loss, axes)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rep = P()
    mapped = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(rep,) * 6,
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    # no donation: fit()'s interrupt-save reads params/opt_state while a
    # dispatch is in flight (see make_train_step in train/nerf_trainer.py)
    return jax.jit(mapped)


def mlp_param_shardings(params, mesh: Mesh, model_axis: str = "model"):
    """Megatron-style alternating shardings for a chain of linear layers.

    Layers are taken in SORTED key order (jax tree order — dict pytrees are
    rebuilt sorted, so this is the only ordering stable across device_put /
    tree_map round-trips); even layers are column-parallel (w: (in, out/tp)),
    odd layers row-parallel (w: (in/tp, out)).  Layers whose dims don't
    divide tp stay replicated.  Returns a pytree of NamedSharding matching
    ``params``.
    """
    tp = mesh.shape[model_axis]
    if set(params.keys()) == {"coarse", "fine"}:
        # hierarchical pair: each sub-MLP gets its own alternating layout
        return {
            k: mlp_param_shardings(params[k], mesh, model_axis)
            for k in params
        }
    names = sorted(params.keys())
    shardings = {}
    for i, name in enumerate(names):
        layer = params[name]
        w, b = layer["w"], layer["b"]
        col = i % 2 == 0
        if col and w.shape[1] % tp == 0:
            spec_w, spec_b = P(None, model_axis), P(model_axis)
        elif not col and w.shape[0] % tp == 0:
            spec_w, spec_b = P(model_axis, None), P(None)
        else:
            spec_w, spec_b = P(None, None), P(None)
        shardings[name] = {
            "w": NamedSharding(mesh, spec_w),
            "b": NamedSharding(mesh, spec_b),
        }
    return shardings


def _make_spmd_fused_step(
    cfg: NeRFPipelineConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    p_shard,
    rep,
) -> Callable:
    """Fused-kernel SPMD step: params STORED model-sharded, loss computed
    data-parallel over every mesh axis (see make_spmd_train_step).

    RNG contract matches make_dp_train_step with the full mesh as the data
    axes: per-chip keys fold_in(key, linearized mesh index) over
    mesh.axis_names order, so the tested single-device replay oracle covers
    both builders with one linearization rule."""
    from sfm_nerf_tpu.train.nerf_trainer import make_loss_fn

    axes = tuple(mesh.axis_names)
    world = 1
    for a in axes:
        world *= mesh.shape[a]
    if cfg.train.n_rays_batch % world:
        raise ValueError(
            f"n_rays_batch={cfg.train.n_rays_batch} not divisible by "
            f"world={world}"
        )
    loss_fn = make_loss_fn(cfg, n_rays=cfg.train.n_rays_batch // world)

    def shard_grads(params, key, images, poses, K):
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        key_local = jax.random.fold_in(key, idx)
        key_sample, key_render = jax.random.split(key_local)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, key_sample, key_render, images, poses, K
        )
        return jax.lax.pmean(loss, axes), jax.lax.pmean(grads, axes)

    spec = P()
    mapped = jax.shard_map(
        shard_grads,
        mesh=mesh,
        in_specs=(spec,) * 5,
        out_specs=(spec, spec),
        check_vma=False,
    )

    # no donation: interrupt-save contract (see make_train_step).  The
    # optimizer update runs OUTSIDE shard_map so updates/opt state keep the
    # params' tp storage layout (XLA re-shards the pmean'd replicated grads
    # onto p_shard for the elementwise adam math).
    @functools.partial(
        jax.jit,
        in_shardings=(p_shard, None, rep, rep, rep, rep),
        out_shardings=(p_shard, None, rep),
    )
    def train_step(params, opt_state, key, images, poses, K):
        loss, grads = mapped(params, key, images, poses, K)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_spmd_train_step(
    cfg: NeRFPipelineConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    params_template,
) -> Callable:
    """GSPMD dp x tp step: params model-sharded, rays data-sharded.

    The step body is IDENTICAL math to the single-device step; parallelism
    comes only from input shardings + one with_sharding_constraint on the ray
    batch.  XLA partitions the matmuls over 'model' and the batch over 'data'
    and inserts collectives (scaling-book recipe: annotate, let XLA insert,
    profile).
    """
    from sfm_nerf_tpu.train.nerf_trainer import (
        fused_train_supported, make_loss_fn,
    )

    data_axis = cfg.parallel.data_axis
    p_shard = mlp_param_shardings(params_template, mesh, cfg.parallel.model_axis)
    rep = NamedSharding(mesh, P())
    batch_spec = NamedSharding(mesh, P(data_axis, None))

    if cfg.render.use_fused_kernel and fused_train_supported(cfg):
        # Fused kernels under tp-sharded param STORAGE: a Pallas kernel is
        # a single-chip program — it cannot consume model-sharded weight
        # operands, and tp buys nothing on a 0.5M-param MLP anyway (the
        # all-reduce per layer would dwarf the matmul).  So the step keeps
        # the params' tp storage layout (generality contract of this
        # builder) but computes the loss DATA-parallel over the FULL mesh
        # under shard_map: GSPMD all-gathers the packed params to each
        # chip at the shard_map boundary (~1 MB — noise next to activation
        # traffic), every chip (model axis included) renders its own ray
        # slice, and one pmean over all axes reduces the grads.  This uses
        # tp x dp chips' MXUs instead of leaving the model axis redundant.
        return _make_spmd_fused_step(cfg, tx, mesh, p_shard, rep)
    if cfg.render.use_fused_kernel:
        # requested but outside the fused envelope (arch/chunk/backend):
        # make_loss_fn falls back to XLA autodiff internally — say so once
        # here so a pod run can't silently lose the flagship kernels
        import warnings

        warnings.warn(
            "spmd step: config requests fused kernels but is outside the "
            "fused envelope (see fused_train_supported) — using the XLA "
            "autodiff path", stacklevel=2)
    # the SHARED loss (same source as the single-device and dp steps —
    # they drifted apart once, see make_loss_fn's docstring; this builder
    # used to re-implement it and crashed on hierarchical configs), with
    # the ray batch constrained onto the data axis
    loss_fn = make_loss_fn(cfg, batch_sharding=batch_spec)

    # no donation: interrupt-save contract (see make_train_step)
    @functools.partial(
        jax.jit,
        in_shardings=(p_shard, None, rep, rep, rep, rep),
        out_shardings=(p_shard, None, rep),
    )
    def train_step(params, opt_state, key, images, poses, K):
        key_sample, key_render = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, key_sample, key_render, images, poses, K
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
