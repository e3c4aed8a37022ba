"""Sharded full-frame eval rendering (ROADMAP item: scale-out eval).

The reference renders evaluation frames on one GPU with a Python chunk
loop (train.py:235-242); training on a pod leaves every other chip idle
during eval.  Here the frame's rays are sharded over the mesh's data axis
with ``shard_map``: each chip renders its contiguous ray slice with the
same chunked XLA (or fused Pallas) path used single-chip, and the output
tiles land already laid out as one (H, W, 3) array — the final gather onto
the host is the only cross-chip movement, and it rides ICI.

Math is identical to ``train.nerf_trainer.make_render_image`` (tested ==
single-device to float tolerance on a virtual 8-device mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sfm_nerf_tpu.config import NeRFPipelineConfig
from sfm_nerf_tpu.models import nerf_apply
from sfm_nerf_tpu.ops.rays import image_rays
from sfm_nerf_tpu.ops.render import render_rays_chunked


def make_sharded_render_image(
    cfg: NeRFPipelineConfig, mesh: Mesh, chunk_rays: int = 2048
):
    """Full-frame renderer sharded over ``mesh``'s data axis.

    Returns ``render_image(params, K, pose, height, width, key=None)`` with
    the same signature/semantics as ``make_render_image``.  Params are
    replicated (0.5M params — replication is free next to the activation
    traffic); rays are sharded; each chip renders height*width/dp rays.
    """
    mcfg, rcfg = cfg.model, cfg.render
    axis = cfg.parallel.data_axis
    dp = mesh.shape[axis]

    from sfm_nerf_tpu.train.nerf_trainer import (
        _fused_hierarchical_render, _fused_render_kwargs,
        _fused_render_routes,
    )

    # same route split as single-chip (one source of truth)
    use_fused, use_fused_hier = _fused_render_routes(cfg)

    def local_render(params, o, d, key):
        if use_fused:
            from sfm_nerf_tpu.kernels.fused_render import (
                fused_render_rays, pack_nerf_params,
            )
            from sfm_nerf_tpu.ops.render import stratified_samples

            packed = pack_nerf_params(params, mcfg, jnp.bfloat16)
            z = stratified_samples(key, o.shape[0], rcfg).astype(jnp.float32)
            return fused_render_rays(packed, o, d, z, mcfg, rcfg,
                                     **_fused_render_kwargs(rcfg))
        if use_fused_hier:
            rgb, _, _ = _fused_hierarchical_render(
                params, o, d, mcfg, rcfg, key)
            return rgb
        if rcfg.n_importance > 0:
            from sfm_nerf_tpu.ops.render import (
                render_rays_hierarchical_chunked,
            )

            coarse_fn = lambda p, dd: nerf_apply(params["coarse"], p, dd, mcfg)
            fine_fn = lambda p, dd: nerf_apply(params["fine"], p, dd, mcfg)
            return render_rays_hierarchical_chunked(
                coarse_fn, fine_fn, o, d, rcfg, rcfg.n_importance, key,
                chunk_rays,
            )
        model_fn = lambda p, dd: nerf_apply(params, p, dd, mcfg)
        return render_rays_chunked(model_fn, o, d, rcfg, key, chunk_rays)

    def sharded(params, o, d, key):
        # Each chip sees its (n/dp, 3) ray slice; fold the render key by
        # position so perturbed eval draws are iid across shards.
        if key is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return local_render(params, o, d, key)

    def make_mapped(with_key):
        keyspec = (P(),) if with_key else ()
        return jax.shard_map(
            (lambda p, o, d, k: sharded(p, o, d, k)) if with_key
            else (lambda p, o, d: sharded(p, o, d, None)),
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis, None)) + keyspec,
            out_specs=P(axis, None),
            check_vma=False,
        )

    # keyed and keyless variants share ONE body (the pad/patch/call/trim
    # dance must not diverge between them); they stay separate jit entries
    # because the key changes the traced arity
    def _render_body(with_key, params, K, pose, height, width, *key):
        o, d = image_rays(K, pose, height, width)
        n = height * width
        pad = (-n) % dp
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=0.0)
        d = d.at[n:, 2].set(1.0) if pad else d
        rgb = make_mapped(with_key)(params, o, d, *key)
        return rgb[:n].reshape(height, width, 3)

    render_keyless = jax.jit(
        functools.partial(_render_body, False), static_argnums=(3, 4))
    render_keyed = jax.jit(
        functools.partial(_render_body, True), static_argnums=(3, 4))

    def render_image(params, K, pose, height: int, width: int, key=None):
        if key is None:
            return render_keyless(params, K, pose, height, width)
        return render_keyed(params, K, pose, height, width, key)

    return render_image
