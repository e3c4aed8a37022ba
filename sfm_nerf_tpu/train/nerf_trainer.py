"""NeRF training: one fully-jitted device-resident step + host loop.

Reference behavior rebuilt TPU-first (Phase2/train.py:380-533):

- The reference's per-iteration host work — a Python loop building 8192 rays
  (generateBatch), a host->device tensor upload, and a loss ``.item()`` —
  disappears: ray sampling, rendering, loss, backward, and the optimizer all
  run inside ONE jitted step with donated buffers; the host only polls the
  loss asynchronously every ``log_every`` steps.
- Adam(lrate) + StepLR(decay_steps, gamma) becomes optax adam with a
  staircase exponential schedule (identical piecewise-constant lr).
- Checkpoint cadence/naming matches train.py:509-528 (save every
  save_ckpt_iter, final_model at the end); resume is numeric-sorted
  (fixing the reference's lexicographic-sort bug, SURVEY §5).
- TensorBoard scalars/images at the reference cadences via tensorboardX
  (Loss/train, Learning Rate, Loss/train_avg @100; Loss/val_i + Val_Image_i
  side-by-side GT|pred @1000).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sfm_nerf_tpu.config import NeRFPipelineConfig
from sfm_nerf_tpu.models import init_nerf_params, nerf_apply
from sfm_nerf_tpu.models.nerf import cast_params_bf16
from sfm_nerf_tpu.ops.rays import image_rays, sample_ray_batch
from sfm_nerf_tpu.ops.render import render_rays, render_rays_chunked
from sfm_nerf_tpu.train import checkpoint as ckpt_lib
from sfm_nerf_tpu.utils.metrics import mse


def make_schedule(cfg: NeRFPipelineConfig) -> optax.Schedule:
    return optax.exponential_decay(
        init_value=cfg.train.lrate,
        transition_steps=cfg.train.lrate_decay_steps,
        decay_rate=cfg.train.lrate_decay,
        staircase=True,  # == torch StepLR(step_size, gamma)
    )


def make_optimizer(cfg: NeRFPipelineConfig) -> optax.GradientTransformation:
    return optax.adam(make_schedule(cfg))


def fused_train_supported(cfg: NeRFPipelineConfig) -> bool:
    """Whether the fused Pallas training kernel's envelope covers this
    config; outside it make_loss_fn silently falls back to the XLA autodiff
    path.  Envelope: active OR legacy arch (the shipped-checkpoint layout
    — converted .pth nets fine-tune through the kernel; the no-PE ablation
    runs with zero trig columns), ANY sample count (non-multiples of the
    128-sample chunk are padded with exact no-op samples,
    fused_render.pad_sample_axis), 'train' compositor (white background —
    our standard-NeRF ADDITION, absent in the reference compositor —
    supported: the kernels accumulate the weight sum and shift the
    compositing cotangent by -sum(g)), accelerator backend.  Hierarchical
    sampling (n_importance > 0) is covered by the MERGED step kernel
    (coarse kernel emits the weight histogram, sample_pdf + sort run in
    XLA between the two kernel launches)."""
    mcfg, rcfg = cfg.model, cfg.render
    # gate on the chunk the SELECTED path actually runs: the two-kernel
    # recompute path hardcodes its 128-sample chunk (make_loss_fn's VMEM
    # budget note), so fused_sample_chunk only governs the merged step —
    # gating on it here would admit configs the recompute kernels then
    # assert on at trace time instead of falling back
    chunk = (rcfg.fused_sample_chunk
             if (rcfg.fused_merged_step or rcfg.fused_interpret) else 128)
    # non-multiple sample counts are padded to the chunk multiple with
    # exact no-op samples (pad_sample_axis) — the unrolled chunk-loop cap
    # remains (fused_train.py asserts n_chunks <= 8), and the PAD RATIO
    # is bounded: padded samples run the full MLP, so padding eats into
    # the kernel's ~3.2x training advantage — beyond 3x the XLA fallback
    # wins (e.g. --n_sample 32 would pad to 128 = 4x the work)
    padded = lambda s: -(-s // chunk) * chunk
    ok = lambda s: padded(s) // chunk <= 8 and padded(s) <= 3 * s
    chunks_ok = ok(rcfg.n_sample)
    hier_ok = rcfg.n_importance == 0 or (
        rcfg.fused_merged_step and ok(rcfg.n_sample + rcfg.n_importance)
    )
    return (
        rcfg.use_fused_kernel
        and mcfg.arch in ("active", "legacy")
        and hier_ok
        # interpret mode lifts the TPU lane alignment (tests use tiny chunks)
        and (chunk % 128 == 0 or rcfg.fused_interpret)
        and chunks_ok
        and rcfg.variant == "train"
        # fast_sin's Cody-Waite reduction is exact for |k| <= 2^12, i.e.
        # positions within |x| <= 2^(14 - n_pos_freq) (16 at the L=10
        # default; unit dirs are safe through n_dir_freq <= 13) — larger
        # L must fall back to XLA's general-range jnp.sin.  The PE
        # ablation has no trig phases at all.
        and (not mcfg.pos_encoding
             or (mcfg.n_pos_freq <= 10 and mcfg.n_dir_freq <= 13))
        and (jax.default_backend() != "cpu" or rcfg.fused_interpret)
    )


def make_loss_fn(cfg: NeRFPipelineConfig, n_rays: Optional[int] = None,
                 batch_sharding=None):
    """THE per-batch loss: on-device ray sampling -> render -> MSE, with the
    compute_dtype cast applied.  Single source of truth shared by the
    single-device, scan-fused, data-parallel, AND GSPMD step builders (they
    drifted apart once — the dp step silently dropped the bf16 cast; the
    spmd step later re-implemented the flat case and crashed on
    hierarchical).  ``batch_sharding`` (a NamedSharding), when given,
    constrains the sampled ray batch onto it — the GSPMD step's data axis.

    With ``render.n_importance > 0`` the params pytree is
    {'coarse': ..., 'fine': ...} and the loss is the vanilla-NeRF sum of
    coarse- and fine-pass MSEs over the hierarchical sampler."""
    mcfg, rcfg = cfg.model, cfg.render
    n_rays = n_rays if n_rays is not None else cfg.train.n_rays_batch
    bf16 = cfg.train.compute_dtype == "bfloat16"
    fused_train = fused_train_supported(cfg)

    def loss_fn(params, key_sample, key_render, images, poses, K):
        o, d, target = sample_ray_batch(key_sample, images, poses, K, n_rays)
        if batch_sharding is not None:
            o = jax.lax.with_sharding_constraint(o, batch_sharding)
            d = jax.lax.with_sharding_constraint(d, batch_sharding)
            target = jax.lax.with_sharding_constraint(target, batch_sharding)
        if fused_train:
            # fused Pallas kernels (custom VJP); grads flow through the
            # differentiable packing to the pytree
            from sfm_nerf_tpu.kernels.fused_render import pack_nerf_params
            from sfm_nerf_tpu.kernels.fused_train import (
                fused_mse_loss, fused_mse_loss_weights, fused_render_train,
            )
            from sfm_nerf_tpu.ops.render import (
                merge_sorted, sample_pdf, stratified_samples,
            )

            kz, kpdf = jax.random.split(key_render)
            z = stratified_samples(kz, n_rays, rcfg).astype(jnp.float32)
            pdt = jnp.bfloat16 if bf16 else jnp.float32
            if rcfg.n_importance > 0:
                # hierarchical: coarse merged kernel (emits the weight
                # histogram) -> inverse-CDF importance sampling + sort in
                # XLA -> fine merged kernel; loss = mse_c + mse_f, exactly
                # the XLA path's objective (render_rays_hierarchical, with
                # weights detached into sample_pdf on both paths)
                packed_c = pack_nerf_params(params["coarse"], mcfg, pdt)
                packed_f = pack_nerf_params(params["fine"], mcfg, pdt)
                kw = dict(ray_tile=rcfg.fused_ray_tile,
                          sample_chunk=rcfg.fused_sample_chunk,
                          tiles_per_program=rcfg.fused_tiles_per_program,
                          vmem_mb=rcfg.fused_vmem_mb,
                          interpret=rcfg.fused_interpret)
                loss_c, weights = fused_mse_loss_weights(
                    packed_c, o, d, z, target, mcfg, rcfg, **kw)
                mids = 0.5 * (z[..., 1:] + z[..., :-1])
                z_fine = sample_pdf(
                    kpdf, mids, weights[..., 1:-1], rcfg.n_importance)
                # z and z_fine are each sorted per ray, so the union is a
                # bitonic merge (9 roll/minmax stages), not a 384-lane sort
                z_all = merge_sorted(z, z_fine).astype(jnp.float32)
                loss_f = fused_mse_loss(
                    packed_f, o, d, z_all, target, mcfg, rcfg, **kw)
                return loss_f + loss_c
            packed = pack_nerf_params(params, mcfg, pdt)
            if rcfg.fused_merged_step:
                # one launch per step: forward keeps activations in VMEM,
                # the MSE cotangent is computed in-kernel, backward consumes
                # the stored activations (no recompute — 3x fwd matmul
                # volume instead of the two-kernel path's 4x)
                return fused_mse_loss(
                    packed, o, d, z, target, mcfg, rcfg,
                    ray_tile=rcfg.fused_ray_tile,
                    sample_chunk=rcfg.fused_sample_chunk,
                    tiles_per_program=rcfg.fused_tiles_per_program,
                    vmem_mb=rcfg.fused_vmem_mb,
                    interpret=rcfg.fused_interpret,
                )
            # two-kernel path: fused forward + recompute backward.
            # ray_tile=4: the backward keeps ~9 activation tensors per chunk
            # in VMEM; 4 rays x 128 samples keeps that under the 16 MB
            # budget (8 rays measured 2.7 MB over)
            rgb = fused_render_train(
                packed, o, d, z, mcfg, rcfg,
                ray_tile=4,
                sample_chunk=(rcfg.fused_sample_chunk
                              if rcfg.fused_interpret else 128),
                tiles_per_program=32,
                interpret=rcfg.fused_interpret,
            )
            return mse(rgb, target)
        p_c = cast_params_bf16(params) if bf16 else params
        if rcfg.n_importance > 0:
            from sfm_nerf_tpu.ops.render import render_rays_hierarchical

            coarse_fn = lambda p, dd: nerf_apply(p_c["coarse"], p, dd, mcfg)
            fine_fn = lambda p, dd: nerf_apply(p_c["fine"], p, dd, mcfg)
            rgb_f, rgb_c = render_rays_hierarchical(
                coarse_fn, fine_fn, o, d, rcfg, rcfg.n_importance, key_render
            )
            return mse(rgb_f, target) + mse(rgb_c, target)
        model_fn = lambda p, dd: nerf_apply(p_c, p, dd, mcfg)
        rgb = render_rays(model_fn, o, d, rcfg, key_render)
        return mse(rgb, target)

    return loss_fn


def make_train_step(
    cfg: NeRFPipelineConfig, tx: optax.GradientTransformation
) -> Callable:
    """Build the jitted train step.

    step(params, opt_state, key, images, poses, K) -> (params, opt_state, loss)

    ``images``/``poses``/``K`` stay device-resident across the whole run.
    """
    loss_fn = make_loss_fn(cfg)

    # NO buffer donation on any train step: the interrupt-save contract
    # (fit()'s KeyboardInterrupt handler) must read params/opt_state while
    # a dispatch is in flight — donated inputs are already deleted then
    # ("Array has been deleted").  The cost is one extra live copy of a
    # few-MB pytree; NeRF params never approach HBM scale.
    @jax.jit
    def train_step(params, opt_state, key, images, poses, K):
        key_sample, key_render = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, key_sample, key_render, images, poses, K
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_multi_train_step(
    cfg: NeRFPipelineConfig,
    tx: optax.GradientTransformation,
    n_steps: int,
    inner_step: Optional[Callable] = None,
) -> Callable:
    """Fuse ``n_steps`` train steps into ONE device call via lax.scan.

    step(params, opt_state, key, images, poses, K) ->
        (params, opt_state, losses (n_steps,))

    One dispatch per n_steps amortizes host->device latency (significant on
    tunneled/remote TPU attachments) and lets XLA pipeline consecutive steps;
    the host only sees the per-step loss vector afterwards.
    """
    loss_fn = make_loss_fn(cfg)

    # no donation — see make_train_step (interrupt-save contract)
    @jax.jit
    def multi_step(params, opt_state, key, images, poses, K):
        def body(carry, k):
            params, opt_state = carry
            if inner_step is not None:
                # caller-provided single step (instrumented / custom
                # objective) traced into the scan body
                params, opt_state, loss = inner_step(
                    params, opt_state, k, images, poses, K
                )
                return (params, opt_state), loss
            key_sample, key_render = jax.random.split(k)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, key_sample, key_render, images, poses, K
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, n_steps)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, losses

    return multi_step


def _pad_ratio_ok(n_sample: int, num: int, den: int) -> bool:
    """True when padding ``n_sample`` to the 128-lane chunk keeps
    padded/real <= num/den (integer arithmetic — e.g. 192 -> 256 is
    exactly 4/3 and must pass the inference gate)."""
    padded = -(-n_sample // 128) * 128
    return den * padded <= num * n_sample


def _fused_render_env_ok(cfg: NeRFPipelineConfig) -> bool:
    """Shared fused-INFERENCE envelope (make_render_image[_aux]): both
    archs (active + the legacy layout every shipped reference .pth
    serializes), both compositor variants, any n_sample whose no-op pad
    to the 128-lane chunk stays within the kernel's speed margin, PE
    frequencies inside fast_sin's Cody-Waite range (the no-PE ablation has
    no trig phases at all), white background only where weights telescope
    ('train' variant), and a real accelerator backend (CPU falls back to
    XLA; interpret mode is for tests only)."""
    mcfg, rcfg = cfg.model, cfg.render
    return (
        rcfg.use_fused_kernel
        and mcfg.arch in ("active", "legacy")
        # any n_sample runs (non-multiples padded with exact no-op samples,
        # pad_sample_axis) but the PAD RATIO must stay inside the render
        # kernel's ~1.36x advantage over XLA: padded samples run the full
        # MLP, so beyond 4/3 padding the fused route is net SLOWER (e.g.
        # --n_sample 64 pads to 128 = 2x the work = ~0.68x XLA)
        and (_pad_ratio_ok(rcfg.n_sample, 4, 3) or rcfg.fused_interpret)
        and (not mcfg.pos_encoding
             or (mcfg.n_pos_freq <= 10 and mcfg.n_dir_freq <= 13))
        and not (rcfg.white_background and rcfg.variant != "train")
        and (jax.default_backend() != "cpu" or rcfg.fused_interpret)
    )


def _fused_render_routes(cfg: NeRFPipelineConfig) -> Tuple[bool, bool]:
    """(use_fused, use_fused_hier) for the full-frame renderers — the ONE
    place the flat-vs-hierarchical route split lives; make_render_image,
    make_render_image_aux and the sharded renderer must stay in lockstep
    or single-chip and sharded eval silently diverge."""
    rcfg = cfg.render
    env = _fused_render_env_ok(cfg)
    use_fused = env and rcfg.n_importance == 0
    # the fine pass's coarse∪fine union is sample-padded like everything
    # else (pad_sample_axis); its pad ratio must hold the same net-speedup
    # bound as the env gate's coarse width
    use_fused_hier = (
        env
        and rcfg.n_importance > 0
        and (_pad_ratio_ok(rcfg.n_sample + rcfg.n_importance, 4, 3)
             or rcfg.fused_interpret)
    )
    return use_fused, use_fused_hier


def _fused_render_kwargs(rcfg) -> dict:
    """Kernel-shape kwargs for the fused RENDER kernels.  On hardware the
    measured-fastest render shape (ray_tile=32, chunk=128, tpp=16 defaults)
    is kept; interpret mode (tests) uses the config's chunk so tiny sample
    counts run unpadded."""
    if not rcfg.fused_interpret:
        return {}
    return dict(sample_chunk=rcfg.fused_sample_chunk, interpret=True)


def _fused_hierarchical_render(params, o, d, mcfg, rcfg, key):
    """Coarse fused pass (rgb + weights) -> sample_pdf + bitonic merge in
    XLA -> fine fused pass over the union.  Mirrors ops.render's
    _hierarchical_body sampling semantics exactly (interior-bin weights,
    stratified importance draws, sorted union).  Returns
    (rgb_fine (N,3), weights_fine (N, S+I), z_all (N, S+I))."""
    from sfm_nerf_tpu.kernels.fused_render import (
        fused_render_rays_weights, pack_nerf_params,
    )
    from sfm_nerf_tpu.ops.render import (
        merge_sorted, sample_pdf, stratified_samples,
    )

    packed_c = pack_nerf_params(params["coarse"], mcfg, jnp.bfloat16)
    packed_f = pack_nerf_params(params["fine"], mcfg, jnp.bfloat16)
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)
    n_rays = o.shape[0]
    kw = _fused_render_kwargs(rcfg)
    z_c = stratified_samples(k1, n_rays, rcfg).astype(jnp.float32)
    _, w_c = fused_render_rays_weights(packed_c, o, d, z_c, mcfg, rcfg, **kw)
    mids = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
    z_fine = sample_pdf(k2, mids, w_c[..., 1:-1], rcfg.n_importance)
    z_all = merge_sorted(z_c, z_fine)
    rgb_f, w_f = fused_render_rays_weights(
        packed_f, o, d, z_all, mcfg, rcfg, **kw)
    return rgb_f, w_f, z_all


def make_render_image(cfg: NeRFPipelineConfig, chunk_rays: int = 2048):
    """Jitted full-frame renderer: (params, K, pose, H, W static) -> (H,W,3).

    Hierarchical (coarse/fine) when render.n_importance > 0 — params is then
    the {'coarse','fine'} pytree and the fine image is returned."""
    mcfg, rcfg = cfg.model, cfg.render

    # hierarchical fused inference: coarse fused pass emits the weight
    # histogram, sample_pdf + bitonic merge run in XLA, fine pass fused
    use_fused, use_fused_hier = _fused_render_routes(cfg)

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def render_image(params, K, pose, height: int, width: int, key=None):
        o, d = image_rays(K, pose, height, width)
        if use_fused:
            from sfm_nerf_tpu.kernels.fused_render import (
                fused_render_rays, pack_nerf_params,
            )
            from sfm_nerf_tpu.ops.render import stratified_samples

            packed = pack_nerf_params(params, mcfg, jnp.bfloat16)
            z = stratified_samples(key, height * width, rcfg).astype(
                jnp.float32
            )
            rgb = fused_render_rays(packed, o, d, z, mcfg, rcfg,
                                    **_fused_render_kwargs(rcfg))
            return rgb.reshape(height, width, 3)
        if use_fused_hier:
            rgb, _, _ = _fused_hierarchical_render(
                params, o, d, mcfg, rcfg, key)
            return rgb.reshape(height, width, 3)
        if rcfg.n_importance > 0:
            from sfm_nerf_tpu.ops.render import (
                render_rays_hierarchical_chunked,
            )

            coarse_fn = lambda p, dd: nerf_apply(params["coarse"], p, dd, mcfg)
            fine_fn = lambda p, dd: nerf_apply(params["fine"], p, dd, mcfg)
            rgb = render_rays_hierarchical_chunked(
                coarse_fn, fine_fn, o, d, rcfg, rcfg.n_importance, key,
                chunk_rays,
            )
        else:
            model_fn = lambda p, dd: nerf_apply(params, p, dd, mcfg)
            rgb = render_rays_chunked(model_fn, o, d, rcfg, key, chunk_rays)
        return rgb.reshape(height, width, 3)

    return render_image


def make_render_image_aux(cfg: NeRFPipelineConfig, chunk_rays: int = 2048):
    """Jitted full-frame renderer with auxiliary maps:
    (params, K, pose, H, W) -> (rgb[H,W,3], depth[H,W], disp[H,W], acc[H,W]).

    Eval/diagnostic path (no reference analog — train.py:248-271 returns
    rgb only).  Runs fused when the envelope allows: the kernel's weights
    output (fused_render_rays_weights) feeds weight_maps directly, so
    depth/disp/acc renders get the same kernel speedup as rgb ones.
    """
    mcfg, rcfg = cfg.model, cfg.render
    use_fused, use_fused_hier = _fused_render_routes(cfg)

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def render_image_aux(params, K, pose, height: int, width: int, key=None):
        from sfm_nerf_tpu.ops.render import (
            render_rays_chunked_aux, weight_maps,
        )

        o, d = image_rays(K, pose, height, width)
        if use_fused or use_fused_hier:
            if use_fused:
                from sfm_nerf_tpu.kernels.fused_render import (
                    fused_render_rays_weights, pack_nerf_params,
                )
                from sfm_nerf_tpu.ops.render import stratified_samples

                packed = pack_nerf_params(params, mcfg, jnp.bfloat16)
                z_all = stratified_samples(
                    key, height * width, rcfg).astype(jnp.float32)
                rgb, w = fused_render_rays_weights(
                    packed, o, d, z_all, mcfg, rcfg,
                    **_fused_render_kwargs(rcfg))
            else:
                rgb, w, z_all = _fused_hierarchical_render(
                    params, o, d, mcfg, rcfg, key)
            acc = jnp.sum(w, axis=-1)
            depth, disp = weight_maps(w, z_all, acc)
            hw = (height, width)
            return (rgb.reshape(height, width, 3),
                    depth.reshape(hw), disp.reshape(hw), acc.reshape(hw))
        if rcfg.n_importance > 0:
            from sfm_nerf_tpu.ops.render import (
                render_rays_hierarchical_chunked_aux,
            )

            coarse_fn = lambda p, dd: nerf_apply(params["coarse"], p, dd, mcfg)
            fine_fn = lambda p, dd: nerf_apply(params["fine"], p, dd, mcfg)
            rgb, depth, disp, acc = render_rays_hierarchical_chunked_aux(
                coarse_fn, fine_fn, o, d, rcfg, rcfg.n_importance, key,
                chunk_rays,
            )
        else:
            model_fn = lambda p, dd: nerf_apply(params, p, dd, mcfg)
            rgb, depth, disp, acc = render_rays_chunked_aux(
                model_fn, o, d, rcfg, key, chunk_rays
            )
        hw = (height, width)
        return (
            rgb.reshape(height, width, 3),
            depth.reshape(hw), disp.reshape(hw), acc.reshape(hw),
        )

    return render_image_aux


class NeRFTrainer:
    """Host-side orchestration: resume, loop, logging, checkpoints."""

    def __init__(
        self,
        cfg: NeRFPipelineConfig,
        images: np.ndarray,
        poses: np.ndarray,
        camera_matrix: np.ndarray,
        train_step: Optional[Callable] = None,
        writer: Any = None,
    ):
        self.cfg = cfg
        self.images = jnp.asarray(images, jnp.float32)
        self.poses = jnp.asarray(poses, jnp.float32)
        self.K = jnp.asarray(camera_matrix, jnp.float32)
        self.tx = make_optimizer(cfg)
        self._schedule = make_schedule(cfg)
        key0 = jax.random.key(cfg.train.seed)
        if cfg.render.n_importance > 0:
            kc, kf = jax.random.split(key0)
            self.params = {
                "coarse": init_nerf_params(kc, cfg.model),
                "fine": init_nerf_params(kf, cfg.model),
            }
        else:
            self.params = init_nerf_params(key0, cfg.model)
        self.opt_state = self.tx.init(self.params)
        # an injected step disables the scan-fused fast path: fit() would
        # otherwise run most iterations through a default step the caller
        # never sees (instrumentation / custom objectives)
        self._injected = train_step is not None
        self._dp = False
        if train_step is not None:
            self.train_step = train_step
        elif cfg.parallel.tp > 1:
            # GSPMD dp x tp: params model-sharded (Megatron alternating),
            # rays data-sharded; routed from the public ParallelConfig.tp
            # field (it was silently ignored before)
            from sfm_nerf_tpu.parallel import make_mesh
            from sfm_nerf_tpu.parallel.train_step import (
                make_spmd_train_step, mlp_param_shardings,
            )

            mesh = make_mesh(
                dp=cfg.parallel.dp, tp=cfg.parallel.tp,
                data_axis=cfg.parallel.data_axis,
                model_axis=cfg.parallel.model_axis,
            )
            self.mesh = mesh
            self._dp = True   # per-step dispatch; no scan fast path
            self.params = jax.device_put(
                self.params, mlp_param_shardings(
                    self.params, mesh, cfg.parallel.model_axis))
            self.opt_state = self.tx.init(self.params)
            self.train_step = make_spmd_train_step(
                cfg, self.tx, mesh, self.params)
            print(f"GSPMD dp x tp over {mesh.shape} devices")
        elif cfg.parallel.dp > 1 or (
            cfg.parallel.dp == 0 and len(jax.devices()) > 1
        ):
            # data-parallel scale-out: rays sharded over the mesh's data
            # axis, grads pmean'd over ICI (BASELINE config 5)
            from sfm_nerf_tpu.parallel import make_mesh
            from sfm_nerf_tpu.parallel.train_step import make_dp_train_step

            mesh = make_mesh(
                dp=cfg.parallel.dp, tp=1,
                data_axis=cfg.parallel.data_axis,
                model_axis=cfg.parallel.model_axis,
            )
            self.mesh = mesh
            self._dp = True
            self.train_step = make_dp_train_step(cfg, self.tx, mesh)
            print(f"data-parallel over {mesh.shape} devices")
        else:
            self.train_step = make_train_step(cfg, self.tx)
        self.render_image = make_render_image(cfg)
        self.start_iter = 0
        self.writer = writer
        self._last_losses: list = []
        self._orbax = None
        if cfg.train.ckpt_backend == "orbax":
            from sfm_nerf_tpu.train.orbax_ckpt import OrbaxCheckpointer

            self._orbax = OrbaxCheckpointer(cfg.checkpoint_path)

    # -- checkpointing -----------------------------------------------------
    def try_resume(self) -> bool:
        if self._orbax is not None:
            if self._orbax.latest_step() is None:
                return False
            params, opt_state, step = self._orbax.restore(
                self.params, self.opt_state
            )
            # orbax returns arrays COMMITTED to their restore devices; go
            # through the host so jit/shard_map can re-place them freely
            unpin = lambda x: jnp.asarray(np.asarray(x))
            self.params = jax.tree_util.tree_map(unpin, params)
            self.opt_state = jax.tree_util.tree_map(unpin, opt_state)
            self.start_iter = step + 1
            return True
        path = ckpt_lib.latest_checkpoint(self.cfg.checkpoint_path)
        if path is None:
            return self._try_resume_pth()
        params, opt_state, step = ckpt_lib.load_checkpoint(
            path, self.params, self.opt_state
        )
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
        self.start_iter = step + 1
        return True

    def _try_resume_pth(self) -> bool:
        """FINE-TUNE fallback: no native checkpoint, but a reference-format
        .pth in checkpoint_path — convert it and start from its weights
        (step 0, fresh optimizer; bare state_dicts carry no iteration).
        With the fused kernels now covering the legacy arch, shipped
        reference checkpoints fine-tune at kernel speed from the plain
        training CLI (run with --arch legacy so the model config matches)."""
        import glob
        import re

        ckpt_dir = self.cfg.checkpoint_path
        pth = os.path.join(ckpt_dir, "final_model.pth")
        if not os.path.exists(pth):
            cands = glob.glob(os.path.join(ckpt_dir, "model_*.pth"))
            if not cands:
                return False

            def step_of(p):
                m = re.search(r"model_(\d+)\.pth$", p)
                return int(m.group(1)) if m else -1

            pth = max(cands, key=step_of)
        from sfm_nerf_tpu.models.convert import convert_pth

        params, mcfg = convert_pth(pth)
        try:
            shapes_ok = all(
                jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                    lambda a, b: np.shape(a) == np.shape(b),
                    params, self.params,
                ))
            )
        except ValueError:   # different tree structure (arch/hierarchical)
            shapes_ok = False
        if not shapes_ok:
            if isinstance(self.params, dict) and "coarse" in self.params:
                # hierarchical configs train a {coarse, fine} pair; a
                # single-net .pth can never match, whatever flags are
                # passed — train from scratch rather than abort
                print(
                    f"note: ignoring {pth} — it holds one network but "
                    "--n_importance > 0 trains a coarse/fine pair; "
                    "starting from scratch"
                )
                return False
            raise ValueError(
                f"{pth} serializes a different architecture than the "
                f"configured model ({mcfg}); pass the matching --arch/"
                "--n_pos_freq/--hidden_size flags to fine-tune it"
            )
        self.params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), params)
        self.opt_state = self.tx.init(self.params)
        self.start_iter = 0
        print(f"Fine-tuning from converted {pth}")
        return True

    def save(self, step: int, loss: float, final: bool = False) -> str:
        if self._orbax is not None:
            # async: snapshots the arrays and overlaps the write with the
            # next train steps; fit() waits before returning
            self._orbax.save(step, self.params, self.opt_state,
                             extra={"loss": loss})
            if final:
                self._orbax.wait()
            return self.cfg.checkpoint_path
        return ckpt_lib.save_checkpoint(
            self.cfg.checkpoint_path, step, self.params, self.opt_state,
            extra={"loss": loss}, final=final,
        )

    # -- main loop ---------------------------------------------------------
    def fit(
        self,
        max_iters: Optional[int] = None,
        val_indices: Optional[np.ndarray] = None,
        progress: bool = True,
    ) -> dict:
        cfg = self.cfg
        max_iters = max_iters if max_iters is not None else cfg.train.max_iters
        if cfg.load_checkpoint:
            self.try_resume()
        if val_indices is None:
            rng = np.random.default_rng(cfg.train.seed)
            n_val = min(cfg.train.n_val_images, len(self.images))
            val_indices = rng.choice(len(self.images), n_val, replace=False)

        self._key = jax.random.key(cfg.train.seed + 1)
        self._loss = jnp.asarray(0.0)
        self._steps_done = 0
        # the last iteration whose update is REFLECTED in self.params —
        # what an interrupt checkpoint must stamp (resume = step + 1)
        self._done_through = self.start_iter - 1
        t_start = time.time()
        spc = max(1, cfg.train.steps_per_call)
        multi_step = None
        # (scan-fused fast path is single-device; the dp step dispatches
        # per-step — its work is already batched across chips — and an
        # injected train_step must see EVERY iteration, not 1-in-spc)
        if spc > 1 and not getattr(self, "_dp", False) \
                and not getattr(self, "_injected", False):
            multi_step = make_multi_train_step(cfg, self.tx, spc)
        iterator = range(self.start_iter, max_iters)
        if progress:
            try:
                from tqdm import tqdm
                iterator = tqdm(iterator)
            except ImportError:
                pass

        it_iter = iter(iterator)
        try:
            self._fit_loop(
                it_iter, iterator, cfg, multi_step, spc, max_iters,
                val_indices, progress,
            )
        except KeyboardInterrupt:
            # fault-tolerance parity with the reference's legacy loop
            # (Phase2/Wrapper.py:288-293): interrupt -> checkpoint -> exit.
            # Stamp the last iteration whose update self.params actually
            # holds (an in-flight step's iteration hasn't run — stamping
            # it would make resume skip it); train steps do NOT donate
            # their params/opt_state buffers precisely so this save can
            # read them while a dispatch is in flight.
            if self._done_through >= 0:
                print("KeyboardInterrupt: saving checkpoint before exit")
                self.save(self._done_through, float(self._loss))
                if self._orbax is not None:
                    self._orbax.wait()   # commit the async write first
            else:
                print("KeyboardInterrupt before any completed step; "
                      "nothing to checkpoint")
            raise

        final_loss = float(self._loss)
        if self._steps_done > 0:
            # guard: re-running fit() on an already-completed run would
            # otherwise overwrite final_model's loss metadata with the 0.0
            # placeholder
            self.save(max_iters - 1, final_loss, final=True)
        elapsed = time.time() - t_start
        rays = self._steps_done * cfg.train.n_rays_batch
        return {
            "final_loss": final_loss,
            "steps": self._steps_done,
            "elapsed_s": elapsed,
            "rays_per_sec": rays / max(elapsed, 1e-9),
        }

    def _fit_loop(
        self, it_iter, iterator, cfg, multi_step, spc, max_iters,
        val_indices, progress,
    ):
        key = self._key
        for it in it_iter:
            # Fused multi-step fast path: jump in scan-sized blocks whenever
            # no host-side event (log/val/CHECKPOINT) falls STRICTLY INSIDE
            # the block — a save_ckpt_iter boundary inside a block would
            # otherwise be silently skipped, losing the fault-tolerance
            # checkpoints.  A boundary at the block's LAST step is fine:
            # event handling below runs after the block, on that step's
            # loss.  (The earlier `r + spc <= every` gate rejected
            # block-END boundaries too, which forced every other 50-block
            # into 50 single dispatches at log_every=100/spc=50 — measured
            # ~2x step-rate loss on the tunneled TPU, where dispatch RTT
            # dominates.)
            def no_boundary_inside_block(every: int) -> bool:
                if not every:
                    return True
                r = it % every
                return r != 0 and r + spc <= every + 1

            if (
                multi_step is not None
                and it + spc <= max_iters
                and no_boundary_inside_block(cfg.train.log_every)
                and no_boundary_inside_block(cfg.train.val_every)
                and no_boundary_inside_block(cfg.train.save_ckpt_iter)
            ):
                key, sub = jax.random.split(key)
                self.params, self.opt_state, losses = multi_step(
                    self.params, self.opt_state, sub,
                    self.images, self.poses, self.K,
                )
                self._key = key
                loss = losses[-1]
                self._loss = loss
                self._steps_done += spc
                self._done_through = it + spc - 1
                for _ in range(spc - 1):
                    next(it_iter, None)
                it = self._done_through      # event handling for the
                # block's final step (boundaries only ever land there)
            else:
                key, sub = jax.random.split(key)
                self.params, self.opt_state, loss = self.train_step(
                    self.params, self.opt_state, sub,
                    self.images, self.poses, self.K,
                )
                self._key = key
                self._loss = loss
                self._steps_done += 1
                self._done_through = it

            if cfg.train.log_every and it % cfg.train.log_every == 0:
                loss_f = float(loss)
                self._last_losses.append(loss_f)
                if progress and hasattr(iterator, "set_description"):
                    iterator.set_description(f"Loss: {loss_f:.6f}")
                if self.writer is not None:
                    self.writer.add_scalar("Loss/train", loss_f, it)
                    self.writer.add_scalar(
                        "Learning Rate", float(self._schedule(it)), it
                    )
                    # running mean over recent log samples (the fast path
                    # skips intermediate iterations, so this averages the
                    # observed samples; the reference averages every
                    # iteration, train.py:478-480)
                    self.writer.add_scalar(
                        "Loss/train_avg",
                        float(np.mean(self._last_losses[-10:])),
                        it,
                    )

            # checkpoint cadence independent of validation (the reference
            # nests saves under its hardcoded 1000-iter val block,
            # train.py:509-518 — with val_every configurable here that
            # nesting would silently disable checkpointing)
            if (
                cfg.train.save_ckpt_iter
                and it % cfg.train.save_ckpt_iter == 0
                and it > 0
            ):
                self.save(it, float(loss))

            if cfg.train.val_every and it % cfg.train.val_every == 0 and it > 0:
                self._validate(it, val_indices)

    def _validate(self, it: int, val_indices) -> None:
        height, width = int(self.images.shape[1]), int(self.images.shape[2])
        for i, idx in enumerate(val_indices):
            pred = self.render_image(
                self.params, self.K, self.poses[int(idx)], height, width
            )
            gt = self.images[int(idx)]
            val_mse = float(mse(pred, gt))
            if self.writer is not None:
                self.writer.add_scalar(f"Loss/val_{i}", val_mse, it)
                side = np.concatenate([np.asarray(gt), np.asarray(pred)], axis=1)
                self.writer.add_image(
                    f"Val_Image_{i}",
                    np.clip(side.transpose(2, 0, 1), 0, 1),
                    it,
                )
