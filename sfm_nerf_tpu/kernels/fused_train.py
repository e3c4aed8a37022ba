"""Fused NeRF training kernels with hand-written backward passes (the
inference kernel in fused_render.py is forward-only; XLA autodiff cannot
see inside a kernel).

TWO designs, sharing the chunk forward / compositing-backward / MLP-backward
building blocks:

1. Two-kernel recompute path (``fused_render_train``, flash-attention
   style): forward emits per-(ray, chunk) BOUNDARY transmittances as
   residuals (a few KB); backward walks chunks in REVERSE, recomputes each
   chunk's activations in VMEM, backprops compositing analytically
   (dL/dalpha_i = q_i T_i - R_i/(1-alpha_i+eps) with q = g.c and R the
   global suffix sum of q*w), then the dense MLP chain.  General cotangent
   (the loss lives outside), 4x the forward matmul volume per step.

2. Merged single-kernel step (``fused_mse_loss``): the MSE cotangent is
   per-ray LOCAL, so the kernel computes g = 2(rgb-target)/(3N) itself;
   forward KEEPS each chunk's activations resident in VMEM and backward
   consumes them directly — no recompute, 3x the forward matmul volume,
   one launch per step, rays/z read from HBM once.  Measured 134.8k train
   rays/s on v5e at the flagship config vs 91.8k for the recompute path
   (vs 34.7k XLA autodiff).  MSE-specific by construction; the recompute
   path remains for any other objective.

Both accumulate weight/bias grads into VMEM-resident outputs across the
sequential grid (constant index maps; program 0 zero-initializes) and
expose custom_vjp wrappers so jax.grad flows through the (differentiable)
packing to the parameter pytree.  Ray/z/target inputs get zero cotangents.

Scope: both archs — active AND the legacy layout every shipped reference
.pth serializes (incl. the no-PE ablation), so converted checkpoints can
be FINE-TUNED through the kernel; 'train' compositor; white background
(our standard-NeRF addition) supported in-kernel.  Interpret mode is the
correctness reference (tested against jax.grad of the XLA path); on-chip
compilation is subject to the toolchain limits recorded in
PERFORMANCE.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sfm_nerf_tpu.kernels.fused_render import (
    _arch_layers,
    check_fast_sin_envelope,
    fast_sin,
    pad_sample_axis,
    pe_trig_matrices_ext,
    tri_inclusive,
)


def _arch_static(mcfg):
    """Static per-arch kernel parameters: (layer names, body program,
    density activation, trig column counts).  n_pe/n_de are 0 for the
    PE-ablation nets (ext degenerates to [x ++ pad])."""
    names, body, density_act = _arch_layers(mcfg)
    n_pe = 6 * mcfg.n_pos_freq if mcfg.pos_encoding else 0
    n_de = 6 * mcfg.n_dir_freq if mcfg.pos_encoding else 0
    return names, body, density_act, n_pe, n_de


def _pe_mats(mcfg):
    """Extended trig matrices for the kernels, honoring the PE ablation."""
    if mcfg.pos_encoding:
        check_fast_sin_envelope(mcfg)
        return (pe_trig_matrices_ext(mcfg.n_pos_freq),
                pe_trig_matrices_ext(mcfg.n_dir_freq))
    return pe_trig_matrices_ext(0), pe_trig_matrices_ext(0)

f32 = jnp.float32
# Hardware-attribution knob (bench_kernel sweeps only — results are
# numerically WRONG with any stage disabled).  Comma-separated subset of
# {"sin", "composite", "bwd"}: skips that stage so its wall-clock share can
# be measured on-chip (the axon tunnel provides no profiler).  Read once at
# import; production paths never set it.
ABLATE = frozenset(
    s for s in os.environ.get("FUSED_ABLATE", "").split(",") if s
)
# "slowsin" in FUSED_ABLATE A/Bs the lowered jnp.sin against fast_sin
_sin = jnp.sin if "slowsin" in ABLATE else fast_sin
# Compositing implementation A/B: "scan" computes the per-chunk
# transmittance as a direct lane-wise prefix PRODUCT (7 masked pltpu.roll
# steps) and the backward suffix sum likewise — no log/exp pair and no
# HIGHEST-precision triangular MXU dots (6 bf16 passes each).  "tridot"
# keeps the round-1 log-cumsum-via-dot formulation.
COMPOSITE_IMPL = os.environ.get("FUSED_COMPOSITE", "tridot")
# Subtile interleave A/B: "2" runs two subtiles' fwd+bwd chains per loop
# iteration in one straight-line block, giving the Mosaic scheduler two
# INDEPENDENT dot chains to fill inter-dot MXU bubbles with (the ~20%
# occupancy gap measured via FUSED_ABLATE).  Costs 2x activation VMEM.
# Measured SLOWER (142.6k vs 146.5k; 126.9k at halved ray_tile).  "2s"
# additionally gives the second stream its OWN scratch accumulator set —
# testing whether the `gW += dW` read-modify-writes on shared VMEM refs
# were what chained the streams.  REFUTED: "2s" measures 142.5k,
# identical to "2" — the scheduler simply doesn't interleave across the
# program-order block boundary, and the 2x activation VMEM costs ~3%.
# Both modes kept as the documented apparatus of the occupancy study.
INTERLEAVE = os.environ.get("FUSED_INTERLEAVE", "1")
# MXU precision, by dot class.  Mosaic demotes plain f32 dots to single-pass
# bf16 (and does not lower Precision.HIGH or DotAlgorithmPreset at all).
# Quality-demo ablation (PERFORMANCE.md): the leak is NOT in the bulk MLP /
# gradient dots (bf16 there is benign) but in two places where bf16 loses
# ABSOLUTE precision — the PE phase (error scales with frequency, up to
# pi*2^L ~ 800: high-frequency features decohere, -5 dB) and the log-space
# triangular compositing sums (|log T| up to ~23).  The PE contraction is
# K=3, so it leaves the MXU entirely (_k3_phase: exact f32 VPU FMAs); the
# triangular dots are per-ray-rows-only and run HIGHEST at ~zero cost.
# Result: 41.36 dB held-out vs the XLA path's 41.5 dB at 2x its speed
# (all-DEFAULT was 35.8 dB; all-HIGHEST 40.9 dB at 6.6x the cost).
MXU_PRECISION = jax.lax.Precision.DEFAULT
TRI_PRECISION = jax.lax.Precision.HIGHEST
BWD_PRECISION = jax.lax.Precision.DEFAULT


def _dot_tn(a, b, precision=None):
    """a.T @ b without materializing the transpose: (R,M),(R,N) -> (M,N).

    Inside a Mosaic kernel ``jnp.dot(a.T, b)`` emits an actual relayout
    (sublane/lane shuffles) before the matmul; contracting dim 0 of both
    operands lets the MXU consume the LHS column-wise directly."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=BWD_PRECISION if precision is None else precision)


def _dot_nt(a, b, precision=None):
    """a @ b.T without materializing the transpose: (M,K),(N,K) -> (M,N)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
        precision=BWD_PRECISION if precision is None else precision)


def _k3_phase(x, mat):
    """(M,3) @ (3,N) as three broadcasted FMAs on the VPU.

    A K=3 contraction wastes the MXU (3/128 of the systolic array) and —
    worse — Mosaic's single-pass bf16 demotion truncates the COORDINATES,
    so the phase error scales with the PE frequency (up to pi*2^L ~ 800:
    the high-frequency features decohere entirely, measured -5 dB on the
    quality demo).  Broadcast FMAs stay exact f32 and full-lane.
    """
    return (x[:, 0:1] * mat[0:1, :] + x[:, 1:2] * mat[1:2, :]
            + x[:, 2:3] * mat[2:3, :])


def _ext_features(x, mat, phase):
    """``[x ++ PE(x) ++ 0]`` in one (M, 4+6L) tensor: exact-f32 phase FMAs
    (``_k3_phase``) against the extended matrix (pe_trig_matrices_ext —
    identity columns 0-2, trig phases after), then one lane select that
    keeps the raw phase on the identity lanes and sin() elsewhere.  The
    identity lanes reproduce x EXACTLY (x0*1 + x1*0 + x2*0).  Feeding
    fc1/skip/rgb1 with this single operand merges each layer's K=3
    identity dot + K=6L trig dot into ONE MXU dot (the weight rows are
    already contiguous in that order)."""
    u = _k3_phase(x, mat[:]) + phase[:]
    if "sin" in ABLATE:
        return u
    col = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    return jnp.where(col < 3, u, _sin(u))


def _cumprod_lanes(x, n):
    """Inclusive prefix product along the last (lane) dim, width ``n``.

    Hillis-Steele over log2(n) masked circular shifts.  Exact f32 at every
    step (vs the tridot path's exp(dot(log)) round-trip) and pure VPU work
    — the products live in (0, 1], so there is no cancellation."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    shift = 1
    while shift < n:
        y = pltpu.roll(x, shift, axis=x.ndim - 1)
        x = jnp.where(col >= shift, x * y, x)
        shift *= 2
    return x


def _suffix_sum_lanes(x, n):
    """Exclusive suffix sum along lanes: out[i] = sum_{j > i} x[j]."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    # strict shift-left (x[i] <- x[i+1], 0 at the end), then an inclusive
    # suffix Hillis-Steele scan
    x = jnp.where(col < n - 1, pltpu.roll(x, n - 1, axis=x.ndim - 1), 0.0)
    shift = 1
    while shift < n:
        y = pltpu.roll(x, n - shift, axis=x.ndim - 1)
        x = jnp.where(col < n - shift, x + y, x)
        shift *= 2
    return x


def _wb_maps(wb, names):
    W = {name: wb[2 * i] for i, name in enumerate(names)}
    B = {name: wb[2 * i + 1] for i, name in enumerate(names)}
    return W, B


def _chunk_forward(W, B, o, d, extd, z, dists, pemat, pephase,
                   ray_tile, sample_chunk, n_pe, n_de, body, density_act,
                   keep=False, tri=None):
    """One chunk's forward.  Returns (density, rgb, alpha, one_m, excl, cum)
    plus (if keep) the intermediate activations needed for backward.

    ``extd`` is the per-ray ``[d ++ PE(d)]`` operand (_ext_features); the
    position analog ``ext`` is built here per chunk.  fc1 / skip / rgb1
    each consume ONE dot against their contiguous [identity; trig] weight
    rows instead of a K=3 + a K=6L pair (each K<=128 dot costs a full MXU
    pass regardless, so the merge halves those layers' input-side passes).

    ``body``/``density_act`` come from fused_render._arch_layers — the
    active arch's program reproduces the original hardcoded chain op for
    op; the legacy arch differs only in layer names/count and a relu (not
    softplus) density column."""

    def lin(name, x, out_dtype=f32):
        return (
            jnp.dot(x, W[name][:], preferred_element_type=f32, precision=MXU_PRECISION) + B[name][:]
        )

    pts = (o[:, None, :] + d[:, None, :] * z[..., None]).reshape(-1, 3)
    ext = _ext_features(pts, pemat, pephase)          # (T*CH, 4 + n_pe)

    def lin_parts(name, parts):
        out = B[name][:].astype(f32)
        for x, s, e in parts:
            out = out + jnp.dot(x, W[name][s:e, :], preferred_element_type=f32, precision=MXU_PRECISION)
        return out

    acts = {"ext": ext}
    h = jnp.maximum(lin("fc1", ext), 0.0)
    hs = [h]
    hidden = h.shape[-1]
    for kind, name in body:
        if kind == "plain":
            h = jnp.maximum(lin(name, h), 0.0)
        else:   # skip-concat via row-block dots (concat-free)
            h = jnp.maximum(
                lin_parts(name, [
                    (h, 0, hidden),
                    (ext, hidden, hidden + 4 + n_pe),  # +1 pad row
                ]), 0.0)
        hs.append(h)
    df = lin("densfeat", h)
    if density_act == "softplus":
        density = jax.nn.softplus(df[:, :1])
    else:                       # legacy: post-ReLU channel 0
        density = jnp.maximum(df[:, :1], 0.0)
    feat = jnp.maximum(df[:, 1:], 0.0)
    dir_part = jnp.dot(
        extd, W["rgb1"][hidden:hidden + 4 + n_de, :],
        preferred_element_type=f32, precision=MXU_PRECISION)
    feat_part = jnp.dot(feat, W["rgb1"][:hidden, :], preferred_element_type=f32, precision=MXU_PRECISION)
    rgb_h = (
        feat_part.reshape(ray_tile, sample_chunk, -1) + dir_part[:, None, :]
        + B["rgb1"][:]
    ).reshape(ray_tile * sample_chunk, -1)
    rgb_h = jnp.maximum(rgb_h, 0.0)
    rgb = jax.nn.sigmoid(lin("rgb2", rgb_h))

    dens = density.reshape(ray_tile, sample_chunk)
    if "composite" in ABLATE:
        alpha = dens * dists
        one_m = 1.0 - alpha + 1e-10
        cum = one_m
        excl = jnp.ones_like(one_m)
    elif COMPOSITE_IMPL == "scan":
        x = dens * dists
        exp_neg = jnp.exp(-x)
        alpha = 1.0 - exp_neg
        one_m = exp_neg + 1e-10   # NOT 1-alpha+1e-10: see CAUTION below
        cum = _cumprod_lanes(one_m, sample_chunk)
        excl = cum / one_m
    else:
        x = dens * dists
        exp_neg = jnp.exp(-x)
        alpha = 1.0 - exp_neg
        # CAUTION: one_m MUST be exp(-x) + 1e-10, not 1 - alpha + 1e-10.
        # The compiler reassociates the latter into (1 + 1e-10) - alpha,
        # which rounds the epsilon away (ulp(1) = 1.2e-7): one_m becomes
        # EXACTLY 0 at saturated samples and the backward's R/one_m term
        # NaNs the entire density-chain gradient (reproduced in interpret
        # mode; pinned by test_saturated_density_matches_xla).  The direct
        # form has no cancellation structure for the optimizer to rewrite.
        one_m = exp_neg + 1e-10
        # log(one_m) == log(exp(-x) + 1e-10) == -x up to 1e-10*e^x absolute
        # (< 1e-6 for x < 9; for larger x the transmittance PAST the sample
        # is ~0 either way).  Using -x directly drops a log per sample AND
        # unchains the tri-dot from the exp.  CAUTION: with this form the
        # exclusive transmittance must be exp(csum + x) — dividing cum by
        # the FLOORED one_m instead mixes the clamped and unclamped scales
        # and collapses a SATURATED (x > ~23) sample's own weight from ~T
        # to ~T*e^-x/1e-10: the absorber renders ~black, the loss explodes
        # once training drives densities into saturation (observed: loss
        # 7e-4 -> 484 at step ~310 on an overfit 12-view scene; the XLA
        # path was stable).
        log1m = -x
        if tri is None:  # host passes the triangular constant as an operand
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (sample_chunk, sample_chunk), 0)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (sample_chunk, sample_chunk), 1)
            tri_m = (rows <= cols).astype(f32)
        else:
            tri_m = tri[:]
        csum = jnp.dot(log1m, tri_m, preferred_element_type=f32,
                       precision=TRI_PRECISION)
        cum = jnp.exp(csum)
        excl = jnp.exp(csum + x)      # exclusive sum directly (see CAUTION)
    if keep:
        acts.update(hs=hs, df=df, feat=feat, rgb_h=rgb_h, rgb=rgb,
                    density=density)
    return density, rgb, alpha, one_m, excl, cum, acts


def _make_fwd_kernel(mcfg, rcfg, ray_tile, sample_chunk, n_sample,
                     tiles_per_program):
    n_chunks = n_sample // sample_chunk
    names, body, density_act, n_pe, n_de = _arch_static(mcfg)
    white = rcfg.white_background

    def kernel(o_ref, d_ref, z_ref, dists_ref,
               pemat_ref, pephase_ref, dmat_ref, dphase_ref, tri_ref,
               *wb_and_out):
        *wb, rgb_out, tb_out = wb_and_out
        W, B = _wb_maps(wb, names)

        def subtile(s, _):
            row0 = pl.multiple_of(s * ray_tile, 8)
            o = o_ref[pl.ds(row0, ray_tile), :]
            d = d_ref[pl.ds(row0, ray_tile), :]
            extd = _ext_features(d, dmat_ref, dphase_ref)
            T_in = jnp.ones((ray_tile, 1), f32)
            acc = jnp.zeros((ray_tile, 3), f32)
            wsum = jnp.zeros((ray_tile, 1), f32)
            # chunk loop statically unrolled: residual column writes and the
            # reverse walk in backward then use static indices (the dynamic
            # lane-dim variants violate Mosaic's 128-alignment rule)
            for c in range(n_chunks):
                start = c * sample_chunk
                z = z_ref[pl.ds(row0, ray_tile), start:start + sample_chunk]
                dists = dists_ref[
                    pl.ds(row0, ray_tile), start:start + sample_chunk]
                # record the chunk's entering transmittance (residual)
                tb_out[pl.ds(row0, ray_tile), c:c + 1] = T_in
                density, rgb, alpha, one_m, excl, cum, _ = _chunk_forward(
                    W, B, o, d, extd, z, dists,
                    pemat_ref, pephase_ref,
                    ray_tile, sample_chunk, n_pe, n_de, body, density_act,
                    tri=tri_ref,
                )
                w = alpha * (T_in * excl)
                rgb3 = rgb.reshape(ray_tile, sample_chunk, 3)
                acc = acc + jnp.sum(w[..., None] * rgb3, axis=1)
                if white:
                    wsum = wsum + jnp.sum(w, axis=1, keepdims=True)
                T_in = T_in * cum[:, -1:]
            if white:  # ADDITION: standard NeRF white background
                acc = acc + (1.0 - wsum)
            rgb_out[pl.ds(row0, ray_tile), :] = acc
            return 0

        jax.lax.fori_loop(0, tiles_per_program, subtile, 0)

    return kernel


def _composite_backward_chunk(g, w, rgb3, T_i, one_m, alpha, dists,
                              S_carry, sample_chunk, tri=None, gsum=None):
    """Analytic compositing backward for one sample chunk.

    Returns (dL_dsigma (T, CH), updated suffix carry S_carry (T, 1)).
    dL/dalpha_i = q_i T_i - R_i/(1-alpha_i+eps), with q = g.c and R the
    strict-suffix sum of q*w carried across chunks (processed in reverse).

    ``gsum`` (white background): out = sum w_i rgb_i + (1 - sum w_i), so
    dL/dw_i picks up a uniform -sum_c(g_c) term — q shifts by -gsum and the
    rest of the chain is unchanged.  (White background is an ADDITION —
    the standard NeRF --white_bkgd option; the reference's compositor,
    train.py:248-271, has no background term.)
    """
    q = jnp.sum(rgb3 * g[:, None, :], axis=-1)           # (T, CH)
    if gsum is not None:
        q = q - gsum
    if "composite" in ABLATE:
        return q * dists, S_carry
    qw = q * w
    if COMPOSITE_IMPL == "scan":
        R = _suffix_sum_lanes(qw, sample_chunk) + S_carry
    else:
        if tri is None:
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (sample_chunk, sample_chunk), 0)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (sample_chunk, sample_chunk), 1)
            upper = (rows > cols).astype(f32)            # j > i contributes
        else:
            upper = 1.0 - tri[:]      # strict complement of inclusive tri
        R = jnp.dot(qw, upper, preferred_element_type=f32,
                    precision=TRI_PRECISION) + S_carry
    dL_dalpha = q * T_i - R / one_m
    dL_dsigma = dL_dalpha * dists * (1.0 - alpha)
    return dL_dsigma, S_carry + jnp.sum(qw, axis=1, keepdims=True)


def _chunk_mlp_backward(W, gW, gB, acts, g, w, dL_dsigma,
                        ray_tile, sample_chunk, n_pe, body, density_act):
    """Backprop one chunk's MLP given its forward activations; accumulates
    weight/bias grads into the VMEM-resident gW/gB refs and returns this
    chunk's per-ray direction-head cotangent (to be applied once per ray).

    Shared by the recompute backward kernel (activations rebuilt in VMEM)
    and the merged fwd+bwd step kernel (activations kept from forward).
    ``body`` is walked in reverse (hs[j] is body layer j's INPUT since
    hs[0] is fc1's output) — for the active arch this emits the exact op
    sequence the original hardcoded fc2/skip/fc chain did.
    """
    hidden = acts["hs"][0].shape[-1]
    rowsN = ray_tile * sample_chunk
    rgb = acts["rgb"]
    # rgb head
    d_c = (w[..., None] * g[:, None, :]).reshape(rowsN, 3)
    d_rgb_raw = d_c * rgb * (1.0 - rgb)
    gW["rgb2"][...] += _dot_tn(acts["rgb_h"], d_rgb_raw)
    gB["rgb2"][...] += jnp.sum(d_rgb_raw, axis=0)
    d_rgb_h = _dot_nt(d_rgb_raw, W["rgb2"][:]) * (acts["rgb_h"] > 0)
    # rgb1: feat rows + per-ray dir rows
    gW["rgb1"][0:hidden, :] += _dot_tn(acts["feat"], d_rgb_h)
    gB["rgb1"][...] += jnp.sum(d_rgb_h, axis=0)
    d_dirpart = jnp.sum(
        d_rgb_h.reshape(ray_tile, sample_chunk, -1), axis=1)
    d_feat = _dot_nt(d_rgb_h, W["rgb1"][0:hidden, :]) * (acts["feat"] > 0)
    # merged density+feature head.  (Concatenating the density cotangent
    # with the feature cotangent to fuse the head's backward dots was
    # A/B'd on-chip and measured SLOWER — the unaligned 1+hidden concat
    # costs a relayout that outweighs the saved pass; keep the split dots.)
    if density_act == "softplus":
        dact = 1.0 - jnp.exp(-acts["density"])   # softplus' = sigmoid
    else:                                        # legacy relu column
        dact = (acts["density"] > 0).astype(f32)
    d_dens_col = dL_dsigma.reshape(rowsN, 1) * dact
    h_last = acts["hs"][-1]
    gW["densfeat"][:, 0:1] += _dot_tn(h_last, d_dens_col)
    gW["densfeat"][:, 1:] += _dot_tn(h_last, d_feat)
    gB["densfeat"][0:1] += jnp.sum(d_dens_col, axis=0)
    gB["densfeat"][1:] += jnp.sum(d_feat, axis=0)
    d_h = (
        _dot_nt(d_dens_col, W["densfeat"][:, 0:1])
        + _dot_nt(d_feat, W["densfeat"][:, 1:])
    ) * (h_last > 0)
    # reversed body walk; hs[j] is body layer j's input (hs[0] = h_fc1).
    # d_h entering a skip layer is the grad wrt its OUTPUT, already masked
    # by (next layer's input > 0) == (h_skip > 0).
    for j in range(len(body) - 1, -1, -1):
        kind, name = body[j]
        h_inp = acts["hs"][j]
        if kind == "plain":
            gW[name][...] += _dot_tn(h_inp, d_h)
            gB[name][...] += jnp.sum(d_h, axis=0)
            d_h = _dot_nt(d_h, W[name][:]) * (h_inp > 0)
        else:  # skip layer (input = [h_prev, ext])
            gW[name][0:hidden, :] += _dot_tn(h_inp, d_h)
            gW[name][hidden:hidden + 4 + n_pe, :] += _dot_tn(
                acts["ext"], d_h)
            gB[name][...] += jnp.sum(d_h, axis=0)
            d_h = _dot_nt(d_h, W[name][0:hidden, :]) * (h_inp > 0)
    # fc1 (input = ext = [pts, trig]); d_h is grad wrt h_fc1 output.
    # No input-side dot: positions aren't trainable, so the grad stops here.
    gW["fc1"][...] += _dot_tn(acts["ext"], d_h)
    gB["fc1"][...] += jnp.sum(d_h, axis=0)
    return d_dirpart


def _make_bwd_kernel(mcfg, rcfg, ray_tile, sample_chunk, n_sample,
                     tiles_per_program):
    n_chunks = n_sample // sample_chunk
    names, body, density_act, n_pe, n_de = _arch_static(mcfg)
    white = rcfg.white_background

    def kernel(o_ref, d_ref, z_ref, dists_ref, tb_ref, g_ref,
               pemat_ref, pephase_ref, dmat_ref, dphase_ref, tri_ref,
               *wb_and_out):
        n_w = 2 * len(names)
        wb = wb_and_out[:n_w]
        grads = wb_and_out[n_w:n_w * 2]
        W, B = _wb_maps(wb, names)
        gW = {name: grads[2 * i] for i, name in enumerate(names)}
        gB = {name: grads[2 * i + 1] for i, name in enumerate(names)}

        # program 0 zero-initializes the accumulated grads (sequential grid)
        @pl.when(pl.program_id(0) == 0)
        def _():
            for gref in grads:
                gref[...] = jnp.zeros_like(gref)

        def subtile(s, _):
            row0 = pl.multiple_of(s * ray_tile, 8)
            o = o_ref[pl.ds(row0, ray_tile), :]
            d = d_ref[pl.ds(row0, ray_tile), :]
            g = g_ref[pl.ds(row0, ray_tile), :]            # (T, 3)
            gsum = jnp.sum(g, axis=1, keepdims=True) if white else None
            extd = _ext_features(d, dmat_ref, dphase_ref)
            S_carry = jnp.zeros((ray_tile, 1), f32)        # suffix qw carry
            d_dirpart_total = jnp.zeros((ray_tile, W["rgb1"].shape[1]), f32)

            for c in range(n_chunks - 1, -1, -1):          # reverse, unrolled
                start = c * sample_chunk
                z = z_ref[pl.ds(row0, ray_tile), start:start + sample_chunk]
                dists = dists_ref[
                    pl.ds(row0, ray_tile), start:start + sample_chunk]
                T_in = tb_ref[pl.ds(row0, ray_tile), c:c + 1]

                density, rgb, alpha, one_m, excl, cum, acts = _chunk_forward(
                    W, B, o, d, extd, z, dists, pemat_ref, pephase_ref,
                    ray_tile, sample_chunk, n_pe, n_de, body, density_act,
                    keep=True, tri=tri_ref,
                )
                T_i = T_in * excl                          # (T, CH)
                w = alpha * T_i
                rgb3 = rgb.reshape(ray_tile, sample_chunk, 3)
                dL_dsigma, S_carry = _composite_backward_chunk(
                    g, w, rgb3, T_i, one_m, alpha, dists, S_carry,
                    sample_chunk, tri=tri_ref, gsum=gsum)
                d_dirpart_total = d_dirpart_total + _chunk_mlp_backward(
                    W, gW, gB, acts, g, w, dL_dsigma,
                    ray_tile, sample_chunk, n_pe, body, density_act)

            # per-ray direction rows of rgb1 (accumulated over all chunks)
            hidden = W["fc1"].shape[1]
            gW["rgb1"][hidden:hidden + 4 + n_de, :] += _dot_tn(
                extd, d_dirpart_total)
            return 0

        jax.lax.fori_loop(0, tiles_per_program, subtile, 0)

    return kernel


def _common_prep(origins, directions, z_vals, rcfg, ray_tile,
                 tiles_per_program, sample_chunk):
    # kernels are f32 throughout; coerce here so callers under x64 (tests)
    # or a f64 sample_pdf don't trip the VMEM ref dtype check
    origins = origins.astype(f32)
    directions = directions.astype(f32)
    z_vals = z_vals.astype(f32)
    n = origins.shape[0]
    # sample-axis pad to the chunk multiple: zero-dist duplicate samples
    # are exact no-ops in forward AND backward (pad_sample_axis), so any
    # --n_sample runs in-kernel instead of the 4x-slower XLA fallback
    tail = 1e-3 if rcfg.variant == "train" else 1.0
    z_vals, dists, n_sample_real = pad_sample_axis(
        z_vals, sample_chunk, tail)
    n_sample = z_vals.shape[1]
    block = ray_tile * tiles_per_program
    n_progs = (n + block - 1) // block
    pad = n_progs * block - n
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=0.0)
    d = d.at[n:, 2].set(1.0) if pad else d
    z = jnp.pad(z_vals, ((0, pad), (0, 0)), constant_values=1.0)
    dists = jnp.pad(dists, ((0, pad), (0, 0)))
    return o, d, z, dists, n, n_progs, block, n_sample, n_sample_real


@functools.partial(
    jax.jit,
    static_argnames=("mcfg", "rcfg", "ray_tile", "sample_chunk",
                     "tiles_per_program", "interpret"),
)
def _fused_train_fwd(packed, origins, directions, z_vals, mcfg, rcfg,
                     ray_tile=16, sample_chunk=128, tiles_per_program=8,
                     interpret=False):
    o, d, z, dists, n, n_progs, block, n_sample, _ = _common_prep(
        origins, directions, z_vals, rcfg, ray_tile, tiles_per_program,
        sample_chunk)
    n_chunks = n_sample // sample_chunk
    assert n_chunks <= 8, "chunk loop is unrolled; keep n_sample/sample_chunk small"
    (pe_mat, pe_phase), (d_mat, d_phase) = _pe_mats(mcfg)
    tri_h = tri_inclusive(sample_chunk)
    kernel = _make_fwd_kernel(
        mcfg, rcfg, ray_tile, sample_chunk, n_sample, tiles_per_program)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    rgb, tb = pl.pallas_call(
        kernel,
        grid=(n_progs,),
        in_specs=[blk(3), blk(3), blk(n_sample), blk(n_sample),
                  full, full, full, full, full, *[full] * len(packed)],
        out_specs=(blk(3), blk(n_chunks)),
        out_shape=(
            jax.ShapeDtypeStruct((n_progs * block, 3), f32),
            jax.ShapeDtypeStruct((n_progs * block, n_chunks), f32),
        ),
        interpret=interpret,
    )(o, d, z, dists, jnp.asarray(pe_mat), jnp.asarray(pe_phase),
      jnp.asarray(d_mat), jnp.asarray(d_phase), jnp.asarray(tri_h), *packed)
    return rgb[:n], tb


@functools.partial(
    jax.jit,
    static_argnames=("mcfg", "rcfg", "ray_tile", "sample_chunk",
                     "tiles_per_program", "interpret"),
)
def _fused_train_bwd(packed, origins, directions, z_vals, tb, g, mcfg, rcfg,
                     ray_tile=16, sample_chunk=128, tiles_per_program=8,
                     interpret=False):
    o, d, z, dists, n, n_progs, block, n_sample, _ = _common_prep(
        origins, directions, z_vals, rcfg, ray_tile, tiles_per_program,
        sample_chunk)
    n_chunks = n_sample // sample_chunk
    g_pad = jnp.pad(g, ((0, n_progs * block - n), (0, 0)))
    (pe_mat, pe_phase), (d_mat, d_phase) = _pe_mats(mcfg)
    tri_h = tri_inclusive(sample_chunk)
    kernel = _make_bwd_kernel(
        mcfg, rcfg, ray_tile, sample_chunk, n_sample, tiles_per_program)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    # grads accumulate across the (sequential) grid: constant index maps
    grad_specs = tuple(
        pl.BlockSpec(p.shape, lambda i, nd=len(p.shape): (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in packed
    )
    grad_shapes = tuple(
        jax.ShapeDtypeStruct(p.shape, f32) for p in packed
    )
    grads = pl.pallas_call(
        kernel,
        grid=(n_progs,),
        in_specs=[blk(3), blk(3), blk(n_sample), blk(n_sample),
                  blk(n_chunks), blk(3),
                  full, full, full, full, full, *[full] * len(packed)],
        out_specs=grad_specs,
        out_shape=grad_shapes,
        interpret=interpret,
    )(o, d, z, dists, tb, g_pad, jnp.asarray(pe_mat), jnp.asarray(pe_phase),
      jnp.asarray(d_mat), jnp.asarray(d_phase), jnp.asarray(tri_h), *packed)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_render_train(packed, origins, directions, z_vals, mcfg, rcfg,
                       ray_tile=16, sample_chunk=128, tiles_per_program=8,
                       interpret=False):
    """Differentiable (w.r.t. ``packed``) fused render for training."""
    rgb, _ = _fused_train_fwd(
        packed, origins, directions, z_vals, mcfg, rcfg,
        ray_tile, sample_chunk, tiles_per_program, interpret)
    return rgb


def _frt_fwd(packed, origins, directions, z_vals, mcfg, rcfg,
             ray_tile, sample_chunk, tiles_per_program, interpret):
    rgb, tb = _fused_train_fwd(
        packed, origins, directions, z_vals, mcfg, rcfg,
        ray_tile, sample_chunk, tiles_per_program, interpret)
    return rgb, (packed, origins, directions, z_vals, tb)


def _frt_bwd(mcfg, rcfg, ray_tile, sample_chunk, tiles_per_program,
             interpret, res, g):
    packed, origins, directions, z_vals, tb = res
    grads = _fused_train_bwd(
        packed, origins, directions, z_vals, tb, g, mcfg, rcfg,
        ray_tile, sample_chunk, tiles_per_program, interpret)
    grads = tuple(gr.astype(p.dtype) for gr, p in zip(grads, packed))
    zeros = lambda a: jnp.zeros_like(a)
    return (grads, zeros(origins), zeros(directions), zeros(z_vals))


fused_render_train.defvjp(_frt_fwd, _frt_bwd)


# ---------------------------------------------------------------------------
# Merged forward+backward step kernel ("v2"): one Pallas launch per batch.
#
# The two-kernel design above costs 4x the forward matmul volume per train
# step (fwd 1x + backward recompute 1x + grad dots 2x).  The MSE loss
# gradient is per-ray LOCAL (dL/drgb_i = 2 (rgb_i - target_i) / (3N)), so
# the backward never has to leave the kernel: forward keeps each chunk's
# activations resident in VMEM, computes g from the target in-kernel, and
# walks the chunks in reverse consuming the STORED activations — 3x the
# forward matmul volume, no recompute, one launch instead of two, and z /
# dists / rays are read from HBM once instead of twice.  VMEM cost is
# ~2.8 MB per ray at 256 samples x 256 hidden (vs ~16 KB for the recompute
# design), so ray_tile stays small and vmem_limit_bytes is raised.
# ---------------------------------------------------------------------------


def _make_step_kernel(mcfg, rcfg, ray_tile, sample_chunk, n_sample,
                      tiles_per_program, emit_weights=False, n_progs=1):
    n_chunks = n_sample // sample_chunk
    names, body, density_act, n_pe, n_de = _arch_static(mcfg)
    white = rcfg.white_background

    def kernel(o_ref, d_ref, z_ref, dists_ref, t_ref, wcol_ref,
               pemat_ref, pephase_ref, dmat_ref, dphase_ref, tri_ref,
               *wb_and_out):
        n_w = 2 * len(names)
        wb = wb_and_out[:n_w]
        idx = n_w
        rgb_out = wb_and_out[idx]
        idx += 1
        if emit_weights:
            w_out = wb_and_out[idx]
            idx += 1
        grads = wb_and_out[idx:idx + n_w]
        scratch = wb_and_out[idx + n_w:]   # "2s" second-stream accumulators
        W, B = _wb_maps(wb, names)
        gW = {name: grads[2 * i] for i, name in enumerate(names)}
        gB = {name: grads[2 * i + 1] for i, name in enumerate(names)}

        @pl.when(pl.program_id(0) == 0)
        def _():
            for gref in grads:
                gref[...] = jnp.zeros_like(gref)
            for gref in scratch:
                gref[...] = jnp.zeros_like(gref)

        def subtile(s, gW, gB):
            row0 = pl.multiple_of(s * ray_tile, 8)
            o = o_ref[pl.ds(row0, ray_tile), :]
            d = d_ref[pl.ds(row0, ray_tile), :]
            t = t_ref[pl.ds(row0, ray_tile), :]
            wcol = wcol_ref[pl.ds(row0, ray_tile), :]      # (T,1) dL/drgb scale
            extd = _ext_features(d, dmat_ref, dphase_ref)

            T_in = jnp.ones((ray_tile, 1), f32)
            acc = jnp.zeros((ray_tile, 3), f32)
            wsum = jnp.zeros((ray_tile, 1), f32)
            saved = []
            for c in range(n_chunks):                      # forward, unrolled
                start = c * sample_chunk
                z = z_ref[pl.ds(row0, ray_tile), start:start + sample_chunk]
                dists = dists_ref[
                    pl.ds(row0, ray_tile), start:start + sample_chunk]
                density, rgb, alpha, one_m, excl, cum, acts = _chunk_forward(
                    W, B, o, d, extd, z, dists, pemat_ref, pephase_ref,
                    ray_tile, sample_chunk, n_pe, n_de, body, density_act,
                    keep=True, tri=tri_ref,
                )
                T_i = T_in * excl
                w = alpha * T_i
                rgb3 = rgb.reshape(ray_tile, sample_chunk, 3)
                acc = acc + jnp.sum(w[..., None] * rgb3, axis=1)
                if emit_weights:
                    w_out[pl.ds(row0, ray_tile),
                          start:start + sample_chunk] = w
                if white:
                    wsum = wsum + jnp.sum(w, axis=1, keepdims=True)
                saved.append((acts, alpha, one_m, T_i, w, rgb3, dists))
                T_in = T_in * cum[:, -1:]
            if white:  # ADDITION: standard NeRF white background
                acc = acc + (1.0 - wsum)
            rgb_out[pl.ds(row0, ray_tile), :] = acc

            if "bwd" not in ABLATE:
                g = (acc - t) * wcol                       # in-kernel MSE grad
                gsum = jnp.sum(g, axis=1, keepdims=True) if white else None
                S_carry = jnp.zeros((ray_tile, 1), f32)
                d_dirpart_total = jnp.zeros(
                    (ray_tile, W["rgb1"].shape[1]), f32)
                for c in range(n_chunks - 1, -1, -1):      # backward, stored
                    acts, alpha, one_m, T_i, w, rgb3, dists = saved[c]
                    dL_dsigma, S_carry = _composite_backward_chunk(
                        g, w, rgb3, T_i, one_m, alpha, dists, S_carry,
                        sample_chunk, tri=tri_ref, gsum=gsum)
                    d_dirpart_total = d_dirpart_total + _chunk_mlp_backward(
                        W, gW, gB, acts, g, w, dL_dsigma,
                        ray_tile, sample_chunk, n_pe, body, density_act)

                hidden = W["fc1"].shape[1]
                gW["rgb1"][hidden:hidden + 4 + n_de, :] += _dot_tn(
                    extd, d_dirpart_total)
            return 0

        if INTERLEAVE in ("2", "2s") and tiles_per_program % 2 == 0:
            if scratch:
                gW2 = {n: scratch[2 * i]
                       for i, n in enumerate(names)}
                gB2 = {n: scratch[2 * i + 1]
                       for i, n in enumerate(names)}
            else:
                gW2, gB2 = gW, gB

            def pair(i, _):
                subtile(2 * i, gW, gB)
                subtile(2 * i + 1, gW2, gB2)
                return 0

            jax.lax.fori_loop(0, tiles_per_program // 2, pair, 0)
        else:
            jax.lax.fori_loop(
                0, tiles_per_program, lambda s, _: subtile(s, gW, gB), 0)

        if scratch:  # fold the second stream's accumulators into the outputs
            @pl.when(pl.program_id(0) == n_progs - 1)
            def _():
                for gref, sref in zip(grads, scratch):
                    gref[...] += sref[...]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mcfg", "rcfg", "ray_tile", "sample_chunk",
                     "tiles_per_program", "vmem_mb", "interpret",
                     "emit_weights"),
)
def _fused_step_impl(packed, origins, directions, z_vals, target,
                     mcfg, rcfg, ray_tile=8, sample_chunk=128,
                     tiles_per_program=16, vmem_mb=100, interpret=False,
                     emit_weights=False):
    """One launch: (rgb[, weights], grads-wrt-packed) for the MSE objective."""
    o, d, z, dists, n, n_progs, block, n_sample, n_sample_real = _common_prep(
        origins, directions, z_vals, rcfg, ray_tile, tiles_per_program,
        sample_chunk)
    n_chunks = n_sample // sample_chunk
    assert n_chunks <= 8, "chunk loop is unrolled; keep n_sample/sample_chunk small"
    pad_n = n_progs * block - n
    t = jnp.pad(target.astype(f32), ((0, pad_n), (0, 0)))
    # dL/drgb scale per ray: 2/(3n) for real rays, 0 for padding — the
    # padded rays' garbage (acc - 0) must not leak into the weight grads
    wcol = jnp.full((n, 1), 2.0 / (3.0 * n), f32)
    wcol = jnp.pad(wcol, ((0, pad_n), (0, 0)))
    (pe_mat, pe_phase), (d_mat, d_phase) = _pe_mats(mcfg)
    tri_h = tri_inclusive(sample_chunk)
    kernel = _make_step_kernel(
        mcfg, rcfg, ray_tile, sample_chunk, n_sample, tiles_per_program,
        emit_weights=emit_weights, n_progs=n_progs)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    grad_specs = tuple(
        pl.BlockSpec(p.shape, lambda i, nd=len(p.shape): (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in packed
    )
    grad_shapes = tuple(jax.ShapeDtypeStruct(p.shape, f32) for p in packed)
    w_specs = (blk(n_sample),) if emit_weights else ()
    w_shapes = (
        (jax.ShapeDtypeStruct((n_progs * block, n_sample), f32),)
        if emit_weights else ()
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    if INTERLEAVE == "2s" and tiles_per_program % 2 == 0:
        kwargs["scratch_shapes"] = [pltpu.VMEM(p.shape, f32) for p in packed]
    rgb, *rest = pl.pallas_call(
        kernel,
        grid=(n_progs,),
        in_specs=[blk(3), blk(3), blk(n_sample), blk(n_sample),
                  blk(3), blk(1),
                  full, full, full, full, full, *[full] * len(packed)],
        out_specs=(blk(3), *w_specs, *grad_specs),
        out_shape=(
            jax.ShapeDtypeStruct((n_progs * block, 3), f32),
            *w_shapes,
            *grad_shapes,
        ),
        interpret=interpret,
        **kwargs,
    )(o, d, z, dists, t, wcol, jnp.asarray(pe_mat), jnp.asarray(pe_phase),
      jnp.asarray(d_mat), jnp.asarray(d_phase), jnp.asarray(tri_h), *packed)
    if emit_weights:
        # padded sample columns carry exactly-zero weights; trim to the
        # caller's real sample width (sample_pdf mids use the caller's z)
        return rgb[:n], rest[0][:n, :n_sample_real], tuple(rest[1:])
    return rgb[:n], tuple(rest)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_mse_loss(packed, origins, directions, z_vals, target, mcfg, rcfg,
                   ray_tile=8, sample_chunk=128, tiles_per_program=16,
                   vmem_mb=100, interpret=False):
    """mean((render(rays) - target)^2), differentiable w.r.t. ``packed``.

    The forward pass already produces the exact parameter gradients (the
    merged kernel computes the MSE cotangent in-kernel), so the VJP is just
    a scalar rescale of the stashed grads — jax.value_and_grad over this
    function costs ONE kernel launch total."""
    rgb, _ = _fused_step_impl(
        packed, origins, directions, z_vals, target, mcfg, rcfg,
        ray_tile, sample_chunk, tiles_per_program, vmem_mb, interpret)
    return jnp.mean((rgb - target) ** 2)


def _fml_fwd(packed, origins, directions, z_vals, target, mcfg, rcfg,
             ray_tile, sample_chunk, tiles_per_program, vmem_mb, interpret):
    rgb, grads = _fused_step_impl(
        packed, origins, directions, z_vals, target, mcfg, rcfg,
        ray_tile, sample_chunk, tiles_per_program, vmem_mb, interpret)
    loss = jnp.mean((rgb - target) ** 2)
    return loss, (grads, packed, origins, directions, z_vals, target)


def _fml_bwd(mcfg, rcfg, ray_tile, sample_chunk, tiles_per_program, vmem_mb,
             interpret, res, gbar):
    grads, packed, origins, directions, z_vals, target = res
    scaled = tuple((gbar * g).astype(p.dtype) for g, p in zip(grads, packed))
    zeros = lambda a: jnp.zeros_like(a)
    return (scaled, zeros(origins), zeros(directions), zeros(z_vals),
            zeros(target))


fused_mse_loss.defvjp(_fml_fwd, _fml_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_mse_loss_weights(packed, origins, directions, z_vals, target,
                           mcfg, rcfg, ray_tile=8, sample_chunk=128,
                           tiles_per_program=16, vmem_mb=100,
                           interpret=False):
    """(loss, per-sample compositing weights) — the coarse pass of fused
    hierarchical training.  The weights output is DETACHED (vanilla-NeRF
    semantics: sample_pdf consumes the coarse weight histogram without
    backpropagating through it), so the VJP is identical to
    fused_mse_loss's scalar rescale."""
    rgb, w, _ = _fused_step_impl(
        packed, origins, directions, z_vals, target, mcfg, rcfg,
        ray_tile, sample_chunk, tiles_per_program, vmem_mb, interpret,
        emit_weights=True)
    return jnp.mean((rgb - target) ** 2), w


def _fmlw_fwd(packed, origins, directions, z_vals, target, mcfg, rcfg,
              ray_tile, sample_chunk, tiles_per_program, vmem_mb, interpret):
    rgb, w, grads = _fused_step_impl(
        packed, origins, directions, z_vals, target, mcfg, rcfg,
        ray_tile, sample_chunk, tiles_per_program, vmem_mb, interpret,
        emit_weights=True)
    loss = jnp.mean((rgb - target) ** 2)
    return (loss, w), (grads, packed, origins, directions, z_vals, target)


def _fmlw_bwd(mcfg, rcfg, ray_tile, sample_chunk, tiles_per_program, vmem_mb,
              interpret, res, cts):
    gbar, _ = cts                       # weights cotangent ignored (detached)
    grads, packed, origins, directions, z_vals, target = res
    scaled = tuple((gbar * g).astype(p.dtype) for g, p in zip(grads, packed))
    zeros = lambda a: jnp.zeros_like(a)
    return (scaled, zeros(origins), zeros(directions), zeros(z_vals),
            zeros(target))


fused_mse_loss_weights.defvjp(_fmlw_fwd, _fmlw_bwd)
