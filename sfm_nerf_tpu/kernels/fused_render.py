"""Fused NeRF render kernel: sampling -> PE -> MLP -> alpha-composite, one
Pallas program per ray tile, activations resident in VMEM.

Why: per rendered point the MLP moves ~10 (points, 256) activation tensors
through HBM on the XLA path (each fused matmul writes its output back); at
2M points/frame that is tens of GB of HBM traffic against ~2 TFLOP of
compute — bandwidth-bound.  This kernel keeps the whole layer chain for a
(RAY_TILE x SAMPLE_CHUNK) block in VMEM, so HBM sees only rays in, weights
(once, ~1 MB bf16) and rgb out.  The reference's analog is the chunked
Python loop over `model(pts_chunk)` (Phase2/train.py:235-242).

Scope: inference path for BOTH architectures — the active class AND the
legacy Sequential variant every shipped reference .pth serializes
(including the no-positional-encoding ablation) — and both compositor
variants ('train' exclusive / 'legacy' inclusive transmittance), so
converted reference checkpoints render through this kernel.  The TRAINING
kernels (fused_train.py) remain active-arch only.

Layout notes:
- the (2L+1)*3 = 63-wide positional encoding is padded to 64 columns and
  fc1's weight gets a zero row, keeping the first matmul lane-aligned;
- weights are bf16 in VMEM, accumulation f32 (preferred_element_type);
- transmittance is carried across sample chunks in an f32 scratch so chunks
  compose exactly like one full-length cumprod.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sfm_nerf_tpu.config import NeRFModelConfig, RenderConfig

# layer order for the active arch (models/nerf.py nerf_apply); 'densfeat'
# is the pack-time merge of the density (256->1) and feature (256->256)
# heads into one (256, 257) matmul — a lone matvec wastes a full MXU pass
_ACTIVE_LAYERS = (
    "fc1", "fc_0", "fc_1", "fc_2", "fc_3", "skip",
    "fc2_0", "fc2_1", "fc2_2", "densfeat", "rgb1", "rgb2",
)


def _arch_layers(mcfg: NeRFModelConfig):
    """Static (layer_names, body_program, density_act) for an arch.

    ``body_program`` is the hidden-layer sequence between fc1 and the
    density/feature head: ("plain", name) = relu(Linear), ("skip", name) =
    relu(Linear over [h ++ PE(x)]).  The LEGACY arch (what every shipped
    reference .pth serializes — Phase2/NeRFModel.py:7-99) needs no new
    kernel structure: its block2_2 is a (hidden, hidden+1) ReLU layer whose
    channel 0 is the density and channels 1: the feature — EXACTLY the
    packed 'densfeat' layout the active kernel already runs, with relu in
    place of softplus on the density column."""
    if mcfg.arch == "active":
        body = (
            ("plain", "fc_0"), ("plain", "fc_1"), ("plain", "fc_2"),
            ("plain", "fc_3"), ("skip", "skip"),
            ("plain", "fc2_0"), ("plain", "fc2_1"), ("plain", "fc2_2"),
        )
        density_act = "softplus"
    elif mcfg.arch == "legacy":
        body = tuple(
            ("plain", f"block1_{i}") for i in range(mcfg.n_block1_layers)
        )
        if mcfg.has_skip:
            body += (("skip", "skip"),)
        body += (("plain", "block2_0"), ("plain", "block2_1"))
        density_act = "relu"      # post-ReLU channel 0, NeRFModel.py:90
    else:
        raise ValueError(f"fused kernels: unknown arch {mcfg.arch!r}")
    names = ("fc1",) + tuple(n for _, n in body) + ("densfeat", "rgb1", "rgb2")
    return names, body, density_act


def pack_nerf_params(params, mcfg: NeRFModelConfig, dtype=jnp.bfloat16):
    """Flatten a param dict (active OR legacy arch) into the kernels'
    fixed-order tuple of (w, b) pairs, padding the PE-consuming layers'
    input rows by one (the zero pad lane pe_trig_matrices_ext emits):
    fc1 63->64, skip 256+63->+64, rgb1's direction block 27->28 (raw 3->4
    when pos_encoding is off)."""
    names, _, _ = _arch_layers(mcfg)
    packed = []
    for name in names:
        if name == "densfeat":
            if mcfg.arch == "active":
                w = jnp.concatenate(
                    [jnp.asarray(params["density"]["w"]),
                     jnp.asarray(params["feature"]["w"])], axis=1,
                )
                b = jnp.concatenate(
                    [jnp.asarray(params["density"]["b"]),
                     jnp.asarray(params["feature"]["b"])],
                )
            else:
                # legacy block2_2 already IS [density col ++ feature cols]
                w = jnp.asarray(params["block2_2"]["w"])
                b = jnp.asarray(params["block2_2"]["b"])
        else:
            w = jnp.asarray(params[name]["w"])
            b = jnp.asarray(params[name]["b"])
        if name in ("fc1", "skip", "rgb1"):
            w = jnp.pad(w, ((0, 1), (0, 0)))
        packed.append(w.astype(dtype))
        packed.append(b.astype(jnp.float32))
    return tuple(packed)


def pad_sample_axis(z, sample_chunk, tail):
    """Pad the per-ray sample axis to a ``sample_chunk`` multiple so ANY
    n_sample runs through the lane-aligned kernels (the alternative is a
    4x-slower XLA fallback for e.g. --n_sample 192).

    Returns (z_padded, dists_padded, n_sample_real).  Pads duplicate the
    last z (keeps per-ray sortedness AND stays inside fast_sin's
    Cody-Waite phase envelope) and get dists == 0, so for every
    compositor variant alpha = 1 - exp(-sigma*0) == 0 EXACTLY: padded
    samples contribute nothing to rgb/weights/transmittance, and the
    backward's d(alpha)/d(sigma) = dist * exp(...) == 0 kills their
    gradient flow — bit-identical to the unpadded computation.  The last
    REAL sample keeps the reference tail dist (train.py:246-247 1e-3 /
    Wrapper.py:161-162 1.0), which a naive diff over padded z would lose.
    """
    n_real = z.shape[1]
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], tail)], axis=1
    )
    pad_s = (-n_real) % sample_chunk
    if pad_s:
        z = jnp.concatenate(
            [z, jnp.broadcast_to(z[:, -1:], (z.shape[0], pad_s))], axis=1
        )
        dists = jnp.concatenate(
            [dists, jnp.zeros((dists.shape[0], pad_s), dists.dtype)], axis=1
        )
    return z, dists, n_real


def pack_active_params(params, dtype=jnp.bfloat16):
    """pack_nerf_params specialized to the active arch's default config.
    Convenience shim (tests use it); production callers pass their real
    NeRFModelConfig to pack_nerf_params — the kernels support the legacy
    and no-PE layouts too (_arch_layers)."""
    return pack_nerf_params(params, NeRFModelConfig(arch="active"), dtype)


# Cody-Waite split of 2*pi with a 12-bit-mantissa hi: k*hi is EXACT for
# |k| <= 2^12 (phases up to ~25.7k), so (u - k*hi) cancels exactly and the
# reduction error is just the k*lo rounding (~7e-7; a float32(2*pi) hi
# measured 1e-3 at |u|~2e4 from the k*hi rounding alone)
_TWO_PI_HI = np.float32(6.28125)
_TWO_PI_LO = np.float32(0.0019353071795864622)
_INV_TWO_PI = np.float32(0.15915494309189535)
# odd minimax-fit polynomial for sin on [-pi, pi], max |err| 9.6e-8
# (fit: lstsq over odd powers on 20k Chebyshev nodes; see PERFORMANCE.md)
_SIN_C = tuple(
    np.float32(c) for c in (
        0.999999599923587, -0.1666655263540972, 0.008332402988727868,
        -0.0001980863334292709, 2.699714637773227e-06,
        -2.0362244922702406e-08,
    )
)


def fast_sin(u):
    """sin() for PE phases: Cody-Waite range reduction + degree-11 odd
    polynomial, ~3x fewer VPU ops than the lowered jnp.sin (which carries
    a general-range argument-reduction path).  Accuracy: poly error 9.6e-8
    + reduction error O(|k|*6e-15) — orders of magnitude below the f32
    phase quantization the encoding already carries at the top PE
    frequency (ulp(pi*2^L*|x|) ~ 2e-3 rad for L=10, |x|~6).  Kernels-only;
    the XLA paths keep jnp.sin."""
    k = jnp.round(u * _INV_TWO_PI)
    r = (u - k * _TWO_PI_HI) - k * _TWO_PI_LO
    r2 = r * r
    p = _SIN_C[5]
    for c in _SIN_C[4::-1]:
        p = p * r2 + c
    return p * r


def check_fast_sin_envelope(mcfg) -> None:
    """Loud guard for fast_sin's validity range.  The Cody-Waite reduction
    is exact only for |k| <= 2^12, i.e. phases within 2^12 periods; the top
    PE phase is 2^(L-1)*pi*|x|, so positions must satisfy
    |x| <= 2^(14 - n_pos_freq) (16 at the L=10 default — comfortably
    outside any normalized NeRF scene) and unit directions are safe through
    n_dir_freq <= 13.  Beyond that the k*hi product rounds and the
    reduction error jumps from ~7e-7 to 1e-3+ rad SILENTLY — so the
    trainer's envelope checks fall back to XLA's general-range jnp.sin
    first, and this raises for direct kernel callers."""
    if mcfg.n_pos_freq > 10 or mcfg.n_dir_freq > 13:
        raise ValueError(
            f"fused kernels' fast_sin supports n_pos_freq <= 10 / "
            f"n_dir_freq <= 13 (got {mcfg.n_pos_freq}/{mcfg.n_dir_freq}); "
            "use the XLA path for higher PE frequencies"
        )


def tri_inclusive(sample_chunk: int) -> np.ndarray:
    """Inclusive upper-triangular constant for the log-cumsum / suffix-sum
    dots, passed to the kernels as an operand (in-kernel iota builds
    re-materialize per chunk — measured slower)."""
    return np.triu(np.ones((sample_chunk, sample_chunk), np.float32))


def pe_trig_matrices(n_freqs: int):
    """(Fmat (3, 6L), phase (1, 6L)) such that
    sin(x @ Fmat + phase) == concat_l [sin(f_l x), cos(f_l x)] — the whole
    encoding becomes ONE tiny matmul + ONE lane-wide sin.  The naive
    per-frequency build does 2L VPU ops on 3-column tensors (3/128 lane
    utilization — measured to dominate the fused kernel's runtime)."""
    cols = 6 * n_freqs
    F = np.zeros((3, cols), np.float32)
    phase = np.zeros((1, cols), np.float32)
    for c in range(cols):
        l, r = divmod(c, 6)
        j = r % 3
        F[j, c] = np.float32(np.pi * 2.0**l)
        if r >= 3:
            phase[0, c] = np.float32(np.pi / 2)   # cos(u) = sin(u + pi/2)
    return F, phase


def pe_trig_matrices_ext(n_freqs: int):
    """pe_trig_matrices with THREE identity columns prepended: columns 0-2
    of ``x @ Fmat + phase`` reproduce x itself (F[j, j] = 1, phase 0), the
    rest are the sin/cos phases, plus ONE zero pad column (sin(0) = 0)
    matching pack_active_params' 63->64 input-row pad.  A lane select
    (col < 3 keeps the raw phase, else sin) then yields ``[x ++ PE(x) ++ 0]``
    in ONE (M, 4+6L) tensor — exactly the fc1/skip/rgb1 packed weight row
    layout ([identity rows; trig rows; pad row]), so each of those layers
    consumes a SINGLE full/tail-slice dot instead of a K=3 identity dot +
    a K=6L trig dot.  The K=3 dot costs a full MXU pass for 3 rows of
    work; merging removes ~8% of the step kernel's MXU pass volume
    (PERFORMANCE.md round-2 delta)."""
    F, phase = pe_trig_matrices(n_freqs)
    F_ext = np.concatenate(
        [np.eye(3, dtype=np.float32), F, np.zeros((3, 1), np.float32)],
        axis=1)
    phase_ext = np.concatenate(
        [np.zeros((1, 3), np.float32), phase, np.zeros((1, 1), np.float32)],
        axis=1)
    return F_ext, phase_ext


def _make_kernel(
    mcfg: NeRFModelConfig, rcfg: RenderConfig,
    ray_tile: int, sample_chunk: int, n_sample: int, tiles_per_program: int,
    emit_weights: bool = False,
):
    n_chunks = n_sample // sample_chunk
    f32 = jnp.float32

    layer_names, body_program, density_act = _arch_layers(mcfg)
    # trig columns: 6L each, 0 when the PE ablation feeds raw coordinates
    n_pe = 6 * mcfg.n_pos_freq if mcfg.pos_encoding else 0
    n_de = 6 * mcfg.n_dir_freq if mcfg.pos_encoding else 0

    def kernel(
        o_ref, d_ref, z_ref, dists_ref,
        pemat_ref, pephase_ref, dmat_ref, dphase_ref,
        *wb_and_out,
    ):
        if emit_weights:
            *wb, rgb_out, w_out, trans_scr, acc_scr = wb_and_out
        else:
            *wb, rgb_out, trans_scr, acc_scr = wb_and_out
        W = {name: wb[2 * i] for i, name in enumerate(layer_names)}
        B = {name: wb[2 * i + 1] for i, name in enumerate(layer_names)}

        w_dtype = W["fc1"].dtype

        def lin(name, x, out_dtype=None):
            """Matmul in the weights' dtype with f32 accumulation; hidden
            activations stay in the weights' dtype."""
            out = (
                jnp.dot(x.astype(w_dtype), W[name][:],
                        preferred_element_type=f32)
                + B[name][:]
            )
            return out if out_dtype is f32 else out.astype(w_dtype)

        def lin_parts(name, parts, out_dtype=None):
            """Concat-free linear over row-blocks of W:
            [x1 ++ x2 ++ ...] @ W == sum_i x_i @ W[start_i:end_i].
            Avoids materializing concatenated activations (VMEM + Mosaic
            bf16-concat paths)."""
            out = B[name][:].astype(f32)
            for x, s, e in parts:
                out = out + jnp.dot(
                    x.astype(w_dtype), W[name][s:e, :],
                    preferred_element_type=f32,
                )
            return out if out_dtype is f32 else out.astype(w_dtype)

        def ext_encode(x, mat_ref, phase_ref):
            """[x ++ sin(x @ F + phase) ++ 0]: the whole identity+sin/cos
            bank via three broadcasted VPU FMAs + one lane-wide
            transcendental + one lane select (see pe_trig_matrices_ext).
            The K=3 phase contraction is kept OFF the MXU: Mosaic would
            demote it to single-pass bf16, and phase error is amplified by
            frequencies up to pi*2^L (the high-frequency features
            decohere); broadcast FMAs are exact f32.  The identity lanes
            (cols 0-2) bypass the sin, so fc1/skip/rgb1 each consume ONE
            dot over their full [identity; trig; pad] input rows."""
            mat = mat_ref[:]
            u = (x[:, 0:1] * mat[0:1, :] + x[:, 1:2] * mat[1:2, :]
                 + x[:, 2:3] * mat[2:3, :]) + phase_ref[:]
            col = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
            return jnp.where(col < 3, u, fast_sin(u))

        def subtile_body(s, _):
            # each program streams ``tiles_per_program`` ray sub-tiles
            # through the SAME activation buffers — amortizes the fixed
            # per-grid-step cost (sublane slices: s*ray_tile % 8 == 0)
            row0 = pl.multiple_of(s * ray_tile, 8)
            o = o_ref[pl.ds(row0, ray_tile), :]        # (T, 3)
            d = d_ref[pl.ds(row0, ray_tile), :]
            extd = ext_encode(d, dmat_ref, dphase_ref)   # (T, 4 + n_de)

            trans_scr[:] = jnp.ones_like(trans_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

            def chunk_body(c, _):
                # lane-dim dynamic slices must be provably 128-aligned —
                # sample_chunk is a multiple of 128, start tagged
                start = pl.multiple_of(c * sample_chunk, 128)
                z = z_ref[pl.ds(row0, ray_tile), pl.ds(start, sample_chunk)]
                # dists precomputed host-side (diff + the reference's 1e-3
                # tail pad) — avoids a +1-shifted (misaligned) slice
                dists = dists_ref[
                    pl.ds(row0, ray_tile), pl.ds(start, sample_chunk)
                ]

                pts = (o[:, None, :] + d[:, None, :] * z[..., None])
                pts = pts.reshape(-1, 3)                        # (T*CH, 3)
                ext = ext_encode(pts, pemat_ref, pephase_ref)  # (T*CH, 4+n_pe)

                # fc1/skip consume [x(3) ++ trig(n_pe) ++ pad] row-blocks,
                # exactly ext's lane layout — one dot each
                h = jnp.maximum(lin("fc1", ext), 0.0)
                hidden = h.shape[-1]
                for kind, name in body_program:
                    if kind == "plain":
                        h = jnp.maximum(lin(name, h), 0.0)
                    else:  # skip-concat, concat-free via row-block dots
                        h = jnp.maximum(
                            lin_parts(name, [
                                (h, 0, hidden),
                                (ext, hidden, hidden + 4 + n_pe),
                            ]),
                            0.0,
                        )
                # merged density+feature head: pack-time concat for the
                # active arch; the legacy block2_2 ships in this layout
                df = lin("densfeat", h, f32)
                if density_act == "softplus":
                    density = jax.nn.softplus(df[:, :1])
                else:                         # legacy: post-ReLU channel 0
                    density = jnp.maximum(df[:, :1], 0.0)
                feat = jnp.maximum(df[:, 1:], 0.0).astype(w_dtype)
                # direction head: per-RAY partial matmuls broadcast over
                # samples — sample_chunk x fewer dir FLOPs, no repeat
                dir_part = jnp.dot(
                    extd.astype(w_dtype),
                    W["rgb1"][hidden:hidden + 4 + n_de, :],
                    preferred_element_type=f32,
                )                                               # (T, 128)
                feat_part = jnp.dot(
                    feat, W["rgb1"][:hidden, :],
                    preferred_element_type=f32,
                )                                               # (T*CH, 128)
                rgb_h = (
                    feat_part.reshape(ray_tile, sample_chunk, -1)
                    + dir_part[:, None, :]
                    + B["rgb1"][:]
                ).reshape(ray_tile * sample_chunk, -1)
                rgb_h = jnp.maximum(rgb_h, 0.0).astype(w_dtype)
                rgb = jax.nn.sigmoid(lin("rgb2", rgb_h, f32))   # (T*CH, 3)

                dens = density.reshape(ray_tile, sample_chunk)
                x = dens * dists
                alpha = 1.0 - jnp.exp(-x)                       # (T, CH)
                # exclusive cumprod within chunk, carried across chunks.
                # Mosaic has no cumprod lowering -> log-space cumulative sum
                # via a triangular-ones matmul (CHxCH, runs on the MXU).
                # log(one_m) == log(exp(-x)+1e-10) == -x up to 1e-10*e^x
                # absolute (saturated samples carry ~0 transmittance): one
                # log fewer and the tri-dot no longer waits on the exp
                log1m = -x                                      # (T, CH)
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (sample_chunk, sample_chunk), 0)
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (sample_chunk, sample_chunk), 1)
                tri = (rows <= cols).astype(f32)                # inclusive
                # HIGHEST: |log T| reaches ~23, where single-pass bf16
                # loses ABSOLUTE precision that exp() then amplifies; this
                # per-ray-rows dot is negligible next to the MLP matmuls
                csum = jnp.dot(log1m, tri, preferred_element_type=f32,
                               precision=jax.lax.Precision.HIGHEST)
                cum = jnp.exp(csum)                             # incl cumprod
                # 'train' variant: exclusive transmittance (train.py:261-263)
                # 'legacy': inclusive (Wrapper.py:175-176 off-by-one kept)
                trans = (
                    jnp.exp(csum - log1m) if rcfg.variant == "train" else cum
                )
                T_in = trans_scr[:]                             # (T, 1)
                w = alpha * (T_in * trans)                      # (T, CH)
                if emit_weights:
                    # per-sample compositing weights (what sample_pdf /
                    # weight_maps consume) — matches composite()'s weights
                    # output for the active variant
                    w_out[
                        pl.ds(row0, ray_tile), pl.ds(start, sample_chunk)
                    ] = w
                rgb3 = rgb.reshape(ray_tile, sample_chunk, 3)
                acc_scr[:] = acc_scr[:] + jnp.sum(w[..., None] * rgb3, axis=1)
                trans_scr[:] = T_in * cum[:, -1:]
                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
            out = acc_scr[:]
            if rcfg.white_background:
                # train-variant telescoping: acc == 1 - T_final (up to the
                # 1e-10 epsilon), so composite's (1-acc) term == T_final
                out = out + trans_scr[:]
            rgb_out[pl.ds(row0, ray_tile), :] = out
            return 0

        jax.lax.fori_loop(0, tiles_per_program, subtile_body, 0)

    return kernel


def _fused_render_impl(
    packed_params, origins, directions, z_vals, mcfg, rcfg,
    ray_tile, sample_chunk, tiles_per_program, interpret, emit_weights,
):
    n = origins.shape[0]
    if not interpret:
        assert sample_chunk % 128 == 0, "TPU lane alignment"
    if rcfg.white_background and rcfg.variant != "train":
        raise NotImplementedError(
            "fused kernel white_background relies on the train variant's "
            "weight telescoping (acc == 1 - T_final); the legacy inclusive "
            "weights don't telescope — use the XLA path"
        )
    # sample-axis pad first (zero-dist duplicates: exact no-ops, see
    # pad_sample_axis), then the ray-axis pad to the grid block
    tail = 1e-3 if rcfg.variant == "train" else 1.0
    z_vals, dists, n_sample_real = pad_sample_axis(z_vals, sample_chunk, tail)
    n_sample = z_vals.shape[1]
    block = ray_tile * tiles_per_program
    n_progs = (n + block - 1) // block
    pad = n_progs * block - n
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=1.0)
    z = jnp.pad(z_vals, ((0, pad), (0, 0)), constant_values=1.0)
    dists = jnp.pad(dists, ((0, pad), (0, 0)))

    if mcfg.pos_encoding:
        check_fast_sin_envelope(mcfg)
        pe_mat, pe_phase = pe_trig_matrices_ext(mcfg.n_pos_freq)
        d_mat, d_phase = pe_trig_matrices_ext(mcfg.n_dir_freq)
    else:
        # PE ablation (reference checkpoints_no_pos_encoding): zero trig
        # columns — ext degenerates to [x ++ pad], the fc1/rgb1 packed
        # weights carry the matching 3->4 input-row pad
        pe_mat, pe_phase = pe_trig_matrices_ext(0)
        d_mat, d_phase = pe_trig_matrices_ext(0)

    kernel = _make_kernel(
        mcfg, rcfg, ray_tile, sample_chunk, n_sample, tiles_per_program,
        emit_weights,
    )
    full_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    wb_specs = [full_vmem for _ in packed_params]
    rgb_spec = pl.BlockSpec((block, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    rgb_shape = jax.ShapeDtypeStruct((n_progs * block, 3), jnp.float32)
    if emit_weights:
        out_specs = [
            rgb_spec,
            pl.BlockSpec((block, n_sample), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            rgb_shape,
            jax.ShapeDtypeStruct((n_progs * block, n_sample), jnp.float32),
        ]
    else:
        out_specs, out_shape = rgb_spec, rgb_shape
    out = pl.pallas_call(
        kernel,
        grid=(n_progs,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n_sample), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n_sample), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full_vmem, full_vmem, full_vmem, full_vmem,  # trig matrices
            *wb_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ray_tile, 1), jnp.float32),   # carried transmittance
            pltpu.VMEM((ray_tile, 3), jnp.float32),   # rgb accumulator
        ],
        interpret=interpret,
    )(
        o, d, z, dists,
        jnp.asarray(pe_mat), jnp.asarray(pe_phase),
        jnp.asarray(d_mat), jnp.asarray(d_phase),
        *packed_params,
    )
    if emit_weights:
        # padded sample columns carry exactly-zero weights; trim them so
        # consumers (sample_pdf mids over the CALLER's z) see the real width
        return out[0][:n], out[1][:n, :n_sample_real]
    return out[:n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "mcfg", "rcfg", "ray_tile", "sample_chunk", "tiles_per_program",
        "interpret",
    ),
)
def fused_render_rays(
    packed_params: Tuple[jnp.ndarray, ...],
    origins: jnp.ndarray,      # (N, 3) f32
    directions: jnp.ndarray,   # (N, 3) f32
    z_vals: jnp.ndarray,       # (N, S) f32
    mcfg: NeRFModelConfig,
    rcfg: RenderConfig,
    ray_tile: int = 32,
    sample_chunk: int = 128,
    tiles_per_program: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Render rgb (N,3) with the fused kernel.  N padded to the program size
    (ray_tile * tiles_per_program rays per grid step).

    ``sample_chunk`` must be a multiple of 128 on real TPU (lane-aligned
    dynamic slicing); interpret mode accepts smaller chunks for testing.
    ``tiles_per_program`` streams that many ray sub-tiles through one grid
    step's buffers — the per-program fixed cost dominated at 1 (measured
    2.03 s vs XLA's 0.816 s at 5000 programs for a 400^2 frame).
    """
    return _fused_render_impl(
        packed_params, origins, directions, z_vals, mcfg, rcfg,
        ray_tile, sample_chunk, tiles_per_program, interpret, False,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mcfg", "rcfg", "ray_tile", "sample_chunk", "tiles_per_program",
        "interpret",
    ),
)
def fused_render_rays_weights(
    packed_params: Tuple[jnp.ndarray, ...],
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    z_vals: jnp.ndarray,
    mcfg: NeRFModelConfig,
    rcfg: RenderConfig,
    ray_tile: int = 32,
    sample_chunk: int = 128,
    tiles_per_program: int = 16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fused_render_rays that ALSO returns the per-sample compositing
    weights (N, S) — the inputs to sample_pdf (hierarchical inference's
    coarse pass) and weight_maps (depth/disparity/acc eval maps), so those
    consumers run fused instead of falling back to XLA.  Weights carry no
    backward (inference path; training uses fused_train.py's kernels)."""
    return _fused_render_impl(
        packed_params, origins, directions, z_vals, mcfg, rcfg,
        ray_tile, sample_chunk, tiles_per_program, interpret, True,
    )
