"""Stratified sampling + volume rendering (alpha compositing).

Two documented variants matching the reference's two renderers (SURVEY §7d):

- ``variant='train'`` (Phase2/train.py:187-271, the live/default path):
    t in midpoint-jittered linspace(0,1,S) bins; z = near+(far-near)t;
    dists = diff(z) with 1e-3 appended;
    alpha = 1-exp(-sigma*dist);
    EXCLUSIVE transmittance T[:,1:] = cumprod(1-alpha+1e-10)[:, :-1].
- ``variant='legacy'`` (Phase2/Wrapper.py:129-186, the gif path):
    z = near+(far-near)*(i+u)/S per-bin jitter;
    dists = diff(z) with 1.0 appended;
    NON-shifted weights w = alpha*cumprod(1-alpha+1e-10) (off-by-one vs above).

The whole pipeline — sampling, point expansion, MLP evaluation, compositing —
is one traced function: XLA fuses the elementwise stages into the MLP matmuls
and there is no Python chunk loop (the reference's ``chunk_size`` loop,
train.py:235-242, exists only to bound torch memory; under jit we instead give
XLA the full (rays*samples, feat) batch which it tiles onto the MXU).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from sfm_nerf_tpu.config import RenderConfig


def stratified_samples(
    key: Optional[jax.Array],
    n_rays: int,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """Depth values z (n_rays, n_sample) along each ray."""
    S = cfg.n_sample

    def to_depth(t):
        if cfg.lindisp:
            # linear in inverse depth (vanilla NeRF's real-scene sampling;
            # no reference analog — see RenderConfig.lindisp): equal-count
            # bins per depth OCTAVE instead of per metre.
            if cfg.near <= 0:
                raise ValueError("lindisp requires near > 0")
            return 1.0 / (1.0 / cfg.near * (1.0 - t) + 1.0 / cfg.far * t)
        return cfg.near + (cfg.far - cfg.near) * t

    if cfg.variant == "legacy":
        idx = jnp.arange(S, dtype=jnp.float32)[None, :]
        if cfg.perturb and key is not None:
            u = jax.random.uniform(key, (n_rays, S))
        else:
            u = jnp.full((n_rays, S), 0.5)
        return to_depth((idx + u) / S)

    t = jnp.linspace(0.0, 1.0, S)[None, :].repeat(n_rays, axis=0)
    if cfg.perturb and key is not None:
        mids = 0.5 * (t[..., 1:] + t[..., :-1])
        upper = jnp.concatenate([mids, t[..., -1:]], -1)
        lower = jnp.concatenate([t[..., :1], mids], -1)
        u = jax.random.uniform(key, t.shape)
        t = lower + (upper - lower) * u
    return to_depth(t)


def composite(
    density: jnp.ndarray,   # (N, S, 1)
    rgb: jnp.ndarray,       # (N, S, 3)
    z_vals: jnp.ndarray,    # (N, S)
    cfg: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Alpha-composite samples into per-ray RGB.

    Returns (rgb[N,3], weights[N,S], acc[N]) — the reference returns only rgb
    (no depth/acc maps, train.py:248-271); weights/acc are exposed for
    hierarchical sampling and diagnostics.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    pad = 1e-3 if cfg.variant == "train" else 1.0
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], pad)], -1)
    alpha = 1.0 - jnp.exp(-density[..., 0] * dists)          # (N, S)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    if cfg.variant == "train":
        # exclusive transmittance (train.py:261-263)
        trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    weights = alpha * trans                                   # (N, S)
    out = jnp.sum(weights[..., None] * rgb, axis=-2)          # (N, 3)
    acc = jnp.sum(weights, axis=-1)
    if cfg.white_background:
        out = out + (1.0 - acc[..., None])
    return out, weights, acc


def render_rays(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    origins: jnp.ndarray,     # (N, 3)
    directions: jnp.ndarray,  # (N, 3)
    cfg: RenderConfig,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Full render: sample -> evaluate model -> composite.  Returns rgb (N,3).

    ``model_fn(points[N,S,3], dirs[N,S,3]) -> (density[N,S,1], rgb[N,S,3])``.
    """
    n_rays = origins.shape[0]
    z_vals = stratified_samples(key, n_rays, cfg)                  # (N, S)
    pts = origins[:, None, :] + directions[:, None, :] * z_vals[..., None]
    dirs = jnp.broadcast_to(directions[:, None, :], pts.shape)
    density, rgb = model_fn(pts, dirs)
    out, _, _ = composite(density, rgb, z_vals, cfg)
    return out


def weight_maps(
    weights: jnp.ndarray,   # (N, S)
    z_vals: jnp.ndarray,    # (N, S)
    acc: jnp.ndarray,       # (N,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard NeRF auxiliary maps from compositing weights.

    Returns (depth[N], disparity[N]): depth = sum(w*z) (expected
    termination depth, un-normalized as in vanilla NeRF), disparity =
    1 / max(eps, depth/acc).  The reference computes neither
    (train.py:248-271 returns rgb only) — ADDITION for eval/diagnostics.
    """
    depth = jnp.sum(weights * z_vals, axis=-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
    return depth, disp


def render_rays_aux(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    origins: jnp.ndarray,     # (N, 3)
    directions: jnp.ndarray,  # (N, 3)
    cfg: RenderConfig,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """render_rays variant returning (rgb[N,3], depth[N], disp[N], acc[N])."""
    n_rays = origins.shape[0]
    z_vals = stratified_samples(key, n_rays, cfg)
    pts = origins[:, None, :] + directions[:, None, :] * z_vals[..., None]
    dirs = jnp.broadcast_to(directions[:, None, :], pts.shape)
    density, rgb = model_fn(pts, dirs)
    out, weights, acc = composite(density, rgb, z_vals, cfg)
    depth, disp = weight_maps(weights, z_vals, acc)
    return out, depth, disp, acc


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,        # (N, S-1) bin edges (z midpoints)
    weights: jnp.ndarray,     # (N, S-2) coarse weights over interior bins
    n_importance: int,
) -> jnp.ndarray:
    """Inverse-CDF importance sampling over the coarse weight histogram.

    The reference never implements hierarchical sampling (its BASELINE
    config names it; the code has only the uniform stratified sampler) —
    this is the standard NeRF fine-sampling op, fully batched and
    gather-free (see the in-body note — TPU gathers serialize).
    Returns (N, n_importance) z values, sorted ascending per ray: the
    random ``u`` draw is STRATIFIED per slot (u_i in [i/NI, (i+1)/NI)),
    so the inverse-CDF outputs are non-decreasing by construction —
    lower-variance than iid draws AND it lets the coarse+fine union be a
    :func:`merge_sorted` (9 roll/min/max stages) instead of a full
    jnp.sort over S+I lanes.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (N, S-1)

    if key is not None:
        u = (
            jnp.arange(n_importance, dtype=cdf.dtype)
            + jax.random.uniform(key, (cdf.shape[0], n_importance),
                                 dtype=cdf.dtype)
        ) / n_importance
    else:
        u = jnp.linspace(0.0, 1.0 - 1e-5, n_importance)[None, :].repeat(
            cdf.shape[0], axis=0
        )
    # Interval lookup WITHOUT searchsorted/take_along_axis: the vmapped
    # searchsorted + 4 gathers measured 55 ms for a (4096, 128) draw on
    # v5e — TPU gathers serialize — while cdf and bins are both MONOTONE,
    # so the searchsorted(side='right') neighbors are masked max/min
    # reductions over one broadcast compare, which XLA fuses into a
    # single sub-ms pass (selected values are bit-identical to the
    # gathered ones).  below = last s with cdf[s] <= u (always exists:
    # cdf[0] = 0); above = first s with cdf[s] > u (clip: last bin).
    # the gather formulation indexed bins with cdf-range indices clipped
    # into bins' own range — equivalent to aligning bins to cdf's length
    Sc = cdf.shape[-1]
    if bins.shape[-1] >= Sc:
        bins = bins[..., :Sc]
    else:
        bins = jnp.concatenate(
            [bins, jnp.repeat(bins[..., -1:], Sc - bins.shape[-1], -1)], -1)
    le = cdf[..., None, :] <= u[..., :, None]         # (N, NI, S-1)
    big = jnp.asarray(jnp.inf, cdf.dtype)
    cdf_below = jnp.max(jnp.where(le, cdf[..., None, :], -big), -1)
    cdf_above = jnp.min(jnp.where(le, big, cdf[..., None, :]), -1)
    cdf_above = jnp.where(jnp.isfinite(cdf_above), cdf_above, cdf[..., -1:])
    bins_b = jnp.max(jnp.where(le, bins[..., None, :], -big), -1)
    bins_a = jnp.min(jnp.where(le, big, bins[..., None, :]), -1)
    bins_a = jnp.where(jnp.isfinite(bins_a), bins_a, bins[..., -1:])
    denom = jnp.where(cdf_above - cdf_below < 1e-5, 1.0, cdf_above - cdf_below)
    t = (u - cdf_below) / denom
    return bins_b + t * (bins_a - bins_b)


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-row ASCENDING arrays along the last dim: (N,A),(N,B)
    -> (N,A+B) ascending, elementwise equal to
    ``jnp.sort(concatenate([a, b], -1), -1)``.

    concat(a, reverse(b padded with +inf)) is a bitonic sequence, so a
    bitonic MERGE — log2(P) compare-exchange stages of jnp.roll +
    min/max/where, no gathers — sorts it.  jnp.sort's general bitonic
    network is ~log^2(P)/2 such stages: at the hierarchical union size
    (256+128 -> P=512, 9 stages vs ~45) this replaces the measured
    ~4.6 ms (4096, 384) sort in the coarse->fine middle.
    """
    n = a.shape[-1] + b.shape[-1]
    P = 1 << max(1, (n - 1).bit_length())     # next power of two
    big = jnp.asarray(jnp.inf, a.dtype)
    bp = jnp.concatenate(
        [b.astype(a.dtype),
         jnp.full((*b.shape[:-1], P - n), big, a.dtype)], -1)
    x = jnp.concatenate([a, bp[..., ::-1]], -1)          # bitonic (N, P)
    col = jnp.arange(P)
    s = P // 2
    while s >= 1:
        # partner of i is i XOR s; pairs stay inside aligned 2s blocks, so
        # the circular rolls never wrap a used position
        upper = (col & s) != 0
        partner = jnp.where(upper, jnp.roll(x, s, -1), jnp.roll(x, -s, -1))
        x = jnp.where(upper, jnp.maximum(x, partner), jnp.minimum(x, partner))
        s //= 2
    return x[..., :n]


def render_rays_hierarchical(
    coarse_fn,
    fine_fn,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: RenderConfig,
    n_importance: int,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-pass coarse/fine render (vanilla-NeRF hierarchical sampling).

    Returns (rgb_fine, rgb_coarse).  ``coarse_fn``/``fine_fn`` may be the
    same model.  Fine pass evaluates the union of coarse + importance
    samples, sorted per ray.
    """
    out_f, out_c, _, _, _ = _hierarchical_body(
        coarse_fn, fine_fn, origins, directions, cfg, n_importance, key
    )
    return out_f, out_c


def _hierarchical_body(
    coarse_fn, fine_fn, origins, directions, cfg, n_importance, key
):
    """Shared coarse/fine pass; returns (rgb_f, rgb_c, weights_f, z_all, acc_f)."""
    n_rays = origins.shape[0]
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)
    z_coarse = stratified_samples(k1, n_rays, cfg)                  # (N, S)
    pts = origins[:, None, :] + directions[:, None, :] * z_coarse[..., None]
    dirs = jnp.broadcast_to(directions[:, None, :], pts.shape)
    density_c, rgb_c = coarse_fn(pts, dirs)
    out_c, weights, _ = composite(density_c, rgb_c, z_coarse, cfg)

    mids = 0.5 * (z_coarse[..., 1:] + z_coarse[..., :-1])           # (N, S-1)
    # weights DETACHED into the importance sampler (vanilla-NeRF semantics:
    # the coarse model learns only from its own MSE, not through z_fine;
    # also keeps this path gradient-equivalent to the fused hierarchical
    # kernel, whose weights output has no backward)
    z_fine = sample_pdf(
        k2, mids, jax.lax.stop_gradient(weights[..., 1:-1]), n_importance)
    z_all = merge_sorted(z_coarse, z_fine)                          # (N, S+I)
    pts = origins[:, None, :] + directions[:, None, :] * z_all[..., None]
    dirs = jnp.broadcast_to(directions[:, None, :], pts.shape)
    density_f, rgb_f = fine_fn(pts, dirs)
    out_f, weights_f, acc_f = composite(density_f, rgb_f, z_all, cfg)
    return out_f, out_c, weights_f, z_all, acc_f


def render_rays_hierarchical_aux(
    coarse_fn,
    fine_fn,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: RenderConfig,
    n_importance: int,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hierarchical render with fine-pass aux maps:
    returns (rgb_fine[N,3], depth[N], disp[N], acc[N])."""
    out_f, _, weights_f, z_all, acc_f = _hierarchical_body(
        coarse_fn, fine_fn, origins, directions, cfg, n_importance, key
    )
    depth, disp = weight_maps(weights_f, z_all, acc_f)
    return out_f, depth, disp, acc_f


def render_rays_hierarchical_chunked_aux(
    coarse_fn,
    fine_fn,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: RenderConfig,
    n_importance: int,
    key: Optional[jax.Array] = None,
    chunk_rays: int = 2048,
):
    """render_rays_hierarchical_chunked with auxiliary maps: returns flat
    (rgb (N,3), depth (N,), disp (N,), acc (N,)) — the hierarchical
    sibling of render_rays_chunked_aux (it used to live inline in the
    trainer's aux renderer, diverging from these helpers' padding)."""
    n_rays = origins.shape[0]
    n_chunks = (n_rays + chunk_rays - 1) // chunk_rays
    o, d = _chunk_rays(origins, directions, chunk_rays)

    def body(args):
        if key is not None:
            oc, dc, kc = args
        else:
            oc, dc = args
            kc = None
        return render_rays_hierarchical_aux(
            coarse_fn, fine_fn, oc, dc, cfg, n_importance, kc
        )

    if key is not None:
        keys = jax.random.split(key, n_chunks)
        rgb, depth, disp, acc = jax.lax.map(body, (o, d, keys))
    else:
        rgb, depth, disp, acc = jax.lax.map(body, (o, d))
    flat = n_chunks * chunk_rays
    return (
        rgb.reshape(flat, 3)[:n_rays],
        depth.reshape(flat)[:n_rays],
        disp.reshape(flat)[:n_rays],
        acc.reshape(flat)[:n_rays],
    )


def render_rays_hierarchical_chunked(
    coarse_fn,
    fine_fn,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: RenderConfig,
    n_importance: int,
    key: Optional[jax.Array] = None,
    chunk_rays: int = 2048,
) -> jnp.ndarray:
    """Full-frame hierarchical render in fixed-shape ray chunks (lax.map),
    mirroring render_rays_chunked's HBM-bounding strategy.  Returns the
    fine-pass rgb."""
    n_rays = origins.shape[0]
    n_chunks = (n_rays + chunk_rays - 1) // chunk_rays
    o, d = _chunk_rays(origins, directions, chunk_rays)

    def body(args):
        if key is not None:
            oc, dc, kc = args
        else:
            oc, dc = args
            kc = None
        rgb_f, _ = render_rays_hierarchical(
            coarse_fn, fine_fn, oc, dc, cfg, n_importance, kc
        )
        return rgb_f

    if key is not None:
        keys = jax.random.split(key, n_chunks)
        out = jax.lax.map(body, (o, d, keys))
    else:
        out = jax.lax.map(body, (o, d))
    return out.reshape(n_chunks * chunk_rays, 3)[:n_rays]


def _chunk_rays(origins, directions, chunk_rays):
    """Pad + reshape (N,3) rays to (n_chunks, chunk_rays, 3) for lax.map."""
    n_rays = origins.shape[0]
    n_chunks = (n_rays + chunk_rays - 1) // chunk_rays
    pad = n_chunks * chunk_rays - n_rays
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    # pad directions with unit z so normalization math stays finite
    d = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=0.0)
    d = d.at[n_rays:, 2].set(1.0) if pad else d
    return o.reshape(n_chunks, chunk_rays, 3), d.reshape(n_chunks, chunk_rays, 3)


def render_rays_chunked(
    model_fn,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: RenderConfig,
    key: Optional[jax.Array] = None,
    chunk_rays: int = 2048,
) -> jnp.ndarray:
    """Full-frame render in fixed-shape ray chunks via ``lax.map``.

    One fused launch over all H*W rays overflows HBM: the live
    (rays, samples, hidden) activation set is ~(N*S*257*4B) twice over —
    7+ GB at 200^2 x 192 on a 16 GB chip (measured).  The reference bounds the
    same blow-up with a Python ``chunk_size`` loop (train.py:235-242); here the
    chunk loop is a single compiled ``lax.map`` over a static (chunks, C, 3)
    reshape, so there is exactly one compilation and no host round-trips.
    At 2048 rays x 256 samples the per-chunk activations are ~540 MB.
    """
    n_rays = origins.shape[0]
    o, d = _chunk_rays(origins, directions, chunk_rays)
    n_chunks = o.shape[0]
    if key is not None:
        keys = jax.random.split(key, n_chunks)
        out = jax.lax.map(
            lambda args: render_rays(model_fn, args[0], args[1], cfg, args[2]),
            (o, d, keys),
        )
    else:
        out = jax.lax.map(
            lambda args: render_rays(model_fn, args[0], args[1], cfg, None),
            (o, d),
        )
    return out.reshape(n_chunks * chunk_rays, 3)[:n_rays]


def render_rays_chunked_aux(
    model_fn,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: RenderConfig,
    key: Optional[jax.Array] = None,
    chunk_rays: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Chunked full-frame render with aux maps: returns
    (rgb[N,3], depth[N], disp[N], acc[N]).  Same HBM-bounding lax.map
    strategy as :func:`render_rays_chunked`."""
    n_rays = origins.shape[0]
    o, d = _chunk_rays(origins, directions, chunk_rays)
    n_chunks = o.shape[0]

    def body(args):
        if key is not None:
            oc, dc, kc = args
        else:
            oc, dc = args
            kc = None
        return render_rays_aux(model_fn, oc, dc, cfg, kc)

    if key is not None:
        keys = jax.random.split(key, n_chunks)
        rgb, depth, disp, acc = jax.lax.map(body, (o, d, keys))
    else:
        rgb, depth, disp, acc = jax.lax.map(body, (o, d))
    flat = n_chunks * chunk_rays
    return (
        rgb.reshape(flat, 3)[:n_rays],
        depth.reshape(flat)[:n_rays],
        disp.reshape(flat)[:n_rays],
        acc.reshape(flat)[:n_rays],
    )
