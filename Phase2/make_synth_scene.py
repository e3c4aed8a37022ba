#!/usr/bin/env python
"""Generate a reference-scale Blender-format dataset by analytic ray tracing.

The reference trains its headline artifact on nerf_synthetic/lego
(800x800, 100 train views; /root/reference/send_turing.sh:19,
/root/reference/Phase2/get_nerf_dataset.sh downloads it from Kaggle).
This container has no network egress, so this script synthesizes a scene of
comparable difficulty — multiple textured objects, a checkered ground disk,
directional lighting with cast shadows, and VIEW-DEPENDENT specular
highlights (exercising the NeRF's direction branch) — at the same
resolution/view-count, in the exact format `io/blender.py` loads
(transforms_{mode}.json + PNGs).

Conventions are matched to the repo's ray math (ops/rays.py, itself parity
with reference Phase2/train.py:68-102): camera-to-world with +z forward,
pixel direction [(x-cx)/fx, (y-cy)/fy, 1] rotated by c2w R then normalized,
and the focal derived from camera_angle_x with the reference's non-standard
formula (io/blender.py:derive_focal) so the generator and the loader agree
exactly.

Usage:
    python Phase2/make_synth_scene.py --out Phase2/nerf_synthetic/synth800 \
        [--size 800] [--n_train 100] [--n_test 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sfm_nerf_tpu.io.blender import derive_focal, look_at_pose  # noqa: E402

CAMERA_ANGLE_X = 0.6911112070083618  # blender-synthetic default FoV

# ---------------------------------------------------------------- scene ----
# All geometry inside |p| <~ 1.6 so the default near/far = 2/6 bounds hold
# for cameras orbiting at radius ~4 (same envelope as nerf_synthetic).

SPHERES = [
    # (center, radius, texture, k_spec, spec_exp)
    (np.array([0.00, -0.35, 0.00]), 0.65, "stripes", 0.25, 64.0),
    (np.array([0.95, -0.62, 0.35]), 0.38, "blue", 0.80, 128.0),
    (np.array([-0.85, -0.55, -0.55]), 0.45, "checker_g", 0.15, 32.0),
    (np.array([-0.15, -0.80, 0.95]), 0.20, "purple", 0.40, 96.0),
    (np.array([0.35, 0.45, -0.60]), 0.30, "yellow", 0.55, 48.0),
]
BOXES = []  # (center, half_extents, texture, k_spec, spec_exp)
GROUND_Y = -1.0
GROUND_R = 2.2
LIGHT = np.array([0.40, 1.00, 0.25])
LIGHT = LIGHT / np.linalg.norm(LIGHT)
AMBIENT = 0.18
BACKGROUND = 0.0   # miss-ray color; set_background('white') -> 1.0 (the
# nerf_synthetic-style white-composited capture — train with --white_bkgd)


def set_background(name: str) -> None:
    global BACKGROUND
    BACKGROUND = {"black": 0.0, "white": 1.0}[name]

# The reference's trained checkpoint families span TWO object classes —
# the multi-object lego scene (checkpoints_tmp/lego/) and the single-object
# chair (Phase2/checkpoints/chair/final_model.pth).  `--scene chair`
# synthesizes the second class: one composite object (axis-aligned boxes +
# a cushion sphere) against an empty background, no ground plane — the
# spatial-sparsity regime (most samples empty) that the multi-sphere scene
# never exercises.
_CHAIR_BOXES = [
    # seat (varnished — strong view-dependent specular)
    (np.array([0.00, -0.20, 0.00]), np.array([0.50, 0.06, 0.48]),
     "wood", 0.50, 96.0),
    # backrest panel
    (np.array([0.00, 0.52, -0.42]), np.array([0.44, 0.48, 0.05]),
     "wood_v", 0.30, 64.0),
    # back posts
    (np.array([-0.47, 0.35, -0.42]), np.array([0.06, 0.70, 0.06]),
     "wood_dark", 0.20, 48.0),
    (np.array([0.47, 0.35, -0.42]), np.array([0.06, 0.70, 0.06]),
     "wood_dark", 0.20, 48.0),
    # legs
    (np.array([-0.42, -0.63, -0.40]), np.array([0.06, 0.37, 0.06]),
     "wood_dark", 0.20, 48.0),
    (np.array([0.42, -0.63, -0.40]), np.array([0.06, 0.37, 0.06]),
     "wood_dark", 0.20, 48.0),
    (np.array([-0.42, -0.63, 0.40]), np.array([0.06, 0.37, 0.06]),
     "wood_dark", 0.20, 48.0),
    (np.array([0.42, -0.63, 0.40]), np.array([0.06, 0.37, 0.06]),
     "wood_dark", 0.20, 48.0),
]
_CHAIR_SPHERES = [
    # cushion on the seat
    (np.array([0.00, -0.02, 0.04]), 0.26, "cushion", 0.10, 24.0),
]


def set_scene(name: str) -> None:
    """Select the scene the module-level tracer renders.  'spheres' keeps
    the original synth800 constants bit-for-bit (regenerability of the
    shipped dataset); 'chair' swaps in the single-object rig and disables
    the ground disk."""
    global SPHERES, BOXES, GROUND_R
    if name == "spheres":
        return
    if name != "chair":
        raise ValueError(f"unknown scene {name!r}")
    s = 1.35  # fill the frame like the real chair; still inside |p| < 1.6
    SPHERES = [(c * s, r * s, tex, ks, ex)
               for c, r, tex, ks, ex in _CHAIR_SPHERES]
    BOXES = [(c * s, h * s, tex, ks, ex)
             for c, h, tex, ks, ex in _CHAIR_BOXES]
    GROUND_R = 0.0  # no ground disk: empty background like the real chair


def _sphere_albedo(tex: str, p: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Procedural per-point albedo (p: (...,3) hit points)."""
    d = p - c
    if tex == "stripes":
        band = (np.floor((np.arctan2(d[..., 2], d[..., 0]) / np.pi) * 6)
                % 2).astype(bool)
        a = np.where(band[..., None],
                     np.array([0.85, 0.20, 0.15]),
                     np.array([0.95, 0.55, 0.10]))
        return a
    if tex == "checker_g":
        u = np.floor(d[..., 0] * 8) + np.floor(d[..., 1] * 8)
        band = (u % 2).astype(bool)
        return np.where(band[..., None],
                        np.array([0.15, 0.70, 0.25]),
                        np.array([0.90, 0.90, 0.85]))
    flat = {
        "blue": np.array([0.15, 0.30, 0.90]),
        "purple": np.array([0.60, 0.20, 0.75]),
        "yellow": np.array([0.95, 0.85, 0.15]),
        "cushion": np.array([0.80, 0.15, 0.18]),
    }[tex]
    return np.broadcast_to(flat, p.shape).copy()


def _box_albedo(tex: str, p: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Wood-grain style procedural albedo for the box primitives."""
    d = p - c
    if tex == "wood":
        # grain bands along x, warm two-tone
        band = (np.floor(d[..., 0] * 14) % 2).astype(bool)
        return np.where(band[..., None],
                        np.array([0.72, 0.48, 0.22]),
                        np.array([0.58, 0.36, 0.15]))
    if tex == "wood_v":
        band = (np.floor(d[..., 1] * 12) % 2).astype(bool)
        return np.where(band[..., None],
                        np.array([0.70, 0.45, 0.20]),
                        np.array([0.55, 0.33, 0.13]))
    if tex == "wood_dark":
        return np.broadcast_to(np.array([0.34, 0.20, 0.10]), p.shape).copy()
    raise ValueError(tex)


def _intersect_boxes(o: np.ndarray, d: np.ndarray, t_min: float = 1e-3):
    """Nearest axis-aligned box hit (slab method).  o,d: (...,3).
    Returns (t, idx) with t=inf on miss."""
    t_best = np.full(o.shape[:-1], np.inf)
    idx = np.full(o.shape[:-1], -1, np.int32)
    inv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    for i, (c, h, *_rest) in enumerate(BOXES):
        ta = (c - h - o) * inv
        tb = (c + h - o) * inv
        t_near = np.max(np.minimum(ta, tb), axis=-1)
        t_far = np.min(np.maximum(ta, tb), axis=-1)
        ok = (t_near <= t_far) & (t_far > t_min)
        t = np.where(t_near > t_min, t_near, t_far)  # inside: exit face
        hit = ok & (t > t_min) & (t < t_best)
        t_best = np.where(hit, t, t_best)
        idx = np.where(hit, i, idx)
    return t_best, idx


def _box_normal(p: np.ndarray, c: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Outward face normal at surface point p of the box (c,h): the axis
    whose normalized coordinate is largest in magnitude."""
    q = (p - c) / h
    ax = np.argmax(np.abs(q), axis=-1)
    n = np.zeros_like(p)
    np.put_along_axis(
        n, ax[..., None], np.sign(np.take_along_axis(q, ax[..., None], -1)),
        axis=-1)
    return n


def _ground_albedo(p: np.ndarray) -> np.ndarray:
    u = np.floor(p[..., 0] / 0.4) + np.floor(p[..., 2] / 0.4)
    band = (u % 2).astype(bool)
    return np.where(band[..., None],
                    np.array([0.72, 0.72, 0.70]),
                    np.array([0.28, 0.28, 0.32]))


def _intersect_spheres(o: np.ndarray, d: np.ndarray, t_min: float = 1e-3):
    """Nearest sphere hit. o,d: (...,3). Returns (t, idx) with t=inf miss."""
    t_best = np.full(o.shape[:-1], np.inf)
    idx = np.full(o.shape[:-1], -1, np.int32)
    for i, (c, r, *_rest) in enumerate(SPHERES):
        oc = o - c
        b = np.einsum("...k,...k->...", oc, d)
        cc = np.einsum("...k,...k->...", oc, oc) - r * r
        disc = b * b - cc        # |d| == 1
        ok = disc > 0
        sq = np.sqrt(np.where(ok, disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = np.where(t0 > t_min, t0, t1)
        hit = ok & (t > t_min) & (t < t_best)
        t_best = np.where(hit, t, t_best)
        idx = np.where(hit, i, idx)
    return t_best, idx


def _shadow(p: np.ndarray) -> np.ndarray:
    """1.0 lit / 0.0 shadowed, spheres + boxes as occluders."""
    d = np.broadcast_to(LIGHT, p.shape)
    t, _ = _intersect_spheres(p, d, t_min=1e-3)
    occluded = np.isfinite(t)
    if BOXES:
        tb, _ = _intersect_boxes(p, d, t_min=1e-3)
        occluded |= np.isfinite(tb)
    return np.where(occluded, 0.0, 1.0)


def trace(o: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Shade a batch of rays. o,d: (N,3) unit dirs. Returns (N,3) in [0,1]."""
    t_s, idx = _intersect_spheres(o, d)
    if BOXES:
        t_b, idx_b = _intersect_boxes(o, d)
    else:
        t_b = np.full(o.shape[:-1], np.inf)
        idx_b = np.full(o.shape[:-1], -1, np.int32)
    # ground disk y == GROUND_Y
    dy = d[..., 1]
    t_g = np.where(np.abs(dy) > 1e-9, (GROUND_Y - o[..., 1]) / dy, np.inf)
    p_g = o + d * t_g[..., None]
    in_disk = (p_g[..., 0] ** 2 + p_g[..., 2] ** 2) < GROUND_R ** 2
    t_g = np.where((t_g > 1e-3) & in_disk, t_g, np.inf)

    ground_first = (t_g < t_s) & (t_g < t_b)
    box_first = ~ground_first & (t_b < t_s)
    t_hit = np.where(ground_first, t_g, np.where(box_first, t_b, t_s))
    hit = np.isfinite(t_hit)
    p = o + d * np.where(hit, t_hit, 0.0)[..., None]

    # normals + albedo
    n = np.zeros_like(p)
    albedo = np.zeros_like(p)
    k_spec = np.zeros(p.shape[:-1])
    s_exp = np.full(p.shape[:-1], 32.0)
    gmask = hit & ground_first
    n[gmask] = np.array([0.0, 1.0, 0.0])
    albedo[gmask] = _ground_albedo(p[gmask])
    k_spec[gmask] = 0.05
    for i, (c, r, tex, ks, ex) in enumerate(SPHERES):
        m = hit & ~ground_first & ~box_first & (idx == i)
        if not m.any():
            continue
        n[m] = (p[m] - c) / r
        albedo[m] = _sphere_albedo(tex, p[m], c)
        k_spec[m] = ks
        s_exp[m] = ex
    for i, (c, h, tex, ks, ex) in enumerate(BOXES):
        m = hit & box_first & (idx_b == i)
        if not m.any():
            continue
        n[m] = _box_normal(p[m], c, h)
        albedo[m] = _box_albedo(tex, p[m], c)
        k_spec[m] = ks
        s_exp[m] = ex

    lit = np.zeros(p.shape[:-1])
    lit[hit] = _shadow(p[hit] + 1e-3 * n[hit])
    lam = np.clip(np.einsum("...k,k->...", n, LIGHT), 0, 1)
    # Blinn-Phong half-vector: view dir is -d
    h = LIGHT - d
    h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
    spec = np.clip(np.einsum("...k,...k->...", n, h), 0, 1) ** s_exp
    rgb = (albedo * (AMBIENT + 0.85 * lam * lit)[..., None]
           + (k_spec * spec * lit)[..., None])
    rgb = np.where(hit[..., None], rgb, BACKGROUND)   # black background: the
    # reference drops alpha from the RGBA lego PNGs (train.py:43), which
    # leaves its GT background black — same effective training target here
    return np.clip(rgb, 0.0, 1.0)


# ------------------------------------------------------------ jax path ----
# The numpy tracer above is the shipped synth800 generator (bit-stable —
# do not touch).  The jax tracer below is the same math expressed as
# where-selects over a stacked primitive axis, jittable, so a full 800^2
# dataset renders on the TPU in seconds instead of hours on this 1-core
# host.  Each scene is generated wholly by ONE backend (self-consistent);
# cross-backend agreement is checked statistically by
# tests/test_synth_scene.py, not bit-for-bit (f32 vs f64 texture-band
# edges may flip individual pixels).

def _trace_jax(o, d):
    import jax.numpy as jnp

    big = jnp.asarray(1e30, jnp.float32)
    t_min = 1e-3
    prims = []   # (t, normal_fn(p), albedo_fn(p), k_spec, s_exp)

    for c, r, tex, ks, ex in SPHERES:
        cj = jnp.asarray(c, jnp.float32)
        oc = o - cj
        b = jnp.sum(oc * d, -1)
        cc = jnp.sum(oc * oc, -1) - r * r
        disc = b * b - cc
        ok = disc > 0
        sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
        t0, t1 = -b - sq, -b + sq
        t = jnp.where(t0 > t_min, t0, t1)
        t = jnp.where(ok & (t > t_min), t, big)
        prims.append((t, ("sphere", cj, r, tex), ks, ex))
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
    for c, h, tex, ks, ex in BOXES:
        cj = jnp.asarray(c, jnp.float32)
        hj = jnp.asarray(h, jnp.float32)
        ta = (cj - hj - o) * inv
        tb = (cj + hj - o) * inv
        t_near = jnp.max(jnp.minimum(ta, tb), -1)
        t_far = jnp.min(jnp.maximum(ta, tb), -1)
        ok = (t_near <= t_far) & (t_far > t_min)
        t = jnp.where(t_near > t_min, t_near, t_far)
        t = jnp.where(ok & (t > t_min), t, big)
        prims.append((t, ("box", cj, hj, tex), ks, ex))
    if GROUND_R > 0:
        dy = d[..., 1]
        t = jnp.where(jnp.abs(dy) > 1e-9, (GROUND_Y - o[..., 1]) / dy, big)
        pg = o + d * t[..., None]
        ok = (t > t_min) & (pg[..., 0] ** 2 + pg[..., 2] ** 2 < GROUND_R ** 2)
        prims.append((jnp.where(ok, t, big), ("ground",), 0.05, 32.0))

    t_all = jnp.stack([p[0] for p in prims], -1)
    idx = jnp.argmin(t_all, -1)
    t_hit = jnp.min(t_all, -1)
    hit = t_hit < 1e29
    p = o + d * jnp.where(hit, t_hit, 0.0)[..., None]

    def sphere_albedo(tex, q, cj, r):
        dd = q - cj
        if tex == "stripes":
            band = (jnp.floor(
                (jnp.arctan2(dd[..., 2], dd[..., 0]) / np.pi) * 6) % 2) >= 1
            return jnp.where(band[..., None],
                             jnp.asarray([0.85, 0.20, 0.15], jnp.float32),
                             jnp.asarray([0.95, 0.55, 0.10], jnp.float32))
        if tex == "checker_g":
            band = ((jnp.floor(dd[..., 0] * 8)
                     + jnp.floor(dd[..., 1] * 8)) % 2) >= 1
            return jnp.where(band[..., None],
                             jnp.asarray([0.15, 0.70, 0.25], jnp.float32),
                             jnp.asarray([0.90, 0.90, 0.85], jnp.float32))
        flat = {"blue": [0.15, 0.30, 0.90], "purple": [0.60, 0.20, 0.75],
                "yellow": [0.95, 0.85, 0.15],
                "cushion": [0.80, 0.15, 0.18]}[tex]
        return jnp.broadcast_to(jnp.asarray(flat, jnp.float32), q.shape)

    def box_albedo(tex, q, cj):
        dd = q - cj
        if tex == "wood":
            band = (jnp.floor(dd[..., 0] * 14) % 2) >= 1
            return jnp.where(band[..., None],
                             jnp.asarray([0.72, 0.48, 0.22], jnp.float32),
                             jnp.asarray([0.58, 0.36, 0.15], jnp.float32))
        if tex == "wood_v":
            band = (jnp.floor(dd[..., 1] * 12) % 2) >= 1
            return jnp.where(band[..., None],
                             jnp.asarray([0.70, 0.45, 0.20], jnp.float32),
                             jnp.asarray([0.55, 0.33, 0.13], jnp.float32))
        return jnp.broadcast_to(
            jnp.asarray([0.34, 0.20, 0.10], jnp.float32), q.shape)

    n = jnp.zeros_like(p)
    albedo = jnp.zeros_like(p)
    k_spec = jnp.zeros(p.shape[:-1], jnp.float32)
    s_exp = jnp.full(p.shape[:-1], 32.0, jnp.float32)
    for i, (_, geom, ks, ex) in enumerate(prims):
        m = (idx == i) & hit
        if geom[0] == "sphere":
            _, cj, r, tex = geom
            ni = (p - cj) / r
            ai = sphere_albedo(tex, p, cj, r)
        elif geom[0] == "box":
            _, cj, hj, tex = geom
            q = (p - cj) / hj
            ax = jnp.argmax(jnp.abs(q), -1)
            ni = jnp.sign(q) * (jnp.arange(3) == ax[..., None])
            ai = box_albedo(tex, p, cj)
        else:
            ni = jnp.broadcast_to(
                jnp.asarray([0.0, 1.0, 0.0], jnp.float32), p.shape)
            u = jnp.floor(p[..., 0] / 0.4) + jnp.floor(p[..., 2] / 0.4)
            band = (u % 2) >= 1
            ai = jnp.where(band[..., None],
                           jnp.asarray([0.72, 0.72, 0.70], jnp.float32),
                           jnp.asarray([0.28, 0.28, 0.32], jnp.float32))
        n = jnp.where(m[..., None], ni, n)
        albedo = jnp.where(m[..., None], ai, albedo)
        k_spec = jnp.where(m, ks, k_spec)
        s_exp = jnp.where(m, ex, s_exp)

    # shadow: any occluder along LIGHT from p + eps*n
    light = jnp.asarray(LIGHT, jnp.float32)
    po = p + 1e-3 * n
    dl = jnp.broadcast_to(light, po.shape)
    occ = jnp.zeros(po.shape[:-1], bool)
    for c, r, *_rest in SPHERES:
        cj = jnp.asarray(c, jnp.float32)
        oc = po - cj
        b = jnp.sum(oc * dl, -1)
        cc = jnp.sum(oc * oc, -1) - r * r
        disc = b * b - cc
        sq = jnp.sqrt(jnp.where(disc > 0, disc, 0.0))
        t0, t1 = -b - sq, -b + sq
        t = jnp.where(t0 > t_min, t0, t1)
        occ |= (disc > 0) & (t > t_min)
    invl = 1.0 / jnp.where(jnp.abs(light) > 1e-12, light, 1e-12)
    for c, h, *_rest in BOXES:
        cj = jnp.asarray(c, jnp.float32)
        hj = jnp.asarray(h, jnp.float32)
        ta = (cj - hj - po) * invl
        tb = (cj + hj - po) * invl
        t_near = jnp.max(jnp.minimum(ta, tb), -1)
        t_far = jnp.min(jnp.maximum(ta, tb), -1)
        occ |= (t_near <= t_far) & (t_far > t_min) \
            & (jnp.where(t_near > t_min, t_near, t_far) > t_min)
    lit = jnp.where(hit & ~occ, 1.0, 0.0)

    lam = jnp.clip(jnp.sum(n * light, -1), 0, 1)
    hvec = light - d
    hvec = hvec / jnp.maximum(
        jnp.linalg.norm(hvec, axis=-1, keepdims=True), 1e-9)
    spec = jnp.clip(jnp.sum(n * hvec, -1), 0, 1) ** s_exp
    rgb = (albedo * (AMBIENT + 0.85 * lam * lit)[..., None]
           + (k_spec * spec * lit)[..., None])
    rgb = jnp.where(hit[..., None], rgb, BACKGROUND)
    return jnp.clip(rgb, 0.0, 1.0)


_JAX_TRACE_CACHE = {}


def _jitted_tracer():
    """Jitted tracer for the CURRENT scene.  _trace_jax reads the scene
    globals at trace time, and jax caches jaxprs by function object — a
    bare jax.jit(_trace_jax) would silently replay the previously-traced
    scene after set_scene() (observed: the chair render reproduced the
    spheres scene).  Key the jit by a scene fingerprint instead."""
    import jax

    key = (
        tuple((tuple(c), float(r), tex, ks, ex)
              for c, r, tex, ks, ex in SPHERES),
        tuple((tuple(c), tuple(h), tex, ks, ex)
              for c, h, tex, ks, ex in BOXES),
        float(GROUND_R),
        float(BACKGROUND),
    )
    if key not in _JAX_TRACE_CACHE:
        scene = (list(SPHERES), list(BOXES), GROUND_R)

        def tr(o, d, _scene=scene):
            return _trace_jax(o, d)

        _JAX_TRACE_CACHE[key] = jax.jit(tr)
    return _JAX_TRACE_CACHE[key]


def render_view_jax(c2w: np.ndarray, size: int):
    """One view through the jax tracer (jit, same program for every view
    of a given size — one compile per dataset)."""
    import jax
    import jax.numpy as jnp

    focal = derive_focal(CAMERA_ANGLE_X, size, "reference")
    cx = cy = size / 2
    ys, xs = np.meshgrid(np.arange(size, dtype=np.float32),
                         np.arange(size, dtype=np.float32), indexing="ij")
    d = np.stack([(xs - cx) / focal, (ys - cy) / focal,
                  np.ones_like(xs)], -1)
    d = d @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d.shape).astype(np.float32)
    img = _jitted_tracer()(
        jnp.asarray(o.reshape(-1, 3)), jnp.asarray(d.reshape(-1, 3), jnp.float32))
    return np.asarray(img, np.float32).reshape(size, size, 3)


def render_view(c2w: np.ndarray, size: int, chunk_rows: int = 64):
    focal = derive_focal(CAMERA_ANGLE_X, size, "reference")
    cx = cy = size / 2
    img = np.zeros((size, size, 3), np.float32)
    for y0 in range(0, size, chunk_rows):
        y1 = min(y0 + chunk_rows, size)
        ys, xs = np.meshgrid(np.arange(y0, y1, dtype=np.float64),
                             np.arange(size, dtype=np.float64), indexing="ij")
        d = np.stack([(xs - cx) / focal, (ys - cy) / focal,
                      np.ones_like(xs)], -1)
        d = d @ c2w[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(c2w[:3, 3], d.shape)
        img[y0:y1] = trace(o.reshape(-1, 3), d.reshape(-1, 3)) \
            .reshape(y1 - y0, size, 3)
    return img


def camera_rig(n_train: int, n_test: int, seed: int = 0):
    """Upper-hemisphere orbits: train views azimuth-uniform with jittered
    elevation/radius, test views on two clean elevation rings offset by a
    half-step in azimuth (never coincident with a train view)."""
    rng = np.random.default_rng(seed)
    views = {"train": [], "test": []}
    for i in range(n_train):
        th = 2 * np.pi * i / n_train + rng.uniform(-0.02, 0.02)
        el = np.deg2rad(rng.uniform(12.0, 48.0))
        r = 4.0 + rng.uniform(-0.15, 0.15)
        eye = np.array([r * np.cos(el) * np.cos(th),
                        r * np.sin(el),
                        r * np.cos(el) * np.sin(th)])
        views["train"].append(look_at_pose(eye, np.array([0.0, -0.2, 0.0])))
    for i in range(n_test):
        th = 2 * np.pi * (i + 0.5) / n_test
        el = np.deg2rad(25.0 if i % 2 == 0 else 38.0)
        eye = np.array([4.0 * np.cos(el) * np.cos(th),
                        4.0 * np.sin(el),
                        4.0 * np.cos(el) * np.sin(th)])
        views["test"].append(look_at_pose(eye, np.array([0.0, -0.2, 0.0])))
    return views


def main():
    import imageio.v2 as imageio

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="Phase2/nerf_synthetic/synth800")
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scene", default="spheres", choices=["spheres", "chair"],
                    help="'spheres' = the shipped multi-object synth800 "
                         "scene; 'chair' = single-object chair-class scene "
                         "(the reference's second checkpoint family)")
    ap.add_argument("--background", default="black",
                    choices=["black", "white"],
                    help="miss-ray color; 'white' matches the standard "
                         "white-composited nerf_synthetic captures (train "
                         "with --white_bkgd)")
    ap.add_argument("--trace_backend", default="numpy",
                    choices=["numpy", "jax"],
                    help="'numpy' is the shipped synth800 path (f64, "
                         "bit-stable); 'jax' runs the same tracer math on "
                         "the accelerator — a full 800^2 dataset in "
                         "seconds instead of hours on a 1-core host")
    args = ap.parse_args()

    set_scene(args.scene)
    set_background(args.background)
    views = camera_rig(args.n_train, args.n_test, args.seed)
    for mode, poses in views.items():
        frames = []
        os.makedirs(os.path.join(args.out, mode), exist_ok=True)
        for i, c2w in enumerate(poses):
            img = (render_view_jax(c2w, args.size)
                   if args.trace_backend == "jax"
                   else render_view(c2w, args.size))
            rel = f"{mode}/r_{i}"
            imageio.imwrite(os.path.join(args.out, rel + ".png"),
                            (img * 255 + 0.5).astype(np.uint8))
            frames.append({"file_path": "./" + rel,
                           "transform_matrix": c2w.tolist()})
            print(f"{mode} {i + 1}/{len(poses)}", flush=True)
        with open(os.path.join(args.out, f"transforms_{mode}.json"), "w") as f:
            json.dump({"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
