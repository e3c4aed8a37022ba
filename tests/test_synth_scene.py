"""Cross-backend agreement of the dataset generator's ray tracers.

Phase2/make_synth_scene.py has two tracer backends: the bit-stable numpy
path that generated the shipped synth800 dataset, and the jax path that
renders a full 800^2 dataset on the accelerator in seconds (this host has
one CPU core — the numpy chair dataset would cost hours).  The two follow
the same math in different precisions (f64 vs f32), so agreement is
statistical, not bit-for-bit: procedural texture bands are floor()
functions whose edges may quantize differently.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_GEN = os.path.join(os.path.dirname(__file__), "..",
                    "Phase2", "make_synth_scene.py")


@pytest.fixture()
def gen():
    spec = importlib.util.spec_from_file_location("_mss_test", _GEN)
    m = importlib.util.module_from_spec(spec)
    saved = sys.argv
    sys.argv = ["make_synth_scene.py"]
    try:
        spec.loader.exec_module(m)
    finally:
        sys.argv = saved
    return m


def _view(gen, scene, size=64):
    from sfm_nerf_tpu.io.blender import look_at_pose

    gen.set_scene(scene)
    eye = np.array([4 * np.cos(np.deg2rad(25.0)),
                    4 * np.sin(np.deg2rad(25.0)), 1.0])
    c2w = look_at_pose(eye, np.array([0.0, -0.2, 0.0]))
    return gen.render_view(c2w, size), gen.render_view_jax(c2w, size)


@pytest.mark.parametrize("scene", ["spheres", "chair"])
def test_jax_tracer_matches_numpy(gen, scene):
    a, b = _view(gen, scene)
    diff = np.abs(a - b)
    # f32-vs-f64 band edges flip individual pixels; the fields must agree
    # everywhere else
    assert (diff > 0.05).mean() < 0.01, (
        f"{scene}: {100 * (diff > 0.05).mean():.2f}% of pixels differ")
    assert np.median(diff) < 1e-3
    # both render SOMETHING (a hit region) and a black background
    assert 0.02 < (a.sum(-1) > 0).mean() < 0.9


def test_white_background_both_backends(gen):
    """--background white (the chair800 capture mode: a dark object on
    black trains into the all-empty optimum, so the shipped chair800 is
    white-composited).  Miss rays must be exactly 1.0 on BOTH backends,
    and set_background must be part of the jax tracer's jit-cache
    fingerprint — a stale cache would replay the black-background scene
    (same failure mode as the scene-switch test below)."""
    a_black, b_black = _view(gen, "chair")
    gen.set_background("white")
    try:
        a, b = _view(gen, "chair")
    finally:
        gen.set_background("black")
    for img, backend in ((a, "numpy"), (b, "jax")):
        corner = img[0, 0]
        assert np.allclose(corner, 1.0), (backend, corner)
        # the object itself still renders (not washed out to all-white)
        assert (img.min(axis=-1) < 0.9).mean() > 0.02, backend
    # background flipped relative to the black render of the same view
    assert np.allclose(a_black[0, 0], 0.0) and np.allclose(b_black[0, 0], 0.0)


def test_jax_tracer_scene_switch_not_cached(gen):
    """set_scene() must invalidate the jitted tracer: jax caches jaxprs by
    function object, and the tracer reads the scene globals at trace time
    — a stale cache replays the previous scene (observed: the chair
    dataset rendered as spheres)."""
    _, spheres_jax = _view(gen, "spheres")
    _, chair_jax = _view(gen, "chair")
    assert np.abs(spheres_jax - chair_jax).max() > 0.1
    a, b = _view(gen, "chair")
    assert (np.abs(a - b) > 0.05).mean() < 0.01
