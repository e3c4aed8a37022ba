"""Hierarchical sampling: importance samples concentrate where coarse
weights are; fine render matches plain render when weights are uniform."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.config import RenderConfig
from sfm_nerf_tpu.ops.render import (
    render_rays_hierarchical,
    sample_pdf,
)


def test_sample_pdf_concentrates_on_peak():
    n, s = 8, 64
    bins = jnp.linspace(2.0, 6.0, s - 1)[None].repeat(n, 0)
    w = np.full((n, s - 2), 1e-4, np.float32)
    w[:, 30:34] = 10.0                       # sharp peak near z ~ 4
    z = np.asarray(sample_pdf(jax.random.key(0), bins, jnp.asarray(w), 128))
    assert z.shape == (n, 128)
    frac_near_peak = ((z > 3.7) & (z < 4.4)).mean()
    assert frac_near_peak > 0.9, frac_near_peak


def test_sample_pdf_deterministic_mode():
    bins = jnp.linspace(0.0, 1.0, 9)[None]
    w = jnp.ones((1, 7))
    z = np.asarray(sample_pdf(None, bins, w, 16))
    assert (np.diff(z[0]) >= -1e-6).all()    # monotone under linspace u
    assert z.min() >= 0.0 and z.max() <= 1.0


def test_hierarchical_render_runs_and_improves_peak_capture():
    """A density spike narrower than the coarse spacing: fine pass must see
    it with many more samples than the coarse pass alone."""
    cfg = RenderConfig(n_sample=32, near=2.0, far=6.0, perturb=False)

    hits = {"coarse": 0, "fine": 0}

    def model(pts, dirs, tag):
        z = jnp.linalg.norm(pts, axis=-1)
        # thin shell at radius 4.0 (width 0.02)
        density = 50.0 * jnp.exp(-((z - 4.0) / 0.02) ** 2)[..., None]
        rgb = jnp.ones_like(pts) * 0.5
        hits[tag] = int(np.sum(np.abs(np.asarray(z) - 4.0) < 0.03))
        return density, rgb

    o = jnp.zeros((16, 3))
    d = np.zeros((16, 3), np.float32)
    d[:, 2] = 1.0
    d = jnp.asarray(d)
    out_f, out_c = render_rays_hierarchical(
        lambda p, dd: model(p, dd, "coarse"),
        lambda p, dd: model(p, dd, "fine"),
        o, d, cfg, n_importance=64, key=jax.random.key(1),
    )
    assert out_f.shape == (16, 3)
    assert np.isfinite(np.asarray(out_f)).all()
    assert hits["fine"] > hits["coarse"] * 2, hits


def test_hierarchical_training_end_to_end(tmp_path):
    """n_importance > 0: coarse/fine pair trains, checkpoints round-trip,
    full-frame hierarchical render works."""
    import os

    from sfm_nerf_tpu.config import (
        NeRFModelConfig, NeRFPipelineConfig, TrainConfig,
    )
    from sfm_nerf_tpu.io.blender import load_blender_dataset
    from sfm_nerf_tpu.train.nerf_trainer import NeRFTrainer
    from util_synthetic import make_blender_dataset

    root = make_blender_dataset(str(tmp_path / "d"), n_frames=3,
                                height=20, width=20)
    images, poses, cam = load_blender_dataset(root, "train")
    cfg = NeRFPipelineConfig(
        model=NeRFModelConfig(hidden=16, n_pos_freq=3, n_dir_freq=1),
        render=RenderConfig(n_sample=16, n_importance=16),
        train=TrainConfig(n_rays_batch=128, lrate=5e-3, val_every=0),
        checkpoint_path=os.path.join(str(tmp_path), "ck"),
        load_checkpoint=False,
    )
    trainer = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    assert set(trainer.params) == {"coarse", "fine"}
    trainer.fit(max_iters=151, progress=False)
    losses = trainer._last_losses
    assert losses[-1] < losses[0] * 0.8, losses
    img = np.asarray(trainer.render_image(
        trainer.params, trainer.K, trainer.poses[0], 20, 20))
    assert img.shape == (20, 20, 3) and np.isfinite(img).all()
    # resume restores the nested pytree
    trainer2 = NeRFTrainer(cfg, images, poses, cam.camera_matrix)
    assert trainer2.try_resume()


def test_sample_pdf_output_sorted():
    """Stratified u means inverse-CDF output is non-decreasing per ray —
    the property the hierarchical merge_sorted union relies on."""
    rng = np.random.default_rng(3)
    z = np.sort(rng.uniform(2, 6, (16, 64)), axis=-1)
    bins = jnp.asarray(0.5 * (z[:, 1:] + z[:, :-1]))
    w = jnp.asarray(rng.uniform(0, 1, (16, 62))
                    * (rng.random((16, 62)) > 0.3))
    out = np.asarray(sample_pdf(jax.random.key(5), bins, w, 96))
    assert (np.diff(out, axis=-1) >= 0).all()


def test_merge_sorted_matches_sort():
    """Bitonic merge == jnp.sort of the concatenation, elementwise, across
    shapes incl. non-power-of-two unions and duplicate values."""
    from sfm_nerf_tpu.ops.render import merge_sorted

    rng = np.random.default_rng(11)
    for n, a_w, b_w in [(8, 256, 128), (4, 64, 64), (3, 16, 5), (2, 1, 1),
                        (5, 31, 97)]:
        a = np.sort(rng.uniform(0, 10, (n, a_w)), -1)
        b = np.sort(np.round(rng.uniform(0, 10, (n, b_w)), 1), -1)  # ties
        got = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
        want = np.sort(np.concatenate([a, b], -1), -1)
        np.testing.assert_array_equal(got, want)


def test_sample_pdf_matches_gather_oracle():
    """The compare/masked-reduce formulation (TPU: no searchsorted or
    gathers) selects bit-identical neighbors to the original
    searchsorted + take_along_axis implementation."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sfm_nerf_tpu.ops.render import sample_pdf

    def gather_oracle(key, bins, weights, n_importance):
        weights = weights + 1e-5
        pdf = weights / jnp.sum(weights, -1, keepdims=True)
        cdf = jnp.cumsum(pdf, -1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
        if key is not None:
            u = (
                jnp.arange(n_importance, dtype=cdf.dtype)
                + jax.random.uniform(key, (cdf.shape[0], n_importance),
                                     dtype=cdf.dtype)
            ) / n_importance
        else:
            u = jnp.linspace(0.0, 1.0 - 1e-5, n_importance)[None, :].repeat(
                cdf.shape[0], axis=0)
        idx = jax.vmap(
            lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
        below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
        above = jnp.clip(idx, 0, cdf.shape[-1] - 1)
        take = jnp.take_along_axis
        cdf_b, cdf_a = take(cdf, below, -1), take(cdf, above, -1)
        bins_b = take(bins, jnp.clip(below, 0, bins.shape[-1] - 1), -1)
        bins_a = take(bins, jnp.clip(above, 0, bins.shape[-1] - 1), -1)
        denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
        return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)

    rng = np.random.default_rng(7)
    for n, s, ni, keyed in [(32, 64, 48, True), (8, 16, 32, False),
                            (16, 128, 128, True)]:
        z = np.sort(rng.uniform(2, 6, (n, s)), axis=-1)
        bins = jnp.asarray(0.5 * (z[:, 1:] + z[:, :-1]))
        # include zero-weight bins (ties in the cdf after the 1e-5 floor)
        w = rng.uniform(0, 1, (n, s - 2)) * (rng.random((n, s - 2)) > 0.2)
        w = jnp.asarray(w)
        key = jax.random.key(3) if keyed else None
        got = sample_pdf(key, bins, w, ni)
        want = gather_oracle(key, bins, w, ni)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
