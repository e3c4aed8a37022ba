"""NeRF MLP: structural parity with the reference architectures.

Oracles: (a) exact parameter counts of the shipped checkpoints (530,309 for
the legacy arch, 495,749 for the no-PE ablation — SURVEY §2.2); (b) a torch
re-execution of the shipped chair state dict compared against our converted
pytree forward, elementwise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_nerf_tpu.config import NeRFModelConfig
from sfm_nerf_tpu.models import init_nerf_params, nerf_apply, param_count
from sfm_nerf_tpu.ops.encoding import positional_encoding

from conftest import requires_reference

CHAIR = "/root/reference/Phase2/checkpoints/chair/final_model.pth"
NO_PE = "/root/reference/Phase2/checkpoints_no_pos_encoding/final_model.pth"


def test_positional_encoding_order():
    """Layout must be [x, sin(2^0 pi x), cos(2^0 pi x), sin(2 pi x), ...]
    per-frequency interleave (Phase2/NeRFModel.py:150-155)."""
    x = np.array([[0.3, -0.7, 1.2]], dtype=np.float32)
    out = np.asarray(positional_encoding(jnp.asarray(x), 3))
    expected = [x[0]]
    for l in range(3):
        expected.append(np.sin(2.0**l * np.pi * x[0]))
        expected.append(np.cos(2.0**l * np.pi * x[0]))
    expected = np.concatenate(expected)
    np.testing.assert_allclose(out[0], expected, rtol=1e-6, atol=1e-6)
    assert out.shape == (1, 3 * (2 * 3 + 1))


def test_legacy_param_count_matches_shipped_checkpoint():
    cfg = NeRFModelConfig(arch="legacy")
    params = init_nerf_params(jax.random.key(0), cfg)
    assert param_count(params) == 530309


def test_no_pe_param_count_matches_shipped_checkpoint():
    cfg = NeRFModelConfig(
        arch="legacy", pos_encoding=False, n_block1_layers=4, has_skip=False
    )
    params = init_nerf_params(jax.random.key(0), cfg)
    assert param_count(params) == 495749


def test_active_arch_shapes():
    cfg = NeRFModelConfig(arch="active")
    params = init_nerf_params(jax.random.key(0), cfg)
    pos = jnp.ones((4, 7, 3))
    dirs = jnp.ones((4, 7, 3))
    density, rgb = nerf_apply(params, pos, dirs, cfg)
    assert density.shape == (4, 7, 1)
    assert rgb.shape == (4, 7, 3)
    assert np.all(np.asarray(density) >= 0)        # softplus head
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))


def _torch_legacy_forward(sd, pos, direction, n_pos=10, n_dir=4):
    """Independent torch oracle executing the serialized graph directly from
    state-dict keys (no reference code imported)."""
    import torch

    def pe(x, L):
        if L == 0:
            return x
        parts = [x]
        for l in range(L):
            parts.append(torch.sin(2.0**l * torch.pi * x))
            parts.append(torch.cos(2.0**l * torch.pi * x))
        return torch.cat(parts, -1)

    def lin(name, x):
        return x @ sd[name + ".weight"].T + sd[name + ".bias"]

    pos_e = pe(pos, n_pos) if sd["fc1.0.weight"].shape[1] != 3 else pos
    dir_e = pe(direction, n_dir) if sd["fc1.0.weight"].shape[1] != 3 else direction
    h = torch.relu(lin("fc1.0", pos_e))
    b1 = sorted(
        (int(k.split(".")[1]) for k in sd if k.startswith("block1") and k.endswith("weight"))
    )
    for i in b1:
        h = torch.relu(lin(f"block1.{i}", h))
    if "skip_layer.0.weight" in sd:
        h = torch.relu(lin("skip_layer.0", torch.cat([h, pos_e], -1)))
        for i in (0, 2, 4):
            h = torch.relu(lin(f"block2.{i}", h))
    density = h[..., :1]
    feat = h[..., 1:]
    rgb = torch.relu(lin("rgb_fc.0", torch.cat([feat, dir_e], -1)))
    rgb = torch.sigmoid(lin("rgb_fc.2", rgb))
    return density, rgb


@requires_reference
@pytest.mark.parametrize("path", [CHAIR, NO_PE])
def test_converted_checkpoint_forward_parity(path):
    """Both sides in float64: isolates converter/graph correctness from
    float32 trig-ULP noise, which the unbounded (post-ReLU) density channel of
    this trained net amplifies ~1e5x (rgb stays at 2e-6 in float32)."""
    import torch

    from sfm_nerf_tpu.models.convert import convert_pth, load_torch_state_dict

    params, cfg = convert_pth(path)

    rng = np.random.default_rng(1)
    pos = rng.uniform(-2, 2, (64, 3)).astype(np.float64)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    with jax.enable_x64(True):
        params64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), params
        )
        d_jax, rgb_jax = nerf_apply(
            params64, jnp.asarray(pos), jnp.asarray(dirs), cfg
        )
        d_jax, rgb_jax = np.asarray(d_jax), np.asarray(rgb_jax)

    sd = {
        k: torch.from_numpy(v).double()
        for k, v in load_torch_state_dict(path).items()
    }
    d_t, rgb_t = _torch_legacy_forward(
        sd, torch.from_numpy(pos), torch.from_numpy(dirs)
    )

    np.testing.assert_allclose(d_jax, d_t.numpy(), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(rgb_jax, rgb_t.numpy(), rtol=1e-8, atol=1e-8)


def test_active_no_pe_ablation():
    """--no_pos_encoding CLI path: raw 3-d inputs end-to-end."""
    cfg = NeRFModelConfig(arch="active", pos_encoding=False)
    params = init_nerf_params(jax.random.key(2), cfg)
    assert params["fc1"]["w"].shape[0] == 3
    density, rgb = nerf_apply(
        params, jnp.ones((5, 3)), jnp.ones((5, 3)), cfg
    )
    assert density.shape == (5, 1) and rgb.shape == (5, 3)


@requires_reference
def test_pth_roundtrip_export(tmp_path):
    """torch -> ours -> torch -> ours must be exact (full interop)."""
    import os

    from sfm_nerf_tpu.models.convert import (
        convert_pth, export_legacy_to_pth, load_torch_state_dict,
    )

    for src in (CHAIR, NO_PE):
        params, cfg = convert_pth(src)
        out = os.path.join(str(tmp_path), "roundtrip.pth")
        export_legacy_to_pth(params, cfg, out)
        sd_orig = load_torch_state_dict(src)
        sd_new = load_torch_state_dict(out)
        assert set(sd_orig) == set(sd_new), (
            set(sd_orig) ^ set(sd_new)
        )
        for k in sd_orig:
            np.testing.assert_array_equal(sd_orig[k], sd_new[k])


def test_active_pth_roundtrip_export(tmp_path):
    """ours -> reference active-class .pth -> ours must be exact, and the
    converter must dispatch on the active layout automatically."""
    import os

    from sfm_nerf_tpu.models.convert import convert_pth, export_active_to_pth

    mcfg = NeRFModelConfig(arch="active", hidden=32, n_pos_freq=4,
                           n_dir_freq=2)
    src = init_nerf_params(jax.random.key(3), mcfg)
    out = os.path.join(str(tmp_path), "active.pth")
    export_active_to_pth(src, out)
    params, cfg = convert_pth(out)
    assert cfg.arch == "active" and cfg.hidden == 32
    assert cfg.n_pos_freq == 4 and cfg.n_dir_freq == 2
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_flatten_with_path(src)[0],
        jax.tree_util.tree_flatten_with_path(
            jax.tree_util.tree_map(jnp.asarray, params))[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la, np.float32),
                                      np.asarray(lb, np.float32))


@requires_reference
def test_active_export_runs_reference_class(tmp_path):
    """Our exported active .pth loaded into the reference's ACTUAL NeRFmodel
    class (Phase2/NeRFModel.py:101) agrees with nerf_apply — interop for
    self-trained reference checkpoints in the other direction."""
    import importlib.util
    import os

    import torch

    from sfm_nerf_tpu.models.convert import export_active_to_pth

    spec = importlib.util.spec_from_file_location(
        "ref_nerfmodel", "/root/reference/Phase2/NeRFModel.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    mcfg = NeRFModelConfig(arch="active", hidden=32, n_pos_freq=4,
                           n_dir_freq=2)
    params = init_nerf_params(jax.random.key(4), mcfg)
    out = os.path.join(str(tmp_path), "active.pth")
    export_active_to_pth(params, out)

    model = ref.NeRFmodel(embed_pos_L=4, embed_direction_L=2,
                          num_channels=32)
    model.load_state_dict(torch.load(out, weights_only=True))
    model.eval()

    rng = np.random.default_rng(2)
    pos = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    with torch.no_grad():
        d_t, rgb_t = model(torch.from_numpy(pos), torch.from_numpy(dirs))
    d_j, rgb_j = nerf_apply(
        jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params),
        jnp.asarray(pos), jnp.asarray(dirs), mcfg)
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_density_bias_init_shifts_head_both_archs():
    """density_bias_init (sparse-scene anti-collapse, config.py) shifts
    exactly the density head's bias — 'active': the density Linear;
    'legacy': channel 0 of block2_2 — and nothing else, so a 0.0 value
    keeps reference-init parity bit-for-bit."""
    import jax
    import numpy as np

    from sfm_nerf_tpu.config import NeRFModelConfig
    from sfm_nerf_tpu.models import init_nerf_params

    for arch in ("active", "legacy"):
        base = init_nerf_params(
            jax.random.key(0), NeRFModelConfig(arch=arch, hidden=64))
        shifted = init_nerf_params(
            jax.random.key(0),
            NeRFModelConfig(arch=arch, hidden=64, density_bias_init=0.5))
        for name in base:
            for leaf in base[name]:
                a = np.asarray(base[name][leaf])
                b = np.asarray(shifted[name][leaf])
                if arch == "active" and name == "density" and leaf == "b":
                    np.testing.assert_allclose(b, a + 0.5, rtol=1e-6)
                elif arch == "legacy" and name == "block2_2" and leaf == "b":
                    np.testing.assert_allclose(b[0], a[0] + 0.5, rtol=1e-6)
                    np.testing.assert_array_equal(b[1:], a[1:])
                else:
                    np.testing.assert_array_equal(b, a, err_msg=(arch, name, leaf))
