"""Native PNG decode (native/image_decode.cpp) vs imageio oracle."""

import os

import numpy as np
import pytest

from sfm_nerf_tpu.io.sfm_data import _load_native, decode_images_native

needs_decoder = pytest.mark.skipif(
    _load_native() is None or not hasattr(_load_native(), "decode_png_batch"),
    reason="native layer built without libpng",
)


@needs_decoder
def test_decode_matches_imageio_rgb_rgba_gray(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    paths = []
    # all same dims (batch contract); RGB, RGBA (alpha dropped), grayscale
    imgs = [
        rng.integers(0, 256, (40, 56, 3), np.uint8),
        rng.integers(0, 256, (40, 56, 4), np.uint8),
        rng.integers(0, 256, (40, 56), np.uint8),
    ]
    for i, img in enumerate(imgs):
        p = str(tmp_path / f"t{i}.png")
        imageio.imwrite(p, img)
        paths.append(p)
    out = decode_images_native(paths)
    assert out is not None and out.shape == (3, 40, 56, 3)
    for i, p in enumerate(paths):
        ref = imageio.imread(p)
        if ref.ndim == 2:
            ref = np.repeat(ref[..., None], 3, axis=-1)
        assert np.array_equal(out[i], ref[..., :3]), i


@needs_decoder
def test_decode_failure_returns_none(tmp_path):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as f:
        f.write(b"not a png")
    assert decode_images_native([p]) is None
    assert decode_images_native([str(tmp_path / "missing.png")]) is None


@needs_decoder
def test_blender_loader_native_matches_imageio(tmp_path):
    from util_synthetic import make_blender_dataset

    try:
        make_blender_dataset(str(tmp_path), n_frames=3, height=24, width=24)
    except Exception:
        pytest.skip("imageio writer unavailable")
    from sfm_nerf_tpu.io.blender import load_blender_dataset

    im_n, poses_n, cam_n = load_blender_dataset(
        str(tmp_path), "train", use_native=True)
    im_p, poses_p, cam_p = load_blender_dataset(
        str(tmp_path), "train", use_native=False)
    assert np.array_equal(im_n, im_p)
    assert np.array_equal(poses_n, poses_p)
    assert np.array_equal(cam_n.camera_matrix, cam_p.camera_matrix)


@needs_decoder
def test_decode_palette_16bit_interlaced(tmp_path):
    """Exotic PNG layouts the Blender loader may meet in the wild:
    palette-indexed, 16-bit (high byte kept, libpng strip_16), Adam7
    interlaced, gray+alpha — all normalized to 8-bit RGB like PIL."""
    from PIL import Image

    rng = np.random.default_rng(1)
    h, w = 24, 32
    paths, refs = [], []

    pal = Image.fromarray(
        rng.integers(0, 256, (h, w, 3), np.uint8), "RGB"
    ).quantize(colors=17)
    p = str(tmp_path / "palette.png"); pal.save(p)
    paths.append(p); refs.append(np.asarray(pal.convert("RGB")))

    arr16 = rng.integers(0, 2 ** 16, (h, w), np.uint16)
    img16 = Image.fromarray(arr16, "I;16")
    p = str(tmp_path / "gray16.png"); img16.save(p)
    ref16 = (arr16 >> 8).astype(np.uint8)  # libpng strip_16 keeps hi byte
    paths.append(p); refs.append(np.repeat(ref16[..., None], 3, axis=-1))

    inter = Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8), "RGB")
    p = str(tmp_path / "interlaced.png"); inter.save(p, interlace=True)
    paths.append(p); refs.append(np.asarray(inter))

    la = Image.fromarray(
        np.dstack([rng.integers(0, 256, (h, w), np.uint8)] * 2).astype(
            np.uint8
        ).reshape(h, w, 2), "LA")
    p = str(tmp_path / "gray_alpha.png"); la.save(p)
    paths.append(p)
    refs.append(np.repeat(np.asarray(la)[..., :1], 3, axis=-1))

    out = decode_images_native(paths)
    assert out is not None and out.shape == (len(paths), h, w, 3)
    for i, ref in enumerate(refs):
        assert np.array_equal(out[i], ref), paths[i]
