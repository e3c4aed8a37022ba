"""Artifact writers: files written, non-empty, headless (no display)."""

import os

import numpy as np

from sfm_nerf_tpu.io import artifacts as art


def test_all_plot_writers(tmp_path, rng):
    out = str(tmp_path)
    pts4 = [rng.normal(size=(50, 3)) for _ in range(4)]
    p1 = art.save_x_vs_z_plot(pts4, out)
    p2 = art.save_3d_points_plot(pts4[0], np.ones(3), pts4[1], out)
    cam_info = {
        1: {"R": np.eye(3), "C": np.zeros(3)},
        2: {"R": np.eye(3), "C": np.ones(3)},
    }
    p3 = art.save_reconstruction_plot(pts4[0], cam_info, out)
    p4 = art.save_topdown_plot(pts4[0], cam_info, out)
    img = (rng.uniform(0, 255, (60, 80, 3))).astype(np.uint8)
    proj = rng.uniform(0, 60, (20, 2))
    pts = rng.uniform(0, 60, (20, 2))
    p56 = art.save_projection_overlays(
        img, img, proj, proj, pts, pts, "lineartriangulation", out
    )
    matches = np.hstack([pts, pts, np.arange(20)[:, None]])
    p7 = art.save_match_visualization(img, img, matches, out)
    for p in [p1, p2, p3, p4, *p56, p7]:
        assert os.path.exists(p) and os.path.getsize(p) > 1000, p


def test_overlay_handles_nonfinite_projections(tmp_path, rng):
    """Projected points behind the camera can be inf/nan — writer must not
    crash (the reference's int(round(...)) would)."""
    img = np.zeros((40, 40, 3), np.uint8)
    proj = np.array([[np.inf, 5.0], [np.nan, np.nan], [10.0, 10.0]])
    pts = np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    paths = art.save_projection_overlays(
        img, img, proj, proj, pts, pts, "nonlineartriangulation", str(tmp_path)
    )
    assert all(os.path.exists(p) for p in paths)


def test_save_ply(tmp_path, rng):
    pts = rng.normal(size=(30, 3))
    colors = rng.integers(0, 255, (30, 3)).astype(np.uint8)
    p = art.save_ply(pts, colors, str(tmp_path))
    lines = open(p).read().splitlines()
    assert lines[0] == "ply"
    assert "element vertex 30" in lines[2]
    assert len(lines) == 10 + 30  # header + points
    vals = lines[-1].split()
    assert len(vals) == 6


def test_binary_ply_roundtrip(tmp_path):
    """Native binary PLY writer: header + packed records parse back."""
    import struct

    import numpy as np

    from sfm_nerf_tpu.io.artifacts import save_ply

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(257, 3))
    cols = rng.integers(0, 256, (257, 3)).astype(np.uint8)
    p = save_ply(pts, cols, str(tmp_path), "bin.ply", binary=True)
    raw = open(p, "rb").read()
    hdr_end = raw.index(b"end_header\n") + len(b"end_header\n")
    hdr = raw[:hdr_end]
    assert b"binary_little_endian" in hdr and b"element vertex 257" in hdr
    body = raw[hdr_end:]
    assert len(body) == 257 * 15
    for i in (0, 128, 256):
        rec = body[i * 15:(i + 1) * 15]
        np.testing.assert_allclose(
            struct.unpack("<fff", rec[:12]), pts[i], rtol=1e-6)
        assert rec[12:15] == cols[i].tobytes()
    # ascii mode still available
    p2 = save_ply(pts, cols, str(tmp_path), "ascii.ply", binary=False)
    assert b"format ascii" in open(p2, "rb").read(64)
