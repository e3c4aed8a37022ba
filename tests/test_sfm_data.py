"""Matching-file parsers: native C++ path must produce identical structures
to the Python reference path, on both synthetic and the real bundled data."""

import os

import numpy as np
import pytest

from sfm_nerf_tpu.io.sfm_data import (
    _load_native,
    _parse_matching_files_native,
    load_calibration,
    parse_matching_files,
)

from conftest import requires_reference

REF_DATA = "/root/reference/Phase1/Data"


def write_synthetic_matching(root):
    os.makedirs(root, exist_ok=True)
    # image 1: 3 features (one unmatched), image 2: 1 feature
    with open(os.path.join(root, "matching1.txt"), "w") as f:
        f.write("nFeatures: 3\n")
        f.write("3 255 0 0 10.5 20.5 2 110.25 120.75 3 210.0 220.0\n")
        f.write("1 0 255 0 30.0 40.0\n")          # no matches
        f.write("2 0 0 255 50.0 60.0 3 250.5 260.5\n")
    with open(os.path.join(root, "matching2.txt"), "w") as f:
        f.write("nFeatures: 1\n")
        f.write("2 1 2 3 70.0 80.0 4 170.0 180.0\n")
    return root


def assert_same(a, b):
    md_a, tr_a, vis_a = a
    md_b, tr_b, vis_b = b
    assert set(md_a) == set(md_b)
    for k in md_a:
        np.testing.assert_allclose(np.asarray(md_a[k]), np.asarray(md_b[k]))
    assert len(tr_a) == len(tr_b)
    for da, db in zip(tr_a, tr_b):
        assert set(da) == set(db)
        for img in da:
            np.testing.assert_allclose(da[img][:2], db[img][:2])
    np.testing.assert_array_equal(vis_a, vis_b)


def test_native_matches_python_synthetic(tmp_path):
    if _load_native() is None:
        pytest.skip("no C++ toolchain")
    root = write_synthetic_matching(str(tmp_path))
    py = parse_matching_files(root, 4, use_native=False)
    nat = _parse_matching_files_native(root, 4)
    assert_same(py, nat)
    # structure sanity
    md, tracks, vis = py
    assert (1, 2) in md and (1, 3) in md and (2, 4) in md
    assert len(tracks) == 4
    assert tracks[1] == {1: (30.0, 40.0)}        # unmatched feature kept
    assert vis.shape == (5, 4)


@requires_reference
def test_native_matches_python_reference_data():
    if _load_native() is None:
        pytest.skip("no C++ toolchain")
    py = parse_matching_files(REF_DATA, 5, use_native=False)
    nat = _parse_matching_files_native(REF_DATA, 5)
    assert_same(py, nat)
    md, tracks, vis = py
    assert sum(len(v) for v in md.values()) > 4000   # real scale


@requires_reference
def test_calibration_loader():
    K = load_calibration(os.path.join(REF_DATA, "calibration.txt"))
    assert K.shape == (3, 3)
    assert K[2, 2] == 1.0
    assert K[0, 0] > 100  # focal in pixels


def test_parse_matching_table_scale_api(tmp_path):
    """Table API == dict API content; visibility via fancy indexing."""
    import numpy as np

    from sfm_nerf_tpu.io.sfm_data import (
        parse_matching_files, parse_matching_table, visibility_from_table,
    )

    rows, nfeat = parse_matching_table(REF_DATA, 5)
    md, tracks, vis = parse_matching_files(REF_DATA, 5, use_native=False)
    assert nfeat == len(tracks)
    vis_t = visibility_from_table(rows, nfeat)
    np.testing.assert_array_equal(vis_t, vis)
    # match rows in the table reproduce every pair's match array
    m = rows[rows[:, 1] != 0]
    for (i, j), arr in md.items():
        sel = m[(m[:, 0] == i) & (m[:, 1] == j)]
        np.testing.assert_array_equal(sel[:, [2, 3, 4, 5, 6]], arr)


def test_native_matches_python_fuzz(tmp_path):
    """Property fuzz: 30 random matching trees (variable feature counts,
    match fan-outs, float formats, blank lines, trailing whitespace, a
    whole missing file) parse identically through C++ and Python."""
    if _load_native() is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(0)
    for trial in range(30):
        root = str(tmp_path / f"t{trial}")
        os.makedirs(root)
        n_imgs = int(rng.integers(2, 6))
        skip = int(rng.integers(1, n_imgs)) if trial % 5 == 0 else 0
        for i in range(1, n_imgs):
            if i == skip:
                continue          # missing matching file: skipped by both
            lines = []
            n_feat = int(rng.integers(0, 8))
            for _ in range(n_feat):
                n_match = int(rng.integers(0, n_imgs - i + 1))
                js = rng.choice(
                    np.arange(i + 1, n_imgs + 1), n_match, replace=False)
                row = [str(n_match + 1)]
                row += [str(int(c)) for c in rng.integers(0, 256, 3)]
                fmt = ("%.1f", "%.6f", "%g")[trial % 3]
                row += [fmt % v for v in rng.uniform(0, 800, 2)]
                for j in js:
                    row.append(str(int(j)))
                    row += [fmt % v for v in rng.uniform(0, 800, 2)]
                sep = "  " if trial % 4 == 0 else " "
                lines.append(sep.join(row) + (" " if trial % 7 == 0 else ""))
            body = "\n".join(lines)
            if trial % 6 == 0:
                body += "\n"      # trailing newline variants
            with open(os.path.join(root, f"matching{i}.txt"), "w") as f:
                f.write(f"nFeatures: {n_feat}\n" + body)
        py = parse_matching_files(root, n_imgs, use_native=False)
        nat = _parse_matching_files_native(root, n_imgs)
        assert nat is not None, f"native parse failed on trial {trial}"
        assert_same(py, nat)


def test_load_images_keeps_unreadable_frames_as_placeholders(tmp_path):
    """A missing/corrupt frame must stay in the list as None — silently
    skipping it would shift every later index, and image-indexed
    consumers (match overlays, PLY colors) would sample the wrong
    frames (sfm/pipeline.py gates on `is not None`)."""
    import cv2

    from sfm_nerf_tpu.io.sfm_data import load_images

    img = np.full((8, 8, 3), 64, np.uint8)
    cv2.imwrite(str(tmp_path / "1.png"), img)
    cv2.imwrite(str(tmp_path / "3.png"), img + 10)   # 2.png missing
    images = load_images(str(tmp_path), 3)
    assert len(images) == 3
    assert images[0] is not None and images[1] is None
    assert images[2] is not None and int(images[2][0, 0, 0]) == 74
