"""Track merging: union-find reconciliation of re-detected features."""

import os

import numpy as np
import pytest

from sfm_nerf_tpu.sfm.tracks import merge_tracks

REF_DATA = "/root/reference/Phase1/Data"


def test_merge_simple_duplicate():
    # feature 0: seen in img1 and img3 (from matching1.txt)
    # feature 1: seen in img2 and img3 (from matching2.txt), same img3 pixel
    tracks = [
        {1: (10.0, 20.0), 3: (55.0, 66.0)},
        {2: (30.0, 40.0), 3: (55.0, 66.0)},
        {1: (99.0, 99.0)},                    # unrelated
    ]
    matches = {
        (1, 3): np.array([[10.0, 20.0, 55.0, 66.0, 0]]),
        (2, 3): np.array([[30.0, 40.0, 55.0, 66.0, 1]]),
    }
    m2, t2, vis, old2new = merge_tracks(matches, tracks, tol=0.5)
    assert len(t2) == 2
    assert old2new.tolist() == [0, 0, 1]
    # merged track carries all three observations
    assert t2[0] == {1: (10.0, 20.0), 3: (55.0, 66.0), 2: (30.0, 40.0)}
    # match rows remapped to the merged index
    assert m2[(2, 3)][0, 4] == 0
    # visibility rebuilt: merged feature visible in 1,2,3
    assert vis[:, 0].tolist() == [0, 1, 1, 1]
    assert vis[:, 1].tolist() == [0, 1, 0, 0]


def test_merge_tolerance_and_transitivity():
    # chain: a~b via img1 (0.3px apart), b~c via img2 -> one track
    tracks = [
        {1: (10.0, 10.0)},
        {1: (10.3, 10.0), 2: (5.0, 5.0)},
        {2: (5.2, 5.0), 4: (1.0, 2.0)},
    ]
    _, t2, _, old2new = merge_tracks({}, tracks, tol=0.5)
    assert len(t2) == 1
    assert set(t2[0]) == {1, 2, 4}
    # first observation wins on the shared images
    assert t2[0][1] == (10.0, 10.0)
    assert t2[0][2] == (5.0, 5.0)


def test_no_merge_beyond_tol():
    tracks = [{1: (10.0, 10.0)}, {1: (11.5, 10.0)}]
    _, t2, _, _ = merge_tracks({}, tracks, tol=0.5)
    assert len(t2) == 2


def test_cell_boundary_merge():
    # coords straddling a hash-cell boundary still merge (neighbor probe)
    tracks = [{1: (0.99, 0.0)}, {1: (1.01, 0.0)}]
    _, t2, _, _ = merge_tracks({}, tracks, tol=0.5)
    assert len(t2) == 1


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data")
def test_merge_on_reference_data():
    from sfm_nerf_tpu.io.sfm_data import parse_matching_files

    matches, tracks, vis = parse_matching_files(REF_DATA, 5)
    m2, t2, vis2, old2new = merge_tracks(matches, tracks, tol=0.5)
    # real duplicates exist across the matching files
    assert len(t2) < len(tracks)
    # every original feature maps somewhere valid
    assert old2new.min() >= 0 and old2new.max() == len(t2) - 1
    # total observation count can only shrink (dedup), never grow
    n_obs = sum(len(t) for t in tracks)
    n_obs2 = sum(len(t) for t in t2)
    assert n_obs2 <= n_obs
    # remapped match rows reference in-range features
    for rows in m2.values():
        if rows.size:
            f = rows[:, 4].astype(int)
            assert f.min() >= 0 and f.max() < len(t2)
