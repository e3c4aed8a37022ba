"""Phase1 data IO: calibration, images, and matching-file parsing.

Format/semantic parity with Phase1/Wrapper.py:14-193:

- ``calibration.txt``: whitespace 3x3 K;
- images ``1.png..N.png``;
- ``matching{i}.txt``: header ``nFeatures: <n>``, then per feature
  ``total_imgs R G B u v [img_id u v]...`` describing matches from image i
  to later images.  Parsing produces the same three structures the
  reference driver consumes:
    matches_dict[(i,j)]      -> float array (K,5) rows (u_i,v_i,u_j,v_j,f_idx)
    all_feature_points[f]    -> {img_id: (u,v)} track dict
    visibility               -> (max_img_id+1, F) 0/1 array (row 0 unused,
                                image ids are 1-based, Wrapper.py:180-190)
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np


def load_calibration(calib_file: str) -> np.ndarray:
    rows = []
    with open(calib_file) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append([float(v) for v in line.split()])
    K = np.asarray(rows, dtype=np.float64)
    if K.shape != (3, 3):
        raise ValueError(f"calibration must be 3x3, got {K.shape}")
    return K


def load_images(path: str, num_imgs: int) -> List[np.ndarray]:
    import cv2

    images = []
    for i in range(1, num_imgs + 1):
        img = cv2.imread(os.path.join(path, f"{i}.png"))
        if img is not None:
            images.append(img)
    return images


def parse_matching_files(
    folder_path: str, num_images: int
) -> Tuple[Dict, List[Dict], np.ndarray]:
    """Parse all ``matching{i}.txt`` files (see module docstring)."""
    matches_dict: Dict[Tuple[int, int], list] = {}
    all_feature_points: List[Dict[int, Tuple[float, float]]] = []
    max_image_id = 0
    f_idx = 0

    for i_ref in range(1, num_images + 1):
        fp = os.path.join(folder_path, f"matching{i_ref}.txt")
        if not os.path.isfile(fp):
            continue
        with open(fp) as f:
            f.readline()  # "nFeatures: <n>" header (count not trusted)
            for line in f:
                tokens = line.split()
                if not tokens:
                    continue
                num_matches = int(tokens[0])
                u_i, v_i = float(tokens[4]), float(tokens[5])
                max_image_id = max(max_image_id, i_ref)
                feature_dict = {i_ref: (u_i, v_i)}
                idx = 6
                for _ in range(num_matches - 1):
                    j = int(tokens[idx])
                    u_j, v_j = float(tokens[idx + 1]), float(tokens[idx + 2])
                    idx += 3
                    max_image_id = max(max_image_id, j)
                    matches_dict.setdefault((i_ref, j), []).append(
                        (u_i, v_i, u_j, v_j, f_idx)
                    )
                    feature_dict[j] = (u_j, v_j)
                all_feature_points.append(feature_dict)
                f_idx += 1

    visibility = np.zeros((max_image_id + 1, f_idx))
    for fi, feature_dict in enumerate(all_feature_points):
        for img_id in feature_dict:
            visibility[img_id][fi] = 1

    matches_np = {
        k: np.asarray(v, dtype=np.float64) for k, v in matches_dict.items()
    }
    return matches_np, all_feature_points, visibility
