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

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_native_lib = None


def _load_native() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the C++ matching parser; None if the
    toolchain is unavailable — callers fall back to the Python parser.
    A build/load failure is STICKY (sentinel False): without it every
    parse/decode/ply call would re-spawn the failing g++ subprocesses."""
    global _native_lib
    if _native_lib is not None:
        return _native_lib or None
    so = os.path.join(_NATIVE_DIR, "libmatching_parser.so")
    src = os.path.join(_NATIVE_DIR, "matching_parser.cpp")
    src_img = os.path.join(_NATIVE_DIR, "image_decode.cpp")
    try:
        srcs = [s for s in (src, src_img) if os.path.exists(s)]
        # a prebuilt .so without sources (packaged install) loads as-is
        newest_src = max(os.path.getmtime(s) for s in srcs) if srcs else 0.0
        if not srcs and not os.path.exists(so):
            # pip-installed layout: setup.py ships the same symbols as
            # sfm_nerf_tpu/_libmatching_parser.*.so (no sources, no build)
            import glob

            pkg_dir = os.path.dirname(os.path.dirname(__file__))
            hits = sorted(
                glob.glob(os.path.join(pkg_dir, "_libmatching_parser*"))
            )
            if not hits:
                _native_lib = False
                return None
            so = hits[0]
        elif not os.path.exists(so) or newest_src > os.path.getmtime(so):
            if not srcs:
                _native_lib = False
                return None
            try:
                # full build (needs libpng for the image decoder)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so,
                     src, src_img, "-lpng"],
                    check=True, capture_output=True,
                )
            except subprocess.CalledProcessError:
                # no libpng dev files: parser-only build (image decode
                # falls back to imageio/cv2 in the loaders)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True,
                )
        lib = ctypes.CDLL(so)
        lib.parse_matching_file.restype = ctypes.c_int64
        lib.parse_matching_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.parse_matching_dir.restype = ctypes.c_int64
        lib.parse_matching_dir.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.write_ply_binary.restype = ctypes.c_int64
        lib.write_ply_binary.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        try:  # absent when built without libpng
            lib.png_dims.restype = ctypes.c_int64
            lib.png_dims.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.decode_png_batch.restype = ctypes.c_int64
            lib.decode_png_batch.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_int64,
            ]
        except AttributeError:
            pass
        _native_lib = lib
    except Exception:
        _native_lib = False     # sticky failure: don't re-run g++ per call
    return _native_lib or None


def decode_images_native(paths: List[str]) -> Optional[np.ndarray]:
    """Parallel native PNG decode (native/image_decode.cpp, one libpng
    decode per thread) -> (N, H, W, 3) uint8 RGB, alpha dropped (the
    reference's ``img[..., :3]``, Phase2/train.py:44), 16-bit inputs
    normalized to 8-bit.  Returns None when the native layer is
    unavailable or any file fails — callers fall back to imageio/cv2."""
    lib = _load_native()
    if not paths or lib is None or not hasattr(lib, "decode_png_batch"):
        return None
    h = ctypes.c_int64(0)
    w = ctypes.c_int64(0)
    if lib.png_dims(paths[0].encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    buf = np.empty((len(paths), h.value, w.value, 3), np.uint8)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    rc = lib.decode_png_batch(
        blob, len(paths),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h.value, w.value,
    )
    return buf if rc == 0 else None


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
    """Load ``1.png .. {num_imgs}.png`` (reference layout).  An unreadable
    frame stays in the list as ``None`` — silently SKIPPING it would shift
    every later index and make image-indexed consumers (match overlays,
    point-cloud colors) sample the wrong frames."""
    import cv2

    return [
        cv2.imread(os.path.join(path, f"{i}.png"))
        for i in range(1, num_imgs + 1)
    ]


def parse_matching_files(
    folder_path: str, num_images: int, use_native: bool = True
) -> Tuple[Dict, List[Dict], np.ndarray]:
    """Parse all ``matching{i}.txt`` files (see module docstring).

    Uses the C++ parser (native/matching_parser.cpp, built on demand) when a
    toolchain is available; identical outputs to the Python path (tested)."""
    if use_native and _load_native() is not None:
        try:
            return _parse_matching_files_native(folder_path, num_images)
        except Exception:
            pass  # fall back to Python on any native-path failure
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


def build_visibility_matrix(camera_ids, all_feature_points) -> np.ndarray:
    """V[i, f] = 1 iff feature f is observed by camera_ids[i] — the
    reference's standalone builder (Phase1/BundleAdjustment.py:6-26; its
    driver builds an equivalent inline, Wrapper.py:815-827)."""
    cam_index = {cid: i for i, cid in enumerate(camera_ids)}
    V = np.zeros((len(camera_ids), len(all_feature_points)), dtype=np.uint8)
    for f_idx, feature_dict in enumerate(all_feature_points):
        for cam_id in feature_dict:
            if cam_id in cam_index:
                V[cam_index[cam_id], f_idx] = 1
    return V


def parse_matching_table(
    folder_path: str, num_images: int
) -> Tuple[np.ndarray, int]:
    """Parallel C++ parse of all matching files into ONE flat table.

    Returns ``(rows, n_features)`` with rows (N, 8) float64 columns
    ``[i_ref, j, u_i, v_i, u_j, v_j, f_idx, rgb_packed]`` (j == 0 marks the
    per-feature self row carrying the source observation).  This is the
    scale-path API: no per-track Python dicts are materialized; visibility
    is one fancy-index away (see ``visibility_from_table``).
    """
    lib = _load_native()
    if lib is None:
        raise RuntimeError("native parser unavailable (no C++ toolchain)")
    cap = 4096
    for i_ref in range(1, num_images + 1):
        fp = os.path.join(folder_path, f"matching{i_ref}.txt")
        if os.path.isfile(fp):
            # every row consumes >= 4 text bytes (see matching_parser.cpp)
            cap += os.path.getsize(fp) // 4 + 16
    buf = np.empty((cap, 8), dtype=np.float64)
    nfeat = ctypes.c_int64(0)
    n = lib.parse_matching_dir(
        folder_path.encode(), num_images,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cap, ctypes.byref(nfeat),
    )
    if n < 0:
        raise RuntimeError(f"native parse failed in {folder_path}")
    return buf[:n].copy(), int(nfeat.value)


def visibility_from_table(rows: np.ndarray, n_features: int) -> np.ndarray:
    """(max_img+1, F) 0/1 visibility from a ``parse_matching_table`` table
    — pure fancy indexing, no Python loops."""
    m = rows[rows[:, 1] != 0]
    max_img = int(max(rows[:, 0].max(initial=0), rows[:, 1].max(initial=0)))
    vis = np.zeros((max_img + 1, n_features))
    vis[rows[:, 0].astype(np.int64), rows[:, 6].astype(np.int64)] = 1
    vis[m[:, 1].astype(np.int64), m[:, 6].astype(np.int64)] = 1
    return vis


def _parse_matching_files_native(
    folder_path: str, num_images: int
) -> Tuple[Dict, List[Dict], np.ndarray]:
    """C++ fast path: all files parsed in parallel (one thread per file)
    into one flat (rows, 8) table, grouped in numpy.  Identical feature
    indexing to the sequential Python parser (tested).

    Scale note (measured, 64 files / 960k rows): the C++ parse takes 0.9 s
    vs 2.5 s for the whole Python parser — but materializing the
    list-of-dicts track structure this API returns costs ~2.4 s of pure
    Python regardless of parser.  Scale consumers should use
    ``parse_matching_table`` (table + visibility only, no dicts)."""
    rows, n_features = parse_matching_table(folder_path, num_images)
    is_match = rows[:, 1] != 0
    m = rows[is_match]
    max_image_id = int(max(rows[:, 0].max(initial=0), rows[:, 1].max(initial=0)))

    # matches_dict[(i,j)] -> (u_i, v_i, u_j, v_j, f_idx), file order preserved
    matches_dict: Dict[Tuple[int, int], np.ndarray] = {}
    pair_key = m[:, 0].astype(np.int64) * 10000 + m[:, 1].astype(np.int64)
    order = np.argsort(pair_key, kind="stable")
    sorted_m = m[order]
    keys, starts = np.unique(pair_key[order], return_index=True)
    bounds = list(starts) + [len(sorted_m)]
    for k, s, e in zip(keys, bounds[:-1], bounds[1:]):
        matches_dict[(int(k) // 10000, int(k) % 10000)] = sorted_m[s:e][
            :, [2, 3, 4, 5, 6]
        ].copy()

    # tracks: iterate python LISTS, not numpy rows (row slicing in a python
    # loop is ~10x slower); every feature's source observation arrives via
    # its self row (j==0), so the two passes need no membership checks
    all_feature_points: List[Dict[int, Tuple[float, float]]] = [
        {} for _ in range(n_features)
    ]
    self_rows = rows[~is_match]
    for f, i_ref, u, v in zip(
        self_rows[:, 6].astype(np.int64).tolist(),
        self_rows[:, 0].astype(np.int64).tolist(),
        self_rows[:, 2].tolist(), self_rows[:, 3].tolist(),
    ):
        all_feature_points[f][i_ref] = (u, v)
    for f, j, u, v in zip(
        m[:, 6].astype(np.int64).tolist(),
        m[:, 1].astype(np.int64).tolist(),
        m[:, 4].tolist(), m[:, 5].tolist(),
    ):
        all_feature_points[f][j] = (u, v)
    # visibility: pure fancy indexing
    visibility = np.zeros((max_image_id + 1, n_features))
    visibility[rows[:, 0].astype(np.int64), rows[:, 6].astype(np.int64)] = 1
    visibility[m[:, 1].astype(np.int64), m[:, 6].astype(np.int64)] = 1
    return matches_dict, all_feature_points, visibility
