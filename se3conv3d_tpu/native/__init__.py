"""ctypes bindings for the native host-prep library (libpcprep).

Compiled with g++ on first use (cached next to the sources); every entry
point has a pure-numpy fallback, so the package works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["load_library", "elastic_distortion", "voxel_keys", "crop_nearest"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpcprep.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load libpcprep.so; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-s", "-C", _DIR, "libpcprep.so"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.elastic_distortion.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_uint64,
        ]
        lib.voxel_keys.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.crop_nearest.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def elastic_distortion(
    pts: np.ndarray, granularity, magnitude, seed: int
) -> Optional[np.ndarray]:
    """Native elastic distortion; returns None when the library is absent
    (callers fall back to the numpy path)."""
    lib = load_library()
    if lib is None:
        return None
    out = np.ascontiguousarray(pts, np.float64).copy()
    gran = np.ascontiguousarray(granularity, np.float64)
    mag = np.ascontiguousarray(magnitude, np.float64)
    lib.elastic_distortion(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.shape[0],
        gran.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mag.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(gran),
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
    )
    return out


def voxel_keys(pts: np.ndarray, cell: float) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, np.float32)
    keys = np.empty(p.shape[0], np.int64)
    lib.voxel_keys(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        p.shape[0],
        ctypes.c_float(cell),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return keys


def crop_nearest(pts: np.ndarray, max_pts: int, seed: int) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, np.float32)
    keep = np.empty(p.shape[0], np.uint8)
    lib.crop_nearest(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        p.shape[0],
        int(max_pts),
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)
