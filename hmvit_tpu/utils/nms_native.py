"""ctypes binding for the native C++ rotated IoU / NMS
(native/rotated_nms.cpp), with auto-build on first use and a clean
``None`` fallback so :mod:`hmvit_tpu.utils.nms` can fall back to numpy.

The native path is the host-eval analogue of the reference's
shapely/GEOS geometry (reference: opencood/utils/box_utils.py:575-620):
same greedy descending-score pick order, convex-quad clip IoU in double
precision.  Cross-checked against the numpy oracle in
tests/test_native_nms.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librotated_nms.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR,
                                "librotated_nms.so"],
                               check=True, capture_output=True)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.nms_rotated.restype = ctypes.c_longlong
            lib.nms_rotated.argtypes = [
                f32p, f32p, ctypes.c_longlong, ctypes.c_float,
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_int32),
            ]
            lib.rotated_iou_matrix.restype = None
            lib.rotated_iou_matrix.argtypes = [
                f32p, ctypes.c_longlong, f32p, ctypes.c_longlong, f32p,
            ]
            _lib = lib
        except OSError:
            _build_failed = True
    return _lib


def _as_corners2d(corners) -> np.ndarray:
    c = np.ascontiguousarray(
        np.asarray(corners, np.float32)[..., :4, :2])
    return c.reshape(-1, 4, 2)


def nms_rotated_native(corners, scores, threshold: float,
                       top: int = 1000):
    """Native greedy NMS; returns keep indices (pick order) or ``None``
    when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    c = _as_corners2d(corners)
    s = np.ascontiguousarray(np.asarray(scores, np.float32))
    n = c.shape[0]
    if n == 0:
        return np.array([], dtype=np.int32)
    keep = np.empty(n, np.int32)
    n_keep = lib.nms_rotated(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.c_float(threshold), top,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return keep[:n_keep].copy()


def rotated_iou_matrix_native(corners_a, corners_b):
    """Native pairwise IoU or ``None`` when unavailable."""
    lib = _load()
    if lib is None:
        return None
    a = _as_corners2d(corners_a)
    b = _as_corners2d(corners_b)
    out = np.empty((a.shape[0], b.shape[0]), np.float32)
    lib.rotated_iou_matrix(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.shape[0],
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
