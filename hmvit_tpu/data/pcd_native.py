"""ctypes binding for the native C++ PCD parser, with auto-build and a
pure-python fallback (hmvit_tpu.data.pcd_io)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpcd_parser.so")
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
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.parse_pcd.restype = ctypes.c_long
            lib.parse_pcd.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.c_uint,
                ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _build_failed = True
    return _lib


def read_pcd_padded(path: str, max_points: int, seed: int = 0,
                    shuffle: bool = False):
    """Parse a pcd into a fixed (max_points, 4) buffer + mask.

    Uses the native parser when available (built on first use); falls
    back to the python reader otherwise.
    """
    lib = _load()
    out = np.zeros((max_points, 4), np.float32)
    if lib is not None:
        n = lib.parse_pcd(
            path.encode(), out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)),
            max_points, seed & 0xFFFFFFFF, int(shuffle))
        if n >= 0:
            mask = np.zeros(max_points, np.float32)
            mask[:n] = 1
            return out, mask

    from .pcd_io import read_pcd

    pts = read_pcd(path)
    if shuffle:
        pts = pts[np.random.default_rng(seed).permutation(len(pts))]
    n = min(len(pts), max_points)
    out[:n] = pts[:n]
    mask = np.zeros(max_points, np.float32)
    mask[:n] = 1
    return out, mask
