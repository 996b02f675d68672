"""ctypes bindings for the native BAL parser (tpu_ba/io/_native).

Compiled lazily with g++ on first use (build cached next to the source);
falls back to the pure-Python parser in tpu_ba.io.bal when no toolchain is
available. The Python parser is the oracle (tests compare both).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_NATIVE_DIR, "bal_parser.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libbalparse.so")
_lock = threading.Lock()
_lib = None


class _BalData(ctypes.Structure):
    _fields_ = [
        ("n_cameras", ctypes.c_int64),
        ("n_points", ctypes.c_int64),
        ("n_obs", ctypes.c_int64),
        ("cam_idx", ctypes.POINTER(ctypes.c_int32)),
        ("pt_idx", ctypes.POINTER(ctypes.c_int32)),
        ("obs", ctypes.POINTER(ctypes.c_double)),
        ("cameras", ctypes.POINTER(ctypes.c_double)),
        ("points", ctypes.POINTER(ctypes.c_double)),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.bal_parse.argtypes = [ctypes.c_char_p, ctypes.POINTER(_BalData)]
        lib.bal_parse.restype = ctypes.c_int
        lib.bal_free.argtypes = [ctypes.POINTER(_BalData)]
        lib.bal_free.restype = None
        _lib = lib
        return _lib


def parse_bal_native(path: str):
    """Parse a BAL text file with the native parser.

    Returns (cameras (C,9) f64, points (P,3) f64, obs (O,2) f64,
    cam_idx (O,) i32, pt_idx (O,) i32) or None if unavailable/failed.
    """
    if path.endswith(".gz"):
        return None  # native path handles plain text only
    lib = get_lib()
    if lib is None:
        return None
    data = _BalData()
    rc = lib.bal_parse(path.encode(), ctypes.byref(data))
    if rc != 0:
        return None
    try:
        O, C, P = int(data.n_obs), int(data.n_cameras), int(data.n_points)
        cam_idx = np.ctypeslib.as_array(data.cam_idx, (O,)).copy()
        pt_idx = np.ctypeslib.as_array(data.pt_idx, (O,)).copy()
        obs = np.ctypeslib.as_array(data.obs, (O, 2)).copy()
        cams = np.ctypeslib.as_array(data.cameras, (C, 9)).copy()
        pts = np.ctypeslib.as_array(data.points, (P, 3)).copy()
    finally:
        lib.bal_free(ctypes.byref(data))
    return cams, pts, obs, cam_idx, pt_idx
