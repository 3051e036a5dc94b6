"""ctypes loader for the native host kernels (native/edt.cpp).

Builds the shared library on demand with g++ -O3 (no pybind11 in the image;
plain C ABI + ctypes). All entry points degrade gracefully: callers fall back
to scipy/numpy implementations when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "edt.cpp")
_OUT = os.path.join(os.path.dirname(_SRC), "libpmrnative.so")


def _build() -> Optional[str]:
    if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
        return _OUT
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _OUT],
            check=True, capture_output=True, timeout=120)
        return _OUT
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build() if os.path.exists(_SRC) else None
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.edt_sq_3d.argtypes = [u8p, f64p] + [ctypes.c_int] * 3
        lib.signed_distance_3d.argtypes = [u8p, f32p] + [ctypes.c_int] * 3
        lib.contour_smooth_u8.argtypes = [u8p, u8p] + [ctypes.c_int] * 4
        for fn in (lib.edt_sq_3d, lib.signed_distance_3d, lib.contour_smooth_u8):
            fn.restype = None
        _LIB = lib
        return _LIB


def signed_distance_3d(pos: np.ndarray) -> Optional[np.ndarray]:
    """Native signed EDT of a (D,H,W) boolean foreground mask, or None."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos.astype(np.uint8))
    out = np.empty(pos.shape, np.float32)
    lib.signed_distance_3d(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        *map(int, pos.shape))
    return out


def contour_smooth(label: np.ndarray, ksize: int = 7) -> Optional[np.ndarray]:
    """Native per-slice Gaussian contour smoothening of a (D,H,W) uint8 mask,
    or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(label.astype(np.uint8))
    out = np.empty(src.shape, np.uint8)
    lib.contour_smooth_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        *map(int, src.shape), int(ksize))
    return out
