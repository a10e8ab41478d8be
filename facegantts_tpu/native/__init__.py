"""ctypes bindings for the native C++ kernels (built lazily with make)."""

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None


def _build() -> str:
    lib = os.path.join(_DIR, "libmas.so")
    src = os.path.join(_DIR, "mas.cpp")
    if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    return lib


def load() -> ctypes.CDLL:
    """Build (if stale) and load the native library."""
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        lib.mas_maximum_path.restype = None
        lib.mas_maximum_path.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
        ]
        _LIB = lib
    return _LIB


def maximum_path_native(value: np.ndarray, mask: np.ndarray, max_neg_val: float = -1e9) -> np.ndarray:
    """Host-side MAS over a batch: (B, T_x, T_y) log-prior + mask -> 0/1 paths."""
    lib = load()
    values = np.ascontiguousarray(value, dtype=np.float32).copy()
    mask = np.asarray(mask)
    b, t_x, t_y = values.shape
    paths = np.zeros((b, t_x, t_y), dtype=np.int32)
    t_xs = np.ascontiguousarray(mask[:, :, 0].sum(-1), dtype=np.int32)
    t_ys = np.ascontiguousarray(mask[:, 0, :].sum(-1), dtype=np.int32)
    lib.mas_maximum_path(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b,
        t_x,
        t_y,
        max_neg_val,
    )
    return paths
