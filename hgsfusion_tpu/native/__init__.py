"""Native (C++) runtime components, bound via ctypes.

The reference ships CUDA/numba kernels for its offline evaluators
(rotate_iou.py devRotateIoUEval and the njit rotate_iou_cpu.py copy); here
the equivalent is a small C++ shared object compiled on first use with the
system g++ (pybind11 is not available in this toolchain, so the binding is a
plain `extern "C"` surface + ctypes). Falls back cleanly to the pure-numpy
implementation when no compiler is present.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_SRC_DIR = pathlib.Path(__file__).parent / "src"
_BUILD_DIR = pathlib.Path(__file__).parent / "_build"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    """Compile src/rotate_iou.cc -> _build/librotate_iou.so and dlopen it."""
    so = _BUILD_DIR / "librotate_iou.so"
    src = _SRC_DIR / "rotate_iou.cc"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        _BUILD_DIR.mkdir(exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(src), "-o", str(so)],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(str(so))
    lib.rotate_iou_eval.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    lib.rotate_iou_eval.restype = None
    return lib


def _get_lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LOCK:
            if _LIB is None and not _TRIED:
                _TRIED = True
                try:
                    _LIB = _build_and_load()
                except Exception:  # no g++ / sandboxed build: numpy fallback
                    _LIB = None
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def rotate_iou_native(boxes, query_boxes, criterion: int = -1):
    """C++ rotated-overlap; same contract as rotated_iou_np.rotate_iou_eval.

    Returns None when the native library is unavailable (caller falls back).
    """
    lib = _get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(boxes, np.float64)
    b = np.ascontiguousarray(query_boxes, np.float64)
    n, m = a.shape[0], b.shape[0]
    out = np.empty((n, m), np.float64)
    if n and m:
        lib.rotate_iou_eval(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
            int(criterion),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
    return out
