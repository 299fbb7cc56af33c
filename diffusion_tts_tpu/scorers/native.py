"""ctypes bindings for the native runtime (native/libdtts_native.so).

Auto-builds with the in-tree Makefile on first use (g++ + libjpeg are part
of the base image); falls back cleanly when unavailable so pure-Python
paths keep working.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdtts_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, text=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.dtts_jpeg_sizes.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ]
            lib.dtts_jpeg_sizes.restype = None
            lib.dtts_native_abi_version.restype = ctypes.c_int
            if lib.dtts_native_abi_version() != 1:
                return None
            _lib = lib
        except OSError:
            return None
        return _lib


def native_available() -> bool:
    return _load() is not None


def jpeg_sizes(images_uint8: np.ndarray, quality: int = 80, n_threads: int = 0) -> np.ndarray:
    """Batched JPEG compressed sizes via libjpeg. images [N,H,W,C] uint8
    contiguous; returns int32 [N]. Raises if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (build native/ with make)")
    imgs = np.ascontiguousarray(images_uint8, dtype=np.uint8)
    assert imgs.ndim == 4
    n, h, w, c = imgs.shape
    out = np.zeros(n, np.int32)
    lib.dtts_jpeg_sizes(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c, quality,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return out


__all__ = ["jpeg_sizes", "native_available"]
