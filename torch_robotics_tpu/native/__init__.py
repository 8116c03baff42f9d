"""Native (C++) runtime components, loaded via ctypes.

Build happens lazily on first use (g++ -O3 -shared); everything has a pure
numpy fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["KdTree", "native_available"]

_SRC = Path(__file__).resolve().parent / "kdtree.cpp"
_LIB = Path(__file__).resolve().parent / "_kdtree.so"
_lib_handle = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib_handle, _build_failed
    if _lib_handle is not None:
        return _lib_handle
    if _build_failed:
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                check=True, capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        _build_failed = True
        return None
    lib.kd_create.restype = ctypes.c_void_p
    lib.kd_create.argtypes = [ctypes.c_int]
    lib.kd_destroy.argtypes = [ctypes.c_void_p]
    lib.kd_insert.restype = ctypes.c_int
    lib.kd_insert.argtypes = [ctypes.c_void_p,
                              np.ctypeslib.ndpointer(np.float32)]
    lib.kd_nearest.restype = ctypes.c_int
    lib.kd_nearest.argtypes = [ctypes.c_void_p,
                               np.ctypeslib.ndpointer(np.float32)]
    lib.kd_size.restype = ctypes.c_int
    lib.kd_size.argtypes = [ctypes.c_void_p]
    lib.kd_get_point.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 np.ctypeslib.ndpointer(np.float32)]
    _lib_handle = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class KdTree:
    """Incremental nearest-neighbor structure (native kd-tree with numpy
    fallback)."""

    def __init__(self, dim: int):
        self.dim = dim
        self._lib = _load()
        if self._lib is not None:
            self._handle = self._lib.kd_create(dim)
            self._points = None
        else:
            self._handle = None
            self._points = []

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._handle:
            self._lib.kd_destroy(self._handle)
            self._handle = None

    def insert(self, point) -> int:
        p = np.ascontiguousarray(point, np.float32).reshape(self.dim)
        if self._lib is not None:
            return int(self._lib.kd_insert(self._handle, p))
        self._points.append(p)
        return len(self._points) - 1

    def nearest(self, query) -> int:
        q = np.ascontiguousarray(query, np.float32).reshape(self.dim)
        if self._lib is not None:
            return int(self._lib.kd_nearest(self._handle, q))
        pts = np.asarray(self._points)
        return int(np.argmin(np.linalg.norm(pts - q, axis=-1)))

    def get_point(self, i: int) -> np.ndarray:
        if self._lib is not None:
            out = np.empty(self.dim, np.float32)
            self._lib.kd_get_point(self._handle, int(i), out)
            return out
        return self._points[i]

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.kd_size(self._handle))
        return len(self._points)
