"""ctypes binding for the native loader (builds loader.cpp on first use)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_SO = os.path.join(_HERE, "_loader.so")
_lock = threading.Lock()
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO,
             "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.load_gray.restype = ctypes.c_int
        lib.load_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.prefetcher_create.restype = ctypes.c_void_p
        lib.prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.prefetcher_next.restype = ctypes.c_int
        lib.prefetcher_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.prefetcher_destroy.restype = None
        lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def load_gray(path: str, max_pixels: int = 4096 * 4096) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_pixels, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    n = lib.load_gray(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_pixels, ctypes.byref(w), ctypes.byref(h))
    if n <= 0:
        return None
    return buf[: n].reshape(h.value, w.value).copy()


class Prefetcher:
    """Background-thread image prefetch over a fixed file list."""

    def __init__(self, paths: List[str], width: int, height: int, depth: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._w, self._h = width, height
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.prefetcher_create(arr, len(paths), width, height, depth)
        self._n = len(paths)

    def __iter__(self):
        buf = np.empty(self._h * self._w, np.float32)
        for _ in range(self._n):
            ok = self._lib.prefetcher_next(
                self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if not ok:
                break
            yield buf.reshape(self._h, self._w).copy()

    def close(self):
        if self._handle:
            self._lib.prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
