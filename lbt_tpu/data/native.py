"""ctypes binding for the C++ data loader (native/loader.cc).

Builds the shared library on first use (g++ available in the image;
pybind11 is not, so the binding is a plain C ABI + ctypes).  Falls back
gracefully — callers should treat ``NativeLoader.available()`` as a
capability probe and use the numpy pipeline otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "loader.cc")
_LIB = os.path.join(_REPO, "native", "liblbt_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SRC):
            _build_failed = True
            return None
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            try:
                subprocess.run(
                    ["make", "-C", os.path.dirname(_SRC)],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.lbt_loader_create.restype = ctypes.c_void_p
        lib.lbt_loader_create.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int,
        ]
        lib.lbt_loader_start_epoch.argtypes = [
            ctypes.c_void_p, ctypes.c_int]
        lib.lbt_loader_next.restype = ctypes.c_int
        lib.lbt_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.lbt_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeLoader:
    """Shuffled, augmented, drop-remainder batches produced by the C++
    pipeline (one batch of lookahead, OpenMP inner parallelism)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, *, pad: int = 0, flip: bool = False,
                 seed: int = 0, n_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        assert images.ndim == 4, "images must be NHWC"
        self._lib = lib
        # keep C-contiguous f32/i32 copies alive for the C side
        self._x = np.ascontiguousarray(images, np.float32)
        self._y = np.ascontiguousarray(labels, np.int32)
        n, h, w, c = self._x.shape
        self.batch_size = batch_size
        self.shape = (h, w, c)
        self._out_x = np.empty((batch_size, h, w, c), np.float32)
        self._out_y = np.empty((batch_size,), np.int32)
        self._handle = lib.lbt_loader_create(
            self._x.ctypes.data_as(ctypes.c_void_p),
            self._y.ctypes.data_as(ctypes.c_void_p),
            n, h, w, c, batch_size, pad, int(flip),
            ctypes.c_uint64(seed), n_threads,
        )

    @staticmethod
    def available() -> bool:
        return _load() is not None

    def epoch(self, epoch: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        self._lib.lbt_loader_start_epoch(self._handle, epoch)
        while True:
            cnt = self._lib.lbt_loader_next(
                self._handle,
                self._out_x.ctypes.data_as(ctypes.c_void_p),
                self._out_y.ctypes.data_as(ctypes.c_void_p),
            )
            if cnt == 0:
                return
            # copies: the internal buffers are reused for the next batch
            yield self._out_x.copy(), self._out_y.copy()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.lbt_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
