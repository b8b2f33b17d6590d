"""ctypes bindings for the native batch loader (native/batch_loader.cpp).

Auto-builds the shared object with g++ on first use when possible; all
entry points degrade to numpy when the library is unavailable, so nothing
in the pipeline hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libgifloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["sh", os.path.join(_LIB_DIR, "build.sh")],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.gif_assemble_batch.restype = ctypes.c_int
        lib.gif_assemble_batch.argtypes = [
            ctypes.c_void_p,  # images
            ctypes.c_int64,  # n_images
            ctypes.c_int64,  # h
            ctypes.c_int64,  # w
            ctypes.c_int64,  # c
            ctypes.c_void_p,  # indices
            ctypes.c_int64,  # batch
            ctypes.c_void_p,  # flip (nullable)
            ctypes.c_void_p,  # out
            ctypes.c_int64,  # n_threads
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def assemble_batch(
    images: np.ndarray,
    indices: np.ndarray,
    flip: np.ndarray | None = None,
    n_threads: int = 8,
) -> np.ndarray:
    """Gather + normalize uint8 NHWC rows to float32 [-1, 1].

    Falls back to numpy when the native library is missing.
    """
    images = np.ascontiguousarray(images)
    assert images.dtype == np.uint8 and images.ndim == 4
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    batch = len(idx)
    n, h, w, c = images.shape
    lib = _load()
    if lib is not None:
        out = np.empty((batch, h, w, c), np.float32)
        flip_arr = (
            np.ascontiguousarray(flip, dtype=np.uint8) if flip is not None else None
        )
        rc = lib.gif_assemble_batch(
            images.ctypes.data_as(ctypes.c_void_p),
            n,
            h,
            w,
            c,
            idx.ctypes.data_as(ctypes.c_void_p),
            batch,
            flip_arr.ctypes.data_as(ctypes.c_void_p) if flip_arr is not None else None,
            out.ctypes.data_as(ctypes.c_void_p),
            n_threads,
        )
        if rc == 0:
            return out
        if rc == 2:
            raise IndexError("batch index out of range")
    # numpy fallback
    out = images[idx].astype(np.float32) / 127.5 - 1.0
    if flip is not None:
        f = np.asarray(flip, bool)
        out[f] = out[f, :, ::-1]
    return out
