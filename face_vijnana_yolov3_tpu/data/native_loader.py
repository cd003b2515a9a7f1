"""ctypes bindings for the native batched JPEG loader (native/fvy_loader.cpp).

Builds the shared library on first use (g++ + system libjpeg) and falls back
cleanly when the toolchain or libjpeg is absent — callers check
`native_available()` and use the PIL path otherwise.

The native path decodes a whole batch into the device-letterbox staging buffer
layout directly: (n, max_h, max_w, 3) uint8, images packed top-left — the
format `FaceDetectorPipeline.detect_batch_fused` consumes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> "ctypes.CDLL | None":
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_lib_dir(), "libfvy_loader.so")
    src = os.path.join(_lib_dir(), "fvy_loader.cpp")
    if not os.path.exists(so):
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-ljpeg", "-o", so],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.fvy_jpeg_size.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.fvy_jpeg_size.restype = ctypes.c_int
    lib.fvy_decode_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.fvy_decode_jpeg_batch.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def jpeg_size(path: str) -> tuple[int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.fvy_jpeg_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"fvy_jpeg_size({path}) failed with {rc}")
    return h.value, w.value


def decode_batch_staged(
    paths: list[str],
    max_h: int | None = None,
    max_w: int | None = None,
    n_threads: int = 4,
):
    """Decode JPEGs into a (n, max_h, max_w, 3) uint8 staging buffer.

    Returns (staged, dims) where dims is (n, 2) int32 of per-image (h, w);
    a (0, 0) row marks a failed decode. max dims default to the batch maxima
    (one header pass).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    if max_h is None or max_w is None:
        sizes = [jpeg_size(p) for p in paths]
        max_h = max(s[0] for s in sizes)
        max_w = max(s[1] for s in sizes)
    staged = np.zeros((n, max_h, max_w, 3), np.uint8)
    dims = np.zeros((n, 2), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    errs = lib.fvy_decode_jpeg_batch(
        c_paths,
        n,
        staged.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        max_h,
        max_w,
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    if errs:
        bad = [paths[i] for i in range(n) if dims[i, 0] == 0]
        raise IOError(f"native decode failed for {errs} images: {bad[:3]}")
    return staged, dims
