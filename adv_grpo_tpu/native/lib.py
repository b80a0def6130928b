"""ctypes loader for the native host helpers, with pure-Python fallbacks."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libadvgrpo_native.so")
    if not os.path.exists(path):
        try:  # best-effort local build; fallback stays available
            subprocess.run(["sh", os.path.join(os.path.dirname(__file__), "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.levenshtein.restype = ctypes.c_int64
        lib.levenshtein.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.c_char_p, ctypes.c_int64]
        lib.chw_float_to_hwc_u8.restype = None
        lib.chw_float_to_hwc_u8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        try:
            lib.load_images_chw.restype = None
            lib.load_images_chw.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
        except AttributeError:  # stale .so without the image loader
            pass
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def levenshtein(a: str, b: str) -> int:
    lib = _load()
    ab, bb = a.encode(), b.encode()
    if lib is not None:
        return int(lib.levenshtein(ab, len(ab), bb, len(bb)))
    # Python fallback
    if not ab:
        return len(bb)
    prev = list(range(len(bb) + 1))
    for i, ca in enumerate(ab, 1):
        cur = [i]
        for j, cb in enumerate(bb, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def images_to_uint8(images: np.ndarray) -> np.ndarray:
    """float32 (N, C, H, W) in [-1, 1] -> uint8 (N, H, W, C)."""
    images = np.ascontiguousarray(images, dtype=np.float32)
    n, c, h, w = images.shape
    lib = _load()
    if lib is not None:
        out = np.empty((n, h, w, c), dtype=np.uint8)
        lib.chw_float_to_hwc_u8(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, c, h, w,
        )
        return out
    x = np.clip(images * 0.5 + 0.5, 0, 1)
    return (x.transpose(0, 2, 3, 1) * 255).astype(np.uint8)


def load_images_chw(paths, resolution: int, n_threads: int = 0):
    """Decode + PIL-style bicubic resize a batch of image files across a C++
    thread pool (native/image_loader.cpp). Returns (images, ok):
    images float32 (N, 3, R, R) in [-1, 1], ok bool (N) — failed slots are
    zeros with ok=False (caller supplies fallbacks). Returns None when the
    native library is unavailable (callers keep their PIL path)."""
    lib = _load()
    if lib is None or not hasattr(lib, "load_images_chw"):
        return None
    n = len(paths)
    out = np.zeros((n, 3, resolution, resolution), np.float32)
    ok = np.zeros((n,), np.uint8)
    if n == 0:
        return out, ok.astype(bool)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.load_images_chw(arr, n, resolution,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        n_threads)
    return out, ok.astype(bool)
