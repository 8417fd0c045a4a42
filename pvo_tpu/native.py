"""ctypes loader for the native host-pipeline kernels (pvo_native.c).

Builds the shared library on first use (plain cc, no Python headers)
and exposes numpy-friendly wrappers with pure-numpy fallbacks, so the
framework works with or without a C toolchain. These accelerate the
host side of PQ/VPQ evaluation and the panoptic PNG codecs — the parts
the reference implemented in C++ (cocoeval.cpp) or hot numpy loops.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_SRC = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                "native", "pvo_native.c")
_LIB_PATH = osp.join(osp.dirname(_SRC), "libpvo_native.so")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not osp.exists(_LIB_PATH) or \
                os.stat(_SRC).st_mtime > os.stat(_LIB_PATH).st_mtime:
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH,
                 _SRC], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.rgb2id.argtypes = [u8p, u32p, ctypes.c_long]
        lib.id2rgb.argtypes = [u32p, u8p, ctypes.c_long]
        lib.pair_counts.argtypes = [i64p, i64p, ctypes.c_long,
                                    ctypes.c_int64, i64p, i64p,
                                    ctypes.c_long]
        lib.pair_counts.restype = ctypes.c_long
        lib.rgb_to_yuv420.argtypes = [u8p, u8p, ctypes.c_long,
                                      ctypes.c_long]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available():
    return _load() is not None


def rgb2id(rgb):
    lib = _load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if lib is None or rgb.ndim != 3:
        from pvo_tpu.utils.io import rgb2id as np_impl
        return np_impl(rgb)
    n = rgb.shape[0] * rgb.shape[1]
    out = np.empty(rgb.shape[:2], np.uint32)
    lib.rgb2id(rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n)
    return out


def id2rgb(ids):
    lib = _load()
    ids = np.ascontiguousarray(ids, np.uint32)
    if lib is None:
        from pvo_tpu.utils.io import id2rgb as np_impl
        return np_impl(ids)
    n = ids.size
    out = np.empty(ids.shape + (3,), np.uint8)
    lib.id2rgb(ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return out


def pair_counts(a, b, offset=2 ** 30, max_out=1 << 20):
    """Counts of combined keys a*offset+b. Returns (keys, counts)."""
    a = np.ascontiguousarray(a, np.int64).reshape(-1)
    b = np.ascontiguousarray(b, np.int64).reshape(-1)
    lib = _load()
    if lib is None:
        keys, counts = np.unique(a * offset + b, return_counts=True)
        return keys, counts.astype(np.int64)
    keys = np.empty(max_out, np.int64)
    counts = np.empty(max_out, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    n = lib.pair_counts(a.ctypes.data_as(i64p), b.ctypes.data_as(i64p),
                        len(a), offset, keys.ctypes.data_as(i64p),
                        counts.ctypes.data_as(i64p), max_out)
    if n < 0:
        keys, counts = np.unique(a * offset + b, return_counts=True)
        return keys, counts.astype(np.int64)
    order = np.argsort(keys[:n])
    return keys[:n][order], counts[:n][order]


def rgb_to_yuv420(img):
    """(H, W, 3) uint8 RGB -> (H*W*3//2,) uint8 planar YUV420, or
    None when the C library is unavailable (caller falls back to the
    numpy packer in utils/yuv.py)."""
    lib = _load()
    if lib is None or getattr(lib, "rgb_to_yuv420", None) is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    H, W = img.shape[:2]
    out = np.empty(H * W * 3 // 2, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rgb_to_yuv420(img.ctypes.data_as(u8p),
                      out.ctypes.data_as(u8p), H, W)
    return out
