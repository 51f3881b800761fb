"""ctypes bindings for the native IO runtime (liblfgc_io.so).

Builds on demand with g++ (cached next to the source); every entry point has
a pure-Python/numpy fallback at its call site, so the package works without a
compiler too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'lfgc_io.cpp')
_SO = os.path.join(_HERE, 'liblfgc_io.so')

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _SO],
            check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.lfgc_lz4_decompress.restype = ctypes.c_int64
        lib.lfgc_lz4_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.lfgc_pack_bits.restype = ctypes.c_int64
        lib.lfgc_pack_bits.argtypes = [i64p, ctypes.c_int64, ctypes.c_int32, u8p]
        lib.lfgc_unpack_bits.restype = None
        lib.lfgc_unpack_bits.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32, i64p]
        lib.lfgc_pack_mask.restype = ctypes.c_int64
        lib.lfgc_pack_mask.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.lfgc_unpack_mask.restype = None
        lib.lfgc_unpack_mask.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.lfgc_kmeans_1d.restype = None
        lib.lfgc_kmeans_1d.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def lz4_decompress(src: bytes, dst_size: int, history: bytes = b'') -> bytes:
    lib = _load()
    dst = (ctypes.c_uint8 * dst_size)()
    n = lib.lfgc_lz4_decompress(src, len(src), dst, dst_size,
                                history, len(history))
    if n < 0:
        raise ValueError('malformed LZ4 block')
    return bytes(bytearray(dst)[:n])


def pack_bits(values: np.ndarray, n_bits: int) -> bytes:
    lib = _load()
    v = np.ascontiguousarray(values, dtype=np.int64)
    n_bytes = (len(v) * n_bits + 7) // 8
    out = np.zeros(n_bytes, dtype=np.uint8)
    lib.lfgc_pack_bits(v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                       len(v), n_bits,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()


def unpack_bits(packed: bytes, n: int, n_bits: int) -> np.ndarray:
    lib = _load()
    p = np.frombuffer(packed, dtype=np.uint8)
    out = np.zeros(n, dtype=np.int64)
    lib.lfgc_unpack_bits(p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         n, n_bits,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def kmeans_1d(data: np.ndarray, k: int, max_iter: int = 100,
              seed: int = 0):
    """Native 1-D k-means; returns (labels, centers)."""
    lib = _load()
    x = np.ascontiguousarray(data, dtype=np.float32).reshape(-1)
    if len(x) == 0 or k < 1:   # the C kernel assumes n >= k >= 1
        return np.zeros(0, dtype=np.int64), np.zeros(max(k, 0), np.float32)
    centers = np.zeros(k, dtype=np.float32)
    labels = np.zeros(len(x), dtype=np.int32)
    lib.lfgc_kmeans_1d(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       len(x), k, max_iter, seed,
                       centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels.astype(np.int64), centers
