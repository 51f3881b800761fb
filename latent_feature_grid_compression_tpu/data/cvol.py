"""Reader for fV-SRN ``.cvol`` volume files (reference: data/pyrendererSupport.py
delegates to the external pyrenderer C++ module; this is a from-scratch
implementation of the on-disk format so no renderer dependency is needed).

Format (fV-SRN Volume serialization):
  char[4]  magic "cvol"
  uint64   sizeX, sizeY, sizeZ
  double   voxelSizeX, voxelSizeY, voxelSizeZ
  uint32   datatype   (0 = uchar, 1 = ushort, 2 = float)
  uint32   flags      (bit 0: LZ4-block compressed slices)
  uint32   reserved
  pad with 0xff up to byte 64
  payload: raw voxels (x-fastest) or, if compressed, per-chunk
           [uint32 compressed_size][LZ4 block] slices.

LZ4 block decompression uses the native C++ helper when built
(native/liblfgc_io.so), else a pure-Python fallback.
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPES = {0: np.uint8, 1: np.uint16, 2: np.float32}
_HEADER_SIZE = 64


def _lz4_decompress_block_py(src: bytes, dst_size: int,
                             history: bytes = b'') -> bytes:
    """Minimal LZ4 block decompressor (pure Python fallback).

    ``history`` is the streaming dictionary (previous decoded chunks; cvol
    slices are compressed with LZ4 streaming mode so matches may reference
    the preceding slice's bytes).
    """
    dst = bytearray(history[-65536:])
    base = len(dst)
    dst_size += base
    i, n = 0, len(src)
    while i < n and len(dst) < dst_size:
        token = src[i]; i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]; i += 1
                lit_len += b
                if b != 255:
                    break
        dst += src[i:i + lit_len]
        i += lit_len
        if i >= n:
            break  # last literals-only sequence
        offset = src[i] | (src[i + 1] << 8); i += 2
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]; i += 1
                match_len += b
                if b != 255:
                    break
        start = len(dst) - offset
        if offset >= match_len:
            dst += dst[start:start + match_len]
        else:  # overlapping copy (RLE-style)
            for k in range(match_len):
                dst.append(dst[start + k])
    return bytes(dst[base:])


def _lz4_decompress_block(src: bytes, dst_size: int, history: bytes = b'') -> bytes:
    try:
        from ..native import lib as native_lib
        if native_lib.available():
            return native_lib.lz4_decompress(src, dst_size, history)
    except Exception:
        pass
    return _lz4_decompress_block_py(src, dst_size, history)


def read_cvol(filepath: str) -> np.ndarray:
    with open(filepath, 'rb') as f:
        header = f.read(_HEADER_SIZE)
        if header[:4] != b'cvol':
            raise ValueError(f"{filepath}: not a cvol file")
        sx, sy, sz = struct.unpack('<QQQ', header[4:28])
        datatype, flags = struct.unpack('<II', header[52:60])
        if datatype not in _DTYPES:
            raise ValueError(f"{filepath}: unknown cvol datatype {datatype}")
        dtype = _DTYPES[datatype]
        itemsize = np.dtype(dtype).itemsize
        n_bytes = sx * sy * sz * itemsize
        compressed = bool(flags & 1)
        if not compressed:
            raw = f.read(n_bytes)
            if len(raw) != n_bytes:
                raise ValueError(f"{filepath}: truncated payload")
        else:
            # per-slice chunks: z-slices of sx*sy voxels each
            chunk_bytes = sx * sy * itemsize
            parts = []
            remaining = n_bytes
            history = b''
            while remaining > 0:
                (csize,) = struct.unpack('<I', f.read(4))
                blob = f.read(csize)
                out_size = min(chunk_bytes, remaining)
                part = _lz4_decompress_block(blob, out_size, history)
                parts.append(part)
                history = (history + part)[-65536:]
                remaining -= out_size
            raw = b''.join(parts)
    vol = np.frombuffer(raw, dtype=dtype)
    # cvol stores x-fastest: linear index = x + sx*(y + sy*z)
    vol = vol.reshape(sz, sy, sx).transpose(2, 1, 0)
    return np.ascontiguousarray(vol)


def write_cvol(filepath: str, volume: np.ndarray, voxel_size=None):
    """Write an uncompressed cvol file (for tests / interchange)."""
    volume = np.asarray(volume)
    dt_map = {np.dtype(np.uint8): 0, np.dtype(np.uint16): 1,
              np.dtype(np.float32): 2}
    if volume.dtype not in dt_map:
        raise ValueError(f"unsupported dtype {volume.dtype}")
    sx, sy, sz = volume.shape
    if voxel_size is None:
        m = max(sx, sy, sz)
        voxel_size = (1.0 / m,) * 3
    header = b'cvol'
    header += struct.pack('<QQQ', sx, sy, sz)
    header += struct.pack('<ddd', *voxel_size)
    header += struct.pack('<III', dt_map[volume.dtype], 0, 0)
    header += b'\xff' * (_HEADER_SIZE - len(header))
    with open(filepath, 'wb') as f:
        f.write(header)
        f.write(np.ascontiguousarray(volume.transpose(2, 1, 0)).tobytes())
