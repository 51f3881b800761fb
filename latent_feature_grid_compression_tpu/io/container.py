"""Packed binary model container + ``_mask.bnr`` sparsity mask.

Byte-compatible re-implementation of the reference's export format
(model/model_utils.py:120-332):

  header:  struct 'B' x 9  (n_layers, layer_width, input_dim, d_in,
           output_dim, bit_precision, grid_size, n_grids, feature_size)
           + 'I' x n_grids nonzero counts + 'I' x n_grids zero counts
  MLP:     first layer weight+bias raw f32 (torch (out,in) row-major layout);
           middle layers k-means(2^bits)-quantized weights (centers f32 +
           bit-packed labels) with raw f32 biases; last layer raw f32
  grids:   per-tensor nonzero mask bits -> <file>_mask.bnr; nonzero values
           k-means-quantized like the middle layers

k-means uses sklearn (n_clusters=2^bits, n_init=4), matching
model_utils.py:73-76.  Weights are converted to/from torch's (out, in) layout
at the container boundary so files interchange with the reference.
"""

from __future__ import annotations

import math
import struct
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.feature_grid import ModelSpec, ModelParams, make_spec, init_model
import jax


def kmeans_quantization(values: np.ndarray, n_clusters: int, seed=None):
    """1-D k-means -> (labels, centers) (model_utils.py:73-76).

    Uses the native C++ k-means (k-means++ + Lloyd on sorted data) when built
    — faster than sklearn at equal quantization MSE; set LFGC_KMEANS=sklearn
    to force the sklearn path (n_init=4, the reference's call).

    Degenerate guard (absent in the reference, which crashes): when there are
    fewer samples than clusters, fit with n_samples clusters and zero-pad the
    centers so the byte layout stays fixed.
    """
    import os
    x = np.asarray(values, dtype=np.float32).reshape(-1)
    if len(x) == 0:
        # a fully-pruned tensor has no nonzeros to quantize: fixed-layout
        # zero centers, no labels (the native/sklearn paths both crash on
        # empty input — found by a NAS trial with aggressive lambdas)
        return (np.zeros(0, dtype=np.int64),
                np.zeros(n_clusters, dtype=np.float32))
    k = min(n_clusters, len(np.unique(x)))
    if os.environ.get('LFGC_KMEANS') != 'sklearn':
        try:
            from ..native import lib as native_lib
            if native_lib.available():
                labels, centers = native_lib.kmeans_1d(
                    x, k, seed=0 if seed is None else seed)
                if k < n_clusters:
                    centers = np.pad(centers, (0, n_clusters - k))
                return labels, centers.astype(np.float32)
        except Exception:
            pass
    from sklearn.cluster import KMeans
    km = KMeans(n_clusters=k, n_init=4, random_state=seed).fit(x.reshape(-1, 1))
    labels = km.labels_.astype(np.int64)
    centers = km.cluster_centers_.reshape(-1).astype(np.float32)
    if k < n_clusters:
        centers = np.pad(centers, (0, n_clusters - k))
    return labels, centers


def ints_to_bits_to_bytes(all_ints, n_bits: int) -> Tuple[bytearray, bool]:
    """Big-endian fixed-width bit packing (model_utils.py:79-90 semantics).

    Fast paths: raw bytes for n_bits=8, the native C++ packer otherwise;
    string-based fallback preserves exact reference behavior (including the
    right-aligned trailing partial byte)."""
    leftover = (len(all_ints) * n_bits) % 8 > 0
    if n_bits == 8:
        return bytearray(int(v) for v in all_ints), False
    try:
        from ..native import lib as native_lib
        if native_lib.available():
            packed = native_lib.pack_bits(np.asarray(all_ints, np.int64), n_bits)
            return bytearray(packed), leftover
    except Exception:
        pass
    bit_string = ''.join(format(int(v), f'0{n_bits}b') for v in all_ints)
    n_bytes = len(bit_string) // 8
    out = bytearray()
    for b in range(n_bytes):
        out.append(int(bit_string[8 * b: 8 * b + 8], 2))
    if leftover:
        out.append(int(bit_string[8 * n_bytes:], 2))
    return out, leftover


def write_mask_bnr(mask_bits: np.ndarray, filename: str):
    """Bit-pack a 0/1 array -> .bnr (model_utils.py:93-107; trailing zero pad)."""
    packed = np.packbits(mask_bits.astype(np.uint8))
    with open(filename, 'wb') as f:
        f.write(packed.tobytes())


def read_mask_bnr(filename: str, num_bits: int) -> np.ndarray:
    """Read .bnr -> 0/1 uint8 array of length >= num_bits (model_utils.py:110-117)."""
    n_bytes = (num_bits + 7) // 8
    with open(filename, 'rb') as f:
        raw = np.frombuffer(f.read(n_bytes), dtype=np.uint8)
    return np.unpackbits(raw)[:num_bits]


def _torch_layout(w: np.ndarray) -> np.ndarray:
    """our (in, out) -> torch (out, in) flattened."""
    return np.ascontiguousarray(np.asarray(w).T)


def store_model_parameters(spec: ModelSpec, params: ModelParams, filename: str,
                           bit_precision: int = 8, kmeans_seed=None):
    """Serialize to the packed container + _mask.bnr (model_utils.py:120-219)."""
    n_clusters = int(math.pow(2, bit_precision))
    coeffs = [np.asarray(c) for c in params.coeffs]
    weights = [_torch_layout(w) for w in params.mlp_w]
    biases = [np.asarray(b) for b in params.mlp_b]

    with open(filename, 'wb') as f:
        # header
        f.write(struct.pack('B', spec.num_layers))
        f.write(struct.pack('B', spec.hidden))
        f.write(struct.pack('B', spec.mlp_in))
        f.write(struct.pack('B', spec.d_in))
        f.write(struct.pack('B', spec.d_out))
        f.write(struct.pack('B', bit_precision))
        f.write(struct.pack('B', spec.grid_size))
        f.write(struct.pack('B', len(coeffs)))
        f.write(struct.pack('B', spec.grid_features))
        for c in coeffs:
            f.write(struct.pack('I', int(np.count_nonzero(c))))
        for c in coeffs:
            f.write(struct.pack('I', int(c.size - np.count_nonzero(c))))

        def write_raw(arr):
            f.write(np.asarray(arr, dtype='<f4').reshape(-1).tobytes())

        def write_quantized(arr):
            flat = np.asarray(arr, dtype=np.float32).reshape(-1)
            labels, centers = kmeans_quantization(flat, n_clusters, kmeans_seed)
            f.write(centers.astype('<f4').tobytes())
            packed, _ = ints_to_bits_to_bytes(labels, bit_precision)
            f.write(bytes(packed))
            if bit_precision % 8 != 0:
                # non-byte-aligned: last label re-written as u32
                # (model_utils.py:179-181)
                f.write(struct.pack('I',
                                    int(labels[-1]) if len(labels) else 0))

        # MLP: first raw, middle quantized, last raw
        write_raw(weights[0]); write_raw(biases[0])
        for w, b in zip(weights[1:-1], biases[1:-1]):
            write_quantized(w)
            write_raw(b)
        write_raw(weights[-1]); write_raw(biases[-1])

        # grids: mask bits + quantized nonzeros
        mask_bits = []
        for c in coeffs:
            flat = c.reshape(-1)
            mask_bits.append((flat != 0.0).astype(np.uint8))
            nz = flat[flat != 0.0]
            write_quantized(nz)

    write_mask_bnr(np.concatenate(mask_bits), filename + '_mask.bnr')


def restore_model(filename: str, wavelet: str = 'db2'):
    """Rebuild (spec, params) from a packed container (model_utils.py:222-332).

    The architecture not stored in the header is fixed to the reference's
    defaults: fourier embedding with 2 bands, db2 wavelet, no gates
    (model_utils.py:309-313).  ``wavelet`` overrides the db2 default —
    callers that hold the experiment config (infer.py) pass its
    wavelet_filter so haar/bior/none-mode containers restore with the right
    pyramid shapes (the reference cannot: its restore has no config)."""
    with open(filename, 'rb') as f:
        def rd(fmt, n):
            return struct.unpack(fmt, f.read(n))

        n_layers = rd('B', 1)[0]
        layer_width = rd('B', 1)[0]
        input_dim = rd('B', 1)[0]
        input_channel = rd('B', 1)[0]
        output_dim = rd('B', 1)[0]
        bit_precision = rd('B', 1)[0]
        n_clusters = int(math.pow(2, bit_precision))
        grid_size = rd('B', 1)[0]
        n_grids = rd('B', 1)[0]
        feature_size = rd('B', 1)[0]
        nonzeros = [rd('I', 4)[0] for _ in range(n_grids)]
        zeros = [rd('I', 4)[0] for _ in range(n_grids)]

        def read_raw(n):
            return np.frombuffer(f.read(4 * n), dtype='<f4').copy()

        def read_quantized(n_weights):
            centers = read_raw(n_clusters)
            weight_size = (n_weights * bit_precision) // 8
            if (n_weights * bit_precision) % 8 != 0:
                weight_size += 1
            raw = f.read(weight_size)
            if bit_precision == 8:
                idx = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            else:
                try:
                    from ..native import lib as native_lib
                    assert native_lib.available()
                    idx = native_lib.unpack_bits(raw, n_weights, bit_precision)
                except Exception:
                    bits = ''.join(format(byte, '08b') for byte in raw)
                    idx = np.array(
                        [int(bits[bit_precision * i: bit_precision * (i + 1)], 2)
                         for i in range(n_weights)], dtype=np.int64)
            if bit_precision % 8 != 0:
                idx = idx.copy()
                idx[-1] = struct.unpack('I', f.read(4))[0]
            return centers[idx]

        weights, biases = [], []
        weights.append(read_raw(input_dim * layer_width))
        biases.append(read_raw(layer_width))
        for _ in range(n_layers - 1):
            weights.append(read_quantized(layer_width * layer_width))
            biases.append(read_raw(layer_width))
        weights.append(read_raw(output_dim * layer_width))
        biases.append(read_raw(output_dim))

        grid_values = [read_quantized(n) for n in nonzeros]

    total_bits = sum(nonzeros) + sum(zeros)
    mask = read_mask_bnr(filename + '_mask.bnr', total_bits)

    # re-insert zeros positionally (model_utils.py:298-306)
    grids = []
    ptr = 0
    for nz, z, vals in zip(nonzeros, zeros, grid_values):
        n = nz + z
        m = mask[ptr:ptr + n].astype(bool)
        full = np.zeros(n, dtype=np.float32)
        full[m] = vals[:int(m.sum())]
        grids.append(full)
        ptr += n

    # rebuild with reference defaults and patch parameters
    spec = make_spec(d_in=input_channel, hidden=layer_width,
                     d_out=output_dim, num_layers=n_layers,
                     n_freqs=2, grid_features=feature_size,
                     grid_size=grid_size, wavelet=wavelet, drop_type='')
    params, _ = init_model(jax.random.key(0), spec)
    assert len(params.coeffs) == n_grids, (len(params.coeffs), n_grids)

    coeffs = tuple(jnp.asarray(g.reshape(c.shape))
                   for g, c in zip(grids, params.coeffs))
    # container stores torch (out, in) layout; ours is (in, out)
    mlp_w = tuple(jnp.asarray(w.reshape(ref.shape[1], ref.shape[0]).T)
                  for w, ref in zip(weights, params.mlp_w))
    mlp_b = tuple(jnp.asarray(b.reshape(bb.shape))
                  for b, bb in zip(biases, params.mlp_b))
    params = params.replace(coeffs=coeffs, mlp_w=mlp_w, mlp_b=mlp_b)
    return spec, params
