"""3-D DWT parity vs a torch oracle that reproduces the reference conv path.

The oracle builds the same grouped stride-2 conv3d / conv_transpose3d pipeline
the reference uses (wavelet_transform/Torch_Wavelet_Transform.py), with filter
banks from our own wavelets module (pywt is unavailable in this image).  It
exists purely as a test oracle for semantic parity of encode/decode, padding,
and un-padding — including odd spatial sizes and multi-level pyramids.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from latent_feature_grid_compression_tpu.wavelets import get_filter_bank, dwt_max_level
from latent_feature_grid_compression_tpu.ops.dwt import (
    WaveletFilter3d, WaveletFilterNd, encode_pyramid, decode_pyramid)


class TorchOracle3d:
    """Grouped-conv 3-D DWT with reference semantics (test oracle)."""

    def __init__(self, wavelet):
        fb = get_filter_bank(wavelet)
        self.L = fb.filter_length

        def ndim_filters(lo, hi):
            f1 = [torch.tensor(lo, dtype=torch.float32),
                  torch.tensor(hi, dtype=torch.float32)]
            out = [f.unsqueeze(0) for f in f1]
            for _ in range(2):
                f1 = [f.unsqueeze(-1) for f in f1]
                out = [a * b for a in f1 for b in out]
            return torch.stack(out, dim=0).unsqueeze(1)

        self.fwd = ndim_filters(fb.dec_lo[::-1].copy(), fb.dec_hi[::-1].copy())
        self.rev = ndim_filters(fb.rec_lo.copy(), fb.rec_hi.copy())

    def encode(self, data):
        shape = np.asarray(data.shape[-3:])
        base = (2 * self.L - 3) // 2
        pad = np.full(6, base, dtype=int)
        pad[1::2] += (shape % 2 == 1).astype(int)
        x = F.pad(data, tuple(pad), mode='constant')
        B, C = x.shape[:2]
        w = self.fwd.repeat(C, 1, 1, 1, 1)
        y = F.conv3d(x, w, stride=2, groups=C)
        return y.reshape(B, C, 8, *y.shape[2:]), shape

    def decode(self, coeffs, shape):
        B, C = coeffs.shape[:2]
        w = self.rev.repeat(C, 1, 1, 1, 1)
        y = F.conv_transpose3d(coeffs.flatten(1, 2), w, groups=C, stride=2)
        diff = np.asarray(y.shape[-3:]) - shape
        sl = [slice(None), slice(None)] + [
            slice(int(np.floor(d / 2)), -int(np.ceil(d / 2)) or None) for d in diff]
        return y[tuple(sl)]


@pytest.mark.parametrize('wavelet', ['db2', 'db3', 'haar'])
@pytest.mark.parametrize('size', [(16, 16, 16), (15, 15, 15), (15, 16, 17)])
def test_encode_matches_torch(wavelet, size):
    rng = np.random.default_rng(42)
    data = rng.standard_normal((2, 3, *size)).astype(np.float32)

    ours, shape_ours = WaveletFilter3d(wavelet).encode(jnp.asarray(data))
    theirs, shape_theirs = TorchOracle3d(wavelet).encode(torch.from_numpy(data))

    assert tuple(shape_ours) == tuple(shape_theirs)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


@pytest.mark.parametrize('wavelet', ['db2', 'haar'])
@pytest.mark.parametrize('size', [(16, 16, 16), (15, 15, 15), (15, 16, 17)])
def test_decode_matches_torch(wavelet, size):
    rng = np.random.default_rng(3)
    data = rng.standard_normal((1, 2, *size)).astype(np.float32)

    filt = WaveletFilter3d(wavelet)
    oracle = TorchOracle3d(wavelet)

    coeffs, shape = filt.encode(jnp.asarray(data))
    ours = filt.decode(coeffs, shape)
    theirs = oracle.decode(torch.from_numpy(np.asarray(coeffs)), np.asarray(size))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


@pytest.mark.parametrize('wavelet', ['db2', 'db4', 'haar'])
@pytest.mark.parametrize('size', [(16, 16, 16), (15, 15, 15), (17, 15, 16)])
def test_roundtrip(wavelet, size):
    """encode -> decode is the identity (orthogonal filters, reference's
    de-facto correctness test, tests/test.py:38-71)."""
    rng = np.random.default_rng(7)
    data = rng.standard_normal((1, 5, *size)).astype(np.float32)
    filt = WaveletFilter3d(wavelet)
    coeffs, shape = filt.encode(jnp.asarray(data))
    rec = filt.decode(coeffs, shape)
    np.testing.assert_allclose(np.asarray(rec), data, atol=1e-4)


@pytest.mark.parametrize('size', [(16, 16, 16), (15, 15, 15)])
def test_pyramid_roundtrip(size):
    rng = np.random.default_rng(11)
    vol = rng.standard_normal((5, *size)).astype(np.float32)
    filt = WaveletFilter3d('db2')
    coeffs, shapes = encode_pyramid(filt, jnp.asarray(vol))

    n_levels = min(dwt_max_level(s, 4) for s in size)
    assert len(coeffs) == n_levels + 1
    assert coeffs[0].ndim == 4                  # lowpass (C, *s)
    assert all(c.shape[1] == 7 for c in coeffs[1:])  # 7 detail subbands

    rec = decode_pyramid(filt, coeffs, shapes)
    np.testing.assert_allclose(np.asarray(rec), vol, atol=1e-4)


def test_pyramid_shapes_grid15():
    """grid_size=15 (shipped configs) exercises the odd-padding path."""
    vol = np.random.default_rng(0).standard_normal((16, 15, 15, 15)).astype(np.float32)
    filt = WaveletFilter3d('db2')
    coeffs, shapes = encode_pyramid(filt, jnp.asarray(vol))
    # 15 -> 9 -> 6 with db2; two levels (dwt_max_level(15,4)==2)
    assert coeffs[0].shape == (16, 6, 6, 6)
    assert coeffs[1].shape == (16, 7, 6, 6, 6)
    assert coeffs[2].shape == (16, 7, 9, 9, 9)
    assert shapes[0].tolist() == [9, 9, 9]
    assert shapes[1].tolist() == [15, 15, 15]


def test_decode_matmul_equals_decode_conv():
    """The separable-matmul inverse DWT (the shipped decode) must reproduce
    the transposed-conv formulation it was constructed from, for every
    filter family and odd/even shape."""
    rng = np.random.default_rng(0)
    for name in ['db2', 'db4', 'haar', 'bior4.4', 'sym4']:
        for dim, shape in [(1, (13,)), (2, (15, 10)), (3, (15, 15, 15)),
                           (3, (16, 12, 9))]:
            f = WaveletFilterNd(name, dim)
            x = rng.standard_normal((2, 3) + shape).astype(np.float32)
            y, s = f.encode(x)
            a = np.asarray(f.decode_conv(y, s))
            b = np.asarray(f._decode_matmul(y, s))
            assert np.abs(a - b).max() < 3e-6, (name, dim, shape)


def test_decode_window_equals_full_slice():
    """Grid-tile-local decode: a (start, length) window on the last axis must
    equal the same slice of the full decode to accumulation-order noise
    (the windowed operator computes the same dot products, but the narrower
    output changes XLA's contraction tiling, so f32 sums reassociate)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    for name in ['db2', 'haar', 'bior4.4']:
        for shape in [(15, 15, 15), (16, 12, 9)]:
            f = WaveletFilterNd(name, 3)
            x = rng.standard_normal((1, 4) + shape).astype(np.float32)
            y, s = f.encode(x)
            full = np.asarray(f.decode(y, s))
            for start, length in [(0, 5), (min(3, shape[2] - 7), 7),
                                  (shape[2] - 4, 4)]:
                win = np.asarray(f.decode(y, s, last_window=(start, length)))
                np.testing.assert_allclose(
                    win, full[..., start:start + length],
                    rtol=1e-6, atol=2e-6,
                    err_msg=f'{name} {shape} {start}+{length}')


def test_decode_pyramid_window():
    """decode_pyramid's last_window applies at the finest level only and
    matches the full pyramid decode slice."""
    from latent_feature_grid_compression_tpu.ops.dwt import (
        encode_pyramid, decode_pyramid)
    rng = np.random.default_rng(4)
    f = WaveletFilterNd('db2', 3)
    grid = rng.standard_normal((4, 15, 15, 15)).astype(np.float32)
    coeffs, shapes = encode_pyramid(f, grid)
    full = np.asarray(decode_pyramid(f, coeffs, shapes))
    win = np.asarray(decode_pyramid(f, coeffs, shapes, last_window=(4, 8)))
    np.testing.assert_allclose(win, full[..., 4:12], rtol=1e-6, atol=2e-6)
