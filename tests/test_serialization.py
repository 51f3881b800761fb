"""Checkpoint + binary container round-trips (byte layout & reconstruction)."""

import os
import struct

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from latent_feature_grid_compression_tpu.models import (
    make_spec, init_model, apply_model)
from latent_feature_grid_compression_tpu.io.checkpoint import (
    save_checkpoint, load_checkpoint)
from latent_feature_grid_compression_tpu.io.container import (
    store_model_parameters, restore_model, ints_to_bits_to_bytes,
    write_mask_bnr, read_mask_bnr, kmeans_quantization)


def test_bitpacking_roundtrip():
    """Reference probe tests/test.py:341-370 upgraded to an assert."""
    bits = np.array([1, 0, 0, 1, 0, 0, 1, 1, 1, 0, 1], dtype=np.uint8)
    path = '/tmp/test_mask.bnr'
    write_mask_bnr(bits, path)
    back = read_mask_bnr(path, len(bits))
    np.testing.assert_array_equal(back, bits)
    # byte content matches the reference's string-based packing
    with open(path, 'rb') as f:
        raw = f.read()
    bit_string = ''.join(str(b) for b in bits) + '0' * 5
    expected = bytes(int(bit_string[i:i + 8], 2) for i in range(0, 16, 8))
    assert raw == expected


def test_ints_to_bits_to_bytes_8bit():
    ints = [0, 1, 255, 128, 7]
    packed, leftover = ints_to_bits_to_bytes(ints, 8)
    assert not leftover
    assert bytes(packed) == bytes(ints)


def test_ints_to_bits_to_bytes_9bit():
    ints = [511, 0, 257]
    packed, leftover = ints_to_bits_to_bytes(ints, 9)
    bit_string = ''.join(format(v, '09b') for v in ints)
    assert leftover == (len(bit_string) % 8 > 0)
    # verify first full bytes
    for b in range(len(bit_string) // 8):
        assert packed[b] == int(bit_string[8 * b: 8 * b + 8], 2)


def test_kmeans_quantization_reconstruction():
    """Quantize->dequantize error is small (reference probe test.py:373-464)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32)
    labels, centers = kmeans_quantization(x, 256, seed=0)
    xq = centers[labels]
    mse = float(((x - xq) ** 2).mean())
    assert mse < 1e-3
    assert len(centers) == 256


def test_checkpoint_roundtrip():
    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2,
                     drop_type='smallify')
    params, aux = init_model(jax.random.key(0), spec)
    path = '/tmp/test_ckpt.npz'
    save_checkpoint(path, params, aux, 'smallify')

    params2, aux2 = init_model(jax.random.key(1), spec)
    params2, aux2 = load_checkpoint(path, params2, aux2)
    for a, b in zip(jax.tree.leaves((params, aux)), jax.tree.leaves((params2, aux2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_container_roundtrip_dense():
    """store -> restore preserves MLP (raw f32 exactly, quantized middle
    layers approximately) and grid values, and the forward passes agree."""
    spec = make_spec(grid_size=15, grid_features=8, hidden=32, num_layers=4)
    params, _ = init_model(jax.random.key(2), spec)
    # sparsify some coefficients so the mask path is exercised
    c0 = np.array(params.coeffs[1])
    c0[:, :3] = 0.0
    params = params.replace(
        coeffs=(params.coeffs[0], jnp.asarray(c0)) + params.coeffs[2:])

    path = '/tmp/test_container_bin'
    store_model_parameters(spec, params, path, kmeans_seed=0)
    spec2, params2 = restore_model(path)

    assert spec2.grid_size == spec.grid_size
    assert spec2.grid_features == spec.grid_features
    assert spec2.hidden == spec.hidden
    assert spec2.num_layers == spec.num_layers

    # first/last layers stored raw -> exact
    np.testing.assert_allclose(np.asarray(params2.mlp_w[0]),
                               np.asarray(params.mlp_w[0]), atol=0)
    np.testing.assert_allclose(np.asarray(params2.mlp_w[-1]),
                               np.asarray(params.mlp_w[-1]), atol=0)
    for b1, b2 in zip(params.mlp_b, params2.mlp_b):
        np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=0)

    # zero pattern preserved exactly through the .bnr mask
    for ca, cb in zip(params.coeffs, params2.coeffs):
        np.testing.assert_array_equal(np.asarray(ca) == 0, np.asarray(cb) == 0)

    # forward parity within quantization error
    coords = np.random.default_rng(3).uniform(-1, 1, (256, 3)).astype(np.float32)
    out1 = np.asarray(apply_model(spec, params, jnp.asarray(coords), train=False))
    out2 = np.asarray(apply_model(spec2, params2, jnp.asarray(coords), train=False))
    assert np.abs(out1 - out2).mean() < 0.05


def test_container_header_layout():
    """Byte-level header layout parity with model_utils.py:144-159."""
    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2)
    params, _ = init_model(jax.random.key(4), spec)
    path = '/tmp/test_container_hdr'
    store_model_parameters(spec, params, path, kmeans_seed=0)
    with open(path, 'rb') as f:
        hdr = f.read(9)
    n_layers, width, input_dim, d_in, d_out, bits, gsize, n_grids, fsize = \
        struct.unpack('BBBBBBBBB', hdr)
    assert n_layers == 2 and width == 16 and d_in == 3 and d_out == 1
    assert input_dim == spec.mlp_in and bits == 8
    assert gsize == 8 and n_grids == len(params.coeffs) and fsize == 4
    with open(path, 'rb') as f:
        f.seek(9)
        nonzeros = struct.unpack(f'{n_grids}I', f.read(4 * n_grids))
        zeros = struct.unpack(f'{n_grids}I', f.read(4 * n_grids))
    for c, nz, z in zip(params.coeffs, nonzeros, zeros):
        assert nz == int(np.count_nonzero(np.asarray(c)))
        assert z == int(np.asarray(c).size) - nz


def test_container_roundtrip_with_fully_pruned_levels():
    """A fully-pruned coefficient tensor (zero nonzeros) must store and
    restore cleanly — the k-means quantizer used to crash on empty input
    (found by a NAS trial with aggressive lambdas)."""
    import jax
    import jax.numpy as jnp
    from latent_feature_grid_compression_tpu.models import (make_spec,
                                                            init_model)
    spec = make_spec(grid_size=15, grid_features=20, hidden=18, num_layers=4)
    params, _ = init_model(jax.random.key(0), spec)
    for zero_all in (False, True):
        if zero_all:
            p = params.replace(coeffs=tuple(jnp.zeros_like(c)
                                            for c in params.coeffs))
        else:
            p = params.replace(coeffs=(jnp.zeros_like(params.coeffs[0]),)
                               + params.coeffs[1:])
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, 'bin')
            store_model_parameters(spec, p, path)
            assert os.path.exists(path + '_mask.bnr')
            spec2, p2 = restore_model(path)
        np.testing.assert_array_equal(np.asarray(p2.coeffs[0]), 0.0)
        for c, c2 in zip(p.coeffs, p2.coeffs):
            assert float(jnp.abs(c - c2).max()) < 0.05   # 8-bit quant error


@pytest.mark.parametrize('wavelet', ['none', 'haar'])
def test_container_roundtrip_nondefault_wavelet(wavelet, tmp_path):
    """Containers from haar/none-mode models restore when the caller passes
    the config's wavelet (the db2 default would rebuild the wrong pyramid
    — the bug infer.py hit on the r5 no-wavelet flagship run)."""
    spec = make_spec(grid_size=10, grid_features=4, hidden=16, num_layers=2,
                     wavelet=wavelet)
    params, _ = init_model(jax.random.key(3), spec)
    path = str(tmp_path / 'bin')
    store_model_parameters(spec, params, path, kmeans_seed=0)
    spec2, params2 = restore_model(path, wavelet=wavelet)
    assert spec2.num_levels == spec.num_levels
    assert len(params2.coeffs) == len(params.coeffs)
    for a, b in zip(params.coeffs, params2.coeffs):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=0.05)
    # db2 default must fail loudly, not restore garbage
    if wavelet == 'none':
        with pytest.raises(AssertionError):
            restore_model(path)
