"""Parity of the one-kernel fused forward (ops/fused_forward.py) against the
unfused reference path (grid_sample + fourier embed + SnakeAlt MLP), run in
Pallas interpret mode on CPU.  Semantics under test: reference
model/Feature_Grid_Model.py:50-80."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from latent_feature_grid_compression_tpu.ops.fused_forward import fused_forward
from latent_feature_grid_compression_tpu.ops.interpolation import grid_sample_3d
from latent_feature_grid_compression_tpu.ops.embedding import fourier_embed
from latent_feature_grid_compression_tpu.ops.mlp import (init_mlp, mlp_apply,
                                                         snake_alt)


def _setup(C=8, G=9, N=200, n_freqs=2, hidden=16, n_layers=3, d_out=1, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((C, G, G, G)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (N, 3)).astype(np.float32))
    ws, bs = init_mlp(jax.random.key(seed), 3 + 2 * n_freqs * 3 + C,
                      hidden, d_out, n_layers)
    return feats, coords, tuple(ws), tuple(bs), n_freqs


def _ref(feats, coords, ws, bs, n_freqs):
    f = grid_sample_3d(feats, coords)
    x = jnp.concatenate([coords, fourier_embed(coords, n_freqs), f], axis=-1)
    return mlp_apply(list(ws), list(bs), x, snake_alt)


def _fused(feats, coords, ws, bs, n_freqs):
    return fused_forward(feats, coords, ws, bs, n_freqs,
                         interpret=True, block_n=128)


def test_forward_matches_unfused():
    feats, coords, ws, bs, nf = _setup()
    out_ref = _ref(feats, coords, ws, bs, nf)
    out = _fused(feats, coords, ws, bs, nf)
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=5e-5, rtol=1e-4)


def test_forward_out_of_range_zero_padding():
    # coords far outside [-1, 1]: every hat weight is zero -> features are 0,
    # matching torch grid_sample padding_mode='zeros'
    feats, _, ws, bs, nf = _setup()
    coords = jnp.asarray(np.full((64, 3), 3.5, np.float32))
    out_ref = _ref(feats, coords, ws, bs, nf)
    out = _fused(feats, coords, ws, bs, nf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize('seed', [0, 1])
def test_gradients_match_unfused(seed):
    feats, coords, ws, bs, nf = _setup(seed=seed)

    def loss_ref(args):
        return jnp.sum(jnp.sin(_ref(args[0], coords, args[1], args[2], nf)))

    def loss_fused(args):
        return jnp.sum(jnp.sin(_fused(args[0], coords, args[1], args[2], nf)))

    g_ref = jax.grad(loss_ref)((feats, ws, bs))
    g = jax.grad(loss_fused)((feats, ws, bs))
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        scale = float(jnp.abs(b).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-4)


def test_multi_output_head():
    feats, coords, ws, bs, nf = _setup(d_out=4)
    out_ref = _ref(feats, coords, ws, bs, nf)
    out = _fused(feats, coords, ws, bs, nf)
    assert out.shape == (coords.shape[0], 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=5e-5, rtol=1e-4)


def test_apply_model_fused_backend_matches_xla():
    from latent_feature_grid_compression_tpu.models import (make_spec,
                                                            init_model,
                                                            apply_model)
    import dataclasses
    spec = make_spec(grid_size=9, grid_features=8, hidden=16, num_layers=3,
                     interp_backend='xla')
    params, _ = init_model(jax.random.key(0), spec)
    coords = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (150, 3)).astype(np.float32))
    out_x = apply_model(spec, params, coords, train=False)
    spec_f = dataclasses.replace(spec, interp_backend='fused')
    # interpret mode is selected inside fused_forward only via the flag; on
    # CPU force it by monkeypatching through the public entry
    from latent_feature_grid_compression_tpu.ops import fused_forward as FF
    orig = FF.fused_forward
    try:
        FF.fused_forward = lambda *a, **k: orig(*a, **{**k, 'interpret': True})
        out_f = apply_model(spec_f, params, coords, train=False)
    finally:
        FF.fused_forward = orig
    # apply_model selects precision='mixed' (single-pass bf16 MLP, the XLA
    # path's effective TPU default); the CPU reference here is true f32, so
    # the bound is bf16-matmul noise, not kernel error (the 'f32' kernel
    # mode is held to 5e-5 in the direct parity tests above)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-3, rtol=1e-2)
