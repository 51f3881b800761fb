"""Full model forward parity vs a torch oracle of the reference architecture.

The oracle rebuilds the reference forward pipeline (multi-level gated inverse
DWT -> grid_sample -> fourier concat -> SnakeAlt MLP, reference
model/Feature_Grid_Model.py:50-108) in torch, with parameters injected from
our JAX model — proving end-to-end semantic parity of the dense path.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from latent_feature_grid_compression_tpu.models import (
    make_spec, init_model, apply_model, decode_volume, num_net_params)
from tests.test_dwt import TorchOracle3d


def torch_forward(spec, params, coords, clamp=False):
    """Reference forward in torch with injected parameters."""
    oracle = TorchOracle3d(spec.wavelet)
    coeffs = [torch.from_numpy(np.asarray(c)) for c in params.coeffs]

    # decode_volume (Feature_Grid_Model.py:102-108)
    restored = coeffs[0].unsqueeze(0)                      # (1, C, s, s, s)
    for high, shape in zip(coeffs[1:], spec.level_shapes):
        data = torch.cat([restored.unsqueeze(2), high.unsqueeze(0)], dim=2)
        restored = oracle.decode(data, np.asarray(shape))
    grid = restored[0]

    # grid_sample fetch (Feature_Grid_Model.py:62-64)
    inp = torch.from_numpy(coords)
    g = inp.view(1, 1, 1, -1, 3)
    feats = F.grid_sample(grid.unsqueeze(0), g, mode='bilinear',
                          align_corners=False).squeeze().transpose(0, 1)

    # fourier embedding (Feature_Embedding.py:27-34)
    freq_bands = (2.0 ** torch.linspace(0., spec.n_freqs - 1, spec.n_freqs)) * 2.0 * np.pi
    parts = []
    for fq in freq_bands:
        parts.append(torch.sin(inp * fq))
        parts.append(torch.cos(inp * fq))
    emb = torch.cat(parts, dim=-1)

    x = torch.cat([inp, emb, feats], dim=-1)
    for w, b in zip(params.mlp_w[:-1], params.mlp_b[:-1]):
        x = x @ torch.from_numpy(np.asarray(w)) + torch.from_numpy(np.asarray(b))
        x = 0.5 * x + torch.sin(x) ** 2
    x = x @ torch.from_numpy(np.asarray(params.mlp_w[-1])) + torch.from_numpy(np.asarray(params.mlp_b[-1]))
    if clamp:
        x = x.clamp(-1, 1)
    return x.numpy()


@pytest.mark.parametrize('grid_size', [15, 16])
def test_dense_forward_matches_torch(grid_size):
    spec = make_spec(grid_size=grid_size, grid_features=8, hidden=32,
                     num_layers=4, n_freqs=2)
    params, _ = init_model(jax.random.key(0), spec)

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (513, 3)).astype(np.float32)

    ours = apply_model(spec, params, jnp.asarray(coords), train=True)
    theirs = torch_forward(spec, params, coords)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)


def test_eval_forward_clamps():
    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2)
    params, _ = init_model(jax.random.key(1), spec)
    coords = np.random.default_rng(1).uniform(-1, 1, (64, 3)).astype(np.float32)
    out = np.asarray(apply_model(spec, params, jnp.asarray(coords), train=False))
    assert out.min() >= -1.0 and out.max() <= 1.0
    theirs = torch_forward(spec, params, coords, clamp=True)
    np.testing.assert_allclose(out, theirs, atol=3e-5)


def test_decode_volume_roundtrips_init_grid():
    """decode(encode(grid)) == grid at init (orthogonal wavelets)."""
    spec = make_spec(grid_size=15, grid_features=4)
    key = jax.random.key(3)
    params, _ = init_model(key, spec)
    grid = decode_volume(spec, params)
    k_grid, _, _ = jax.random.split(key, 3)
    orig = jax.random.uniform(k_grid, (4, 15, 15, 15), jnp.float32)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(orig), atol=1e-4)


def test_mlp_input_width():
    spec = make_spec(grid_features=16, n_freqs=2)
    assert spec.mlp_in == 3 + 12 + 16      # d_in + 2*n_freqs*d_in + F


def test_num_net_params_counts_grid_and_mlp_only():
    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2,
                     drop_type='smallify')
    params, _ = init_model(jax.random.key(0), spec)
    n = num_net_params(params)
    expected = sum(c.size for c in params.coeffs)
    expected += sum(w.size for w in params.mlp_w) + sum(b.size for b in params.mlp_b)
    assert n == expected
    assert params.gates is not None  # gates exist but are excluded
