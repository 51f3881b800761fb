"""Interpolation parity vs torch oracles (grid_sample + reference GT interp)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from latent_feature_grid_compression_tpu.ops.interpolation import (
    grid_sample_3d, trilinear_interpolate, gather_volume)


def torch_grid_sample(features, coords):
    """The exact call pattern of reference model/Feature_Grid_Model.py:62-64."""
    f = torch.from_numpy(features).unsqueeze(0)            # (1, C, D, H, W)
    g = torch.from_numpy(coords).view(1, 1, 1, -1, 3)
    out = torch.nn.functional.grid_sample(
        f, g, mode='bilinear', align_corners=False)
    return out.squeeze().transpose(0, 1).numpy()           # (N, C)


@pytest.mark.parametrize('shape', [(16, 15, 15, 15), (4, 8, 10, 12)])
def test_grid_sample_matches_torch(shape):
    rng = np.random.default_rng(0)
    features = rng.standard_normal(shape).astype(np.float32)
    coords = rng.uniform(-1, 1, size=(257, 3)).astype(np.float32)

    ours = grid_sample_3d(jnp.asarray(features), jnp.asarray(coords))
    theirs = torch_grid_sample(features, coords)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_grid_sample_out_of_bounds_zero_padding():
    rng = np.random.default_rng(1)
    features = rng.standard_normal((3, 8, 8, 8)).astype(np.float32)
    coords = np.array([[-1.5, 0.0, 0.0], [0.0, 1.4, 0.0], [2.0, 2.0, 2.0],
                       [-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], dtype=np.float32)
    ours = grid_sample_3d(jnp.asarray(features), jnp.asarray(coords))
    theirs = torch_grid_sample(features, coords)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def torch_trilinear(p, f, min_bb, max_bb, res):
    """Oracle: reference data/Interpolation.py:8-44 semantics in torch."""
    p, f = torch.from_numpy(p), torch.from_numpy(f)
    min_bb, max_bb, res = map(torch.from_numpy, (min_bb, max_bb, res))
    normalized_p = ((p - min_bb) / (max_bb - min_bb)) * (res - 1)
    lo = torch.floor(normalized_p).long()
    hi = torch.ceil(normalized_p).long()
    diff = torch.clamp((hi - lo).double(), min=1e-12)
    alpha = ((normalized_p.double() - lo.double()) / diff).float()
    one_a = 1.0 - alpha

    def g(ix, iy, iz):
        return f[ix, iy, iz]

    x00 = one_a[:, 0] * g(lo[:, 0], lo[:, 1], lo[:, 2]) + alpha[:, 0] * g(hi[:, 0], lo[:, 1], lo[:, 2])
    x10 = one_a[:, 0] * g(lo[:, 0], hi[:, 1], lo[:, 2]) + alpha[:, 0] * g(hi[:, 0], hi[:, 1], lo[:, 2])
    x01 = one_a[:, 0] * g(lo[:, 0], lo[:, 1], hi[:, 2]) + alpha[:, 0] * g(hi[:, 0], lo[:, 1], hi[:, 2])
    x11 = one_a[:, 0] * g(lo[:, 0], hi[:, 1], hi[:, 2]) + alpha[:, 0] * g(hi[:, 0], hi[:, 1], hi[:, 2])
    y0 = one_a[:, 1] * x00 + alpha[:, 1] * x10
    y1 = one_a[:, 1] * x01 + alpha[:, 1] * x11
    return (one_a[:, 2] * y0 + alpha[:, 2] * y1).numpy()


def test_trilinear_matches_reference_semantics():
    rng = np.random.default_rng(2)
    vol = rng.standard_normal((12, 14, 16)).astype(np.float32)
    res = np.array([12.0, 14.0, 16.0], dtype=np.float32)
    min_bb = np.zeros(3, dtype=np.float32)
    max_bb = res - 1.0
    pts = rng.uniform(0, 1, (333, 3)).astype(np.float32) * (res - 1)

    ours = trilinear_interpolate(jnp.asarray(vol), jnp.asarray(pts),
                                 jnp.asarray(min_bb), jnp.asarray(max_bb),
                                 jnp.asarray(res))
    theirs = torch_trilinear(pts, vol, min_bb, max_bb, res)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_integer_points_equal_gather():
    """The degenerate-cell guard makes integer points exact voxel fetches —
    this justifies the fast gather path in the train step."""
    rng = np.random.default_rng(3)
    vol = rng.standard_normal((9, 9, 9)).astype(np.float32)
    res = np.array([9.0, 9.0, 9.0], dtype=np.float32)
    idx = rng.integers(0, 9, (100, 3))
    pts = idx.astype(np.float32)

    interp = trilinear_interpolate(jnp.asarray(vol), jnp.asarray(pts),
                                   jnp.zeros(3), jnp.asarray(res) - 1,
                                   jnp.asarray(res))
    gathered = gather_volume(jnp.asarray(vol), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(interp), np.asarray(gathered), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gathered),
                               vol[idx[:, 0], idx[:, 1], idx[:, 2]])
