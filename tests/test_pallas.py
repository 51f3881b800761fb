"""Pallas fused interpolation kernel vs the XLA reference path (interpret
mode on CPU; the same kernels compile for TPU via Mosaic)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from latent_feature_grid_compression_tpu.ops.interpolation import grid_sample_3d
from latent_feature_grid_compression_tpu.ops.pallas_kernels import (
    pallas_grid_sample_3d)


@pytest.mark.parametrize('shape', [(16, 15, 15, 15), (4, 8, 8, 8)])
def test_forward_matches_xla(shape):
    rng = np.random.default_rng(0)
    features = rng.standard_normal(shape).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, (777, 3)).astype(np.float32)  # incl. OOB

    ref = grid_sample_3d(jnp.asarray(features), jnp.asarray(coords))
    # precision='f32' is a 3-pass bf16 split: ~2^-16 relative accuracy
    out = pallas_grid_sample_3d(jnp.asarray(features), jnp.asarray(coords),
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # single-pass bf16 mode: mixed-precision regime
    out16 = pallas_grid_sample_3d(jnp.asarray(features), jnp.asarray(coords),
                                  interpret=True, precision='bf16')
    np.testing.assert_allclose(np.asarray(out16), np.asarray(ref), atol=3e-2)


def test_backward_matches_xla():
    rng = np.random.default_rng(1)
    features = rng.standard_normal((4, 8, 8, 8)).astype(np.float32)
    coords = rng.uniform(-1, 1, (513, 3)).astype(np.float32)
    g = rng.standard_normal((513, 4)).astype(np.float32)

    def loss_ref(f):
        return jnp.sum(grid_sample_3d(f, jnp.asarray(coords)) * jnp.asarray(g))

    def loss_pal(f):
        return jnp.sum(pallas_grid_sample_3d(f, jnp.asarray(coords),
                                             interpret=True) * jnp.asarray(g))

    g_ref = jax.grad(loss_ref)(jnp.asarray(features))
    g_pal = jax.grad(loss_pal)(jnp.asarray(features))
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=2e-4)


@pytest.mark.parametrize('shape', [(16, 32, 32, 32), (16, 62, 62, 62)])
def test_blocked_large_grid_forward_matches_xla(shape):
    """NAS-scale grids (Multi_Objective_NAS.py search spaces reach 62^3) use
    the HW-blocked kernel; semantics must be identical."""
    rng = np.random.default_rng(2)
    features = rng.standard_normal(shape).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, (901, 3)).astype(np.float32)

    ref = grid_sample_3d(jnp.asarray(features), jnp.asarray(coords))
    out = pallas_grid_sample_3d(jnp.asarray(features), jnp.asarray(coords),
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_blocked_large_grid_backward_matches_xla():
    rng = np.random.default_rng(3)
    features = rng.standard_normal((8, 32, 32, 32)).astype(np.float32)
    coords = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
    g = rng.standard_normal((400, 8)).astype(np.float32)

    def loss_ref(f):
        return jnp.sum(grid_sample_3d(f, jnp.asarray(coords)) * jnp.asarray(g))

    def loss_pal(f):
        return jnp.sum(pallas_grid_sample_3d(f, jnp.asarray(coords),
                                             interpret=True) * jnp.asarray(g))

    g_ref = jax.grad(loss_ref)(jnp.asarray(features))
    g_pal = jax.grad(loss_pal)(jnp.asarray(features))
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=3e-4)
