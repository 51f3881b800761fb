"""Fused Pallas MLP vs the XLA mlp_apply (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from latent_feature_grid_compression_tpu.ops.mlp import (init_mlp, mlp_apply,
                                                         snake_alt)
from latent_feature_grid_compression_tpu.ops.mlp_pallas import mlp_apply_pallas


def setup(n=512, d_in=31, hidden=32, d_out=1, layers=4, seed=0):
    ws, bs = init_mlp(jax.random.key(seed), d_in, hidden, d_out, layers)
    x = jax.random.normal(jax.random.key(seed + 1), (n, d_in))
    return ws, bs, x


def test_forward_matches_xla():
    ws, bs, x = setup()
    ref = mlp_apply(list(ws), list(bs), x, snake_alt)
    for prec, tol in (('f32', 1e-5), ('bf16', 2e-2)):
        out = mlp_apply_pallas(ws, bs, x, precision=prec, block_n=256,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=tol, rtol=tol)


def test_forward_nonaligned_n_and_dims():
    ws, bs, x = setup(n=700, d_in=19, hidden=24, d_out=3, layers=2)
    ref = mlp_apply(list(ws), list(bs), x, snake_alt)
    out = mlp_apply_pallas(ws, bs, x, precision='f32', block_n=256,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_xla():
    ws, bs, x = setup(n=512)
    ct = jax.random.normal(jax.random.key(9), (512, 1))

    def loss_ref(ws, bs, x):
        return jnp.sum(mlp_apply(list(ws), list(bs), x, snake_alt) * ct)

    def loss_ker(ws, bs, x):
        return jnp.sum(mlp_apply_pallas(ws, bs, x, precision='f32',
                                        block_n=256, interpret=True) * ct)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(tuple(ws), tuple(bs), x)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(tuple(ws), tuple(bs), x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4)
