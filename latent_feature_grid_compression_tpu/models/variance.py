"""Variance model for dynamic variational dropout.

Reference model/Variational_Dropout_Layer.py:159-175: a 4x32 ReLU MLP mapping
positions to a per-sample log-sigma, trained jointly (its params are added to
the optimizer, training/training.py:80-84).
"""

from __future__ import annotations

import jax

from ..ops.mlp import init_mlp, mlp_apply


def init_variance_model(key: jax.Array, input_ch: int = 3, output_ch: int = 1,
                        n_layers: int = 4, size_layers: int = 32):
    w, b = init_mlp(key, input_ch, size_layers, output_ch, n_layers)
    return {'w': tuple(w), 'b': tuple(b)}


def apply_variance_model(params, x: jax.Array) -> jax.Array:
    return mlp_apply(list(params['w']), list(params['b']), x,
                     activation=jax.nn.relu)
