"""MLP head with SnakeAlt activation, as pure functions over a params pytree.

Reference semantics: model/Feature_Grid_Model.py:12-13 (SnakeAlt), :43-48 and
:72-75 (n_layers hidden Linear layers each followed by SnakeAlt, then a final
Linear).  Initialization mirrors torch.nn.Linear's default
(kaiming-uniform(a=sqrt(5)) == U[-1/sqrt(fan_in), 1/sqrt(fan_in)] for both
weight and bias), so freshly-initialized models are statistically identical to
the reference.

Weights are stored as (in, out) so the forward pass is x @ W + b, which XLA
maps straight onto the MXU.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp


def snake_alt(x: jax.Array) -> jax.Array:
    """SnakeAlt(x) = 0.5*x + sin(x)**2 (reference: Feature_Grid_Model.py:12)."""
    s = jnp.sin(x)
    return 0.5 * x + s * s


def init_linear(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U[-1/sqrt(d_in), 1/sqrt(d_in)]."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return w, b


def init_mlp(key: jax.Array, d_in: int, hidden: int, d_out: int,
             num_layers: int, dtype=jnp.float32):
    """Build [d_in->h] + (num_layers-1)x[h->h] + final [h->d_out]."""
    keys = jax.random.split(key, num_layers + 1)
    weights, biases = [], []
    w, b = init_linear(keys[0], d_in, hidden, dtype)
    weights.append(w); biases.append(b)
    for i in range(1, num_layers):
        w, b = init_linear(keys[i], hidden, hidden, dtype)
        weights.append(w); biases.append(b)
    w, b = init_linear(keys[-1], hidden, d_out, dtype)
    weights.append(w); biases.append(b)
    return weights, biases


def mlp_apply(weights: List[jax.Array], biases: List[jax.Array],
              x: jax.Array, activation=snake_alt) -> jax.Array:
    """Forward through hidden layers (activation after each) + linear head."""
    for w, b in zip(weights[:-1], biases[:-1]):
        x = activation(jnp.dot(x, w, preferred_element_type=x.dtype) + b)
    return jnp.dot(x, weights[-1], preferred_element_type=x.dtype) + biases[-1]
