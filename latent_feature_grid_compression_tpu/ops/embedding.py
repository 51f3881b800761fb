"""Fourier positional embedding (reference: model/Feature_Embedding.py).

freq_bands = 2**[0..n_freqs-1] * 2*pi; per frequency the functions are applied
in order [sin, cos], concatenated along the last axis — so the output layout is
[sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...], each block of width d_in.
out_dim == 2 * n_freqs * d_in (reference: model/Feature_Embedding.py:27-34).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def fourier_out_dim(n_freqs: int, input_dim: int) -> int:
    return 2 * n_freqs * input_dim


def fourier_embed(x: jax.Array, n_freqs: int) -> jax.Array:
    """x: (..., d) -> (..., 2*n_freqs*d)."""
    freq_bands = (2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)) * 2.0 * np.pi
    parts = []
    for f in freq_bands:
        xf = x * f
        parts.append(jnp.sin(xf))
        parts.append(jnp.cos(xf))
    return jnp.concatenate(parts, axis=-1)
