"""Loss functions for all pruning families.

Reference semantics:
  * SmallifyLoss (model/Smallify_Dropout.py:10-40): weight_l1 * sum|gate| over
    smallify/ST/masked-ST gates + weight_l2 * sum ||coeff||^2 over the grid.
  * VariationalDropoutLoss (model/Variational_Dropout_Layer.py:33-69):
    -(LL - w_dkl*sum DKL*scale - w_w*sum||coeff||^2*scale), per-sample
    Gaussian log-likelihood with predicted or static log-sigma, and a
    per-step multiplicative ramp of w_dkl capped at 30.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import gates as G
from ..models.feature_grid import ModelParams


def grid_l2(params: ModelParams) -> jax.Array:
    """sum of squared wavelet coefficients (Smallify_Dropout.py:30)."""
    return sum(jnp.sum(jnp.abs(c) ** 2) for c in params.coeffs)


def smallify_family_loss(drop_type: str, params: ModelParams,
                         weight_l1: float, weight_l2: float) -> jax.Array:
    """SmallifyLoss.forward for smallify / straight-through families."""
    loss = 0.0
    if weight_l1 > 0.0 and params.gates is not None:
        loss = loss + weight_l1 * G.l1_penalty(drop_type, params.gates)
    if weight_l2 > 0.0:
        loss = loss + weight_l2 * grid_l2(params)
    return loss


def log_likelihood_variance(predicted: jax.Array, ground_truth: jax.Array,
                            log_sigma: jax.Array):
    """Per-sample Gaussian LL (Variational_Dropout_Layer.py:24-30).

    Returns (LL_per_sample, squared_error_per_sample)."""
    sq = (ground_truth - predicted) ** 2
    sigma = jnp.exp(log_sigma)
    a = 1.0 / (2.0 * sigma * sigma)
    b = -(math.log(2.0 * math.pi) + 2.0 * log_sigma) / 2.0
    return a * (-sq) + b, sq


def variational_loss(params: ModelParams, predicted: jax.Array,
                     ground_truth: jax.Array, log_sigma: jax.Array,
                     weight_dkl: jax.Array, weight_weights: float,
                     batch_scale: float, data_scale: Optional[float] = None):
    """VariationalDropoutLoss.forward body (ramp handled by the caller).

    ``batch_scale`` = n_voxels / global_batch scales the KL/weight penalties;
    ``data_scale`` scales the per-sample LL sum (defaults to batch_scale; under
    data-parallel shard_map it is n_voxels / local_batch so that pmean over
    devices reproduces the global loss and gradients exactly).

    Returns (loss, LL, mse, dkl_term, weight_term)."""
    if data_scale is None:
        data_scale = batch_scale
    ll, sq = log_likelihood_variance(predicted, ground_truth, log_sigma)
    mse = jnp.sum(sq) / predicted.shape[0]
    ll_sum = jnp.sum(ll) * data_scale
    dkl = weight_dkl * G.variational_dkl(params.gates) * batch_scale
    wsum = weight_weights * grid_l2(params) * batch_scale
    loss = -(ll_sum - dkl - wsum)
    return loss, ll_sum, mse, dkl, wsum


def ramp_weight_dkl(weight_dkl: jax.Array, multiplier: float,
                    cap: float = 30.0) -> jax.Array:
    """w <- w*(1+mult) while below cap (Variational_Dropout_Layer.py:56-58)."""
    return jnp.where(weight_dkl < cap, weight_dkl * (1.0 + multiplier), weight_dkl)
