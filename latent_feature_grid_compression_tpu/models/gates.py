"""Differentiable pruning gates over wavelet coefficient tensors.

TPU-native re-design of the reference's dropout-layer family
(model/Smallify_Dropout.py, model/Straight_Through_Dropout.py,
model/Variational_Dropout_Layer.py): gates are pure functions over explicit
parameter/aux pytrees instead of stateful nn.Modules, so the whole train step
(gate forward, EMA tracking, KL terms) stays on-device inside one jit — the
reference's per-step GPU->CPU sign-variance sync (Smallify_Dropout.py:96) is
eliminated by keeping the EMA state in the scan carry.

Gate state layout: one entry per wavelet-pyramid level, shaped like the
coefficient tensor minus its leading feature axis (reference:
Feature_Grid_Model.py:31-32 — gates broadcast over the feature channel).

Supported drop types (reference model/model_utils.py:34-44):
  'smallify'                 — learned betas + EMA sign-variance pruning
  'straight_through'         — Bernoulli binary masks w/ straight-through grads
  'masked_straight_through'  — Masked Wavelet Representation sigmoid-STE masks
  '*variational*'            — Molchanov sparse variational dropout
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

# Molchanov variational-dropout KL constants
# (reference: Variational_Dropout_Layer.py:73-77)
_K1, _K2, _K3 = 0.63576, 1.87320, 1.48695


def is_variational(drop_type: str) -> bool:
    return bool(drop_type) and 'variational' in drop_type


# ---------------------------------------------------------------------------
# Parameter / aux containers (tuples over pyramid levels)
# ---------------------------------------------------------------------------

@struct.dataclass
class SmallifyParams:
    betas: Tuple[jax.Array, ...]


@struct.dataclass
class SmallifyAux:
    """On-device EMA sign-variance tracker (Smallify_Dropout.py:81-118)."""
    ema: Tuple[jax.Array, ...]
    ema_var: Tuple[jax.Array, ...]


@struct.dataclass
class STParams:
    mask_values: Tuple[jax.Array, ...]


@struct.dataclass
class VariationalParams:
    log_thetas: Tuple[jax.Array, ...]
    log_var: Tuple[jax.Array, ...]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_gates(key: jax.Array, drop_type: str,
               coeff_shapes: Sequence[Tuple[int, ...]],
               drop_momentum: float):
    """Create (gate_params, gate_aux) for the given drop type.

    coeff_shapes are full coefficient shapes; gates span shape[1:]
    (broadcast over the leading feature axis, Feature_Grid_Model.py:31).
    """
    sizes = [tuple(s[1:]) for s in coeff_shapes]
    if not drop_type:
        return None, None
    if drop_type == 'smallify':
        keys = jax.random.split(key, len(sizes))
        betas = tuple(jax.random.normal(k, s) for k, s in zip(keys, sizes))
        ema = tuple(jnp.sign(b) for b in betas)
        ema_var = tuple(jnp.zeros(s) for s in sizes)
        return SmallifyParams(betas), SmallifyAux(ema, ema_var)
    if drop_type in ('straight_through', 'masked_straight_through'):
        return STParams(tuple(jnp.ones(s) for s in sizes)), None
    if is_variational(drop_type):
        # init_dropout p = drop_momentum (reference model_utils.py:42 passes
        # drop_momentum as VariationalDropout's init_dropout).
        log_alpha0 = math.log(drop_momentum / (1.0 - drop_momentum))
        log_thetas = tuple(jnp.zeros(s) for s in sizes)
        log_var = tuple(jnp.full(s, log_alpha0) for s in sizes)
        return VariationalParams(log_thetas, log_var), None
    raise ValueError(f"unknown drop_type '{drop_type}'")


# ---------------------------------------------------------------------------
# Forward (training-time gating of one coefficient tensor)
# ---------------------------------------------------------------------------

def apply_gate(drop_type: str, gate_params, level: int, coeff: jax.Array,
               rng: Optional[jax.Array], threshold: float) -> jax.Array:
    """Gate one coefficient tensor during training decode.

    coeff: (F, *size); gate params broadcast over the leading axis.
    """
    if drop_type == 'smallify':
        # Smallify_Dropout.py:57 — x * betas (no inverse scaling)
        return coeff * gate_params.betas[level][None]
    if drop_type == 'straight_through':
        # Bernoulli keep mask rand < mask_values (Straight_Through_Dropout.py:28)
        # with a *working* straight-through estimator: forward uses the hard
        # sample, backward routes hardtanh(grad) into mask_values.  (In the
        # reference the custom Function's bool output is non-differentiable,
        # so its mask_values only learn through the L1 penalty — a defect we
        # do not reproduce; documented deviation.)
        mv = gate_params.mask_values[level]
        u = jax.random.uniform(rng, mv.shape)
        hard = (u < mv).astype(coeff.dtype)
        mask = hard + jnp.clip(mv, -1.0, 1.0) - jax.lax.stop_gradient(jnp.clip(mv, -1.0, 1.0))
        return coeff * mask[None]
    if drop_type == 'masked_straight_through':
        # Straight_Through_Dropout.py:53-61: (x*(m>=t) - x*m).detach() + x*m
        mv = gate_params.mask_values[level]
        m = jax.nn.sigmoid(mv)[None]
        hard = coeff * (m >= threshold).astype(coeff.dtype)
        soft = coeff * m
        return jax.lax.stop_gradient(hard - soft) + soft
    if is_variational(drop_type):
        # Variational_Dropout_Layer.py:101-112: x * (theta + sigma*xi)
        thetas = jnp.exp(gate_params.log_thetas[level])
        sigma = jnp.exp(gate_params.log_var[level] / 2.0)
        xi = jax.random.normal(rng, thetas.shape, dtype=coeff.dtype)
        return coeff * (thetas + sigma * xi)[None]
    raise ValueError(f"unknown drop_type '{drop_type}'")


# ---------------------------------------------------------------------------
# Aux updates / penalties / masks
# ---------------------------------------------------------------------------

def smallify_update_tracker(aux: SmallifyAux, params: SmallifyParams,
                            momentum: float) -> SmallifyAux:
    """One EMA sign-variance step, all levels (Smallify_Dropout.py:106-112).

    EMA     <- EMA + m * (sign(beta) - EMA)
    EMAVar  <- (1-m) * (EMAVar + m * (sign(beta) - EMA_old)^2)
    """
    new_ema, new_var = [], []
    for b, ema, var in zip(params.betas, aux.ema, aux.ema_var):
        phi = jnp.sign(b) - ema
        new_ema.append(ema + momentum * phi)
        new_var.append((1.0 - momentum) * (var + momentum * phi * phi))
    return SmallifyAux(tuple(new_ema), tuple(new_var))


def l1_penalty(drop_type: str, gate_params) -> jax.Array:
    """Sum of |gate| over all levels (Smallify/ST loss L1 term)."""
    if drop_type == 'smallify':
        arrs = gate_params.betas
    elif drop_type in ('straight_through', 'masked_straight_through'):
        arrs = gate_params.mask_values
    else:
        raise ValueError(drop_type)
    return sum(jnp.sum(jnp.abs(a)) for a in arrs)


def variational_dkl(gate_params: VariationalParams) -> jax.Array:
    """Sum KL over all levels (Variational_Dropout_Layer.py:115-122)."""
    total = 0.0
    for lt, lv in zip(gate_params.log_thetas, gate_params.log_var):
        log_alpha = lv - 2.0 * lt
        t1 = _K1 * jax.nn.sigmoid(_K2 + _K3 * log_alpha)
        t2 = 0.5 * jax.nn.softplus(-log_alpha)
        total = total + jnp.sum(-t1 + t2 + _K1)
    return total


def variational_dropout_rates(gate_params: VariationalParams, level: int) -> jax.Array:
    """alpha/(1+alpha) (Variational_Dropout_Layer.py:89-95)."""
    log_alpha = gate_params.log_var[level] - 2.0 * gate_params.log_thetas[level]
    alphas = jnp.exp(log_alpha)
    return alphas / (1.0 + alphas)


def pruning_masks(drop_type: str, gate_params, aux,
                  thresholds: Sequence[float]) -> Tuple[jax.Array, ...]:
    """Binary keep-masks per level (each gate's calculate_pruning_mask)."""
    n = len(thresholds)
    masks = []
    for lvl in range(n):
        t = thresholds[lvl]
        if drop_type == 'smallify':
            m = jnp.where(aux.ema_var[lvl] < t, 1.0, 0.0)
        elif drop_type == 'straight_through':
            m = (gate_params.mask_values[lvl] > t).astype(jnp.float32)
        elif drop_type == 'masked_straight_through':
            m = (jax.nn.sigmoid(gate_params.mask_values[lvl]) >= t).astype(jnp.float32)
        elif is_variational(drop_type):
            rates = variational_dropout_rates(gate_params, lvl)
            m = jnp.where(rates < t, 1.0, 0.0)
            # keep >= 1 element (Variational_Dropout_Layer.py:142-143)
            m = jax.lax.cond(jnp.count_nonzero(m) == 0,
                             lambda mm: mm.reshape(-1).at[0].set(1.0).reshape(mm.shape),
                             lambda mm: mm, m)
        else:
            raise ValueError(drop_type)
        masks.append(m)
    return tuple(masks)


def bake_values(drop_type: str, gate_params, aux, coeffs,
                thresholds: Sequence[float]) -> Tuple[jax.Array, ...]:
    """multiply_values_with_dropout for every level: coeff * (mask * gatevalue).

    smallify:    coeff * (prune_mask * betas)        (Smallify_Dropout.py:71-75)
    masked ST:   STE-style blend at threshold         (Straight_Through_Dropout.py:71-75)
    straight:    coeff * prune_mask                   (Straight_Through_Dropout.py:38-42)
    variational: coeff * (prune_mask * exp(log_theta)) (Variational_Dropout_Layer.py:149-153)
    """
    masks = pruning_masks(drop_type, gate_params, aux, thresholds)
    out = []
    for lvl, (coeff, mask) in enumerate(zip(coeffs, masks)):
        if drop_type == 'smallify':
            out.append(coeff * (mask * gate_params.betas[lvl])[None])
        elif drop_type == 'straight_through':
            out.append(coeff * mask[None])
        elif drop_type == 'masked_straight_through':
            m = jax.nn.sigmoid(gate_params.mask_values[lvl])[None]
            hard = coeff * (m >= thresholds[lvl]).astype(coeff.dtype)
            soft = coeff * m
            out.append((hard - soft) + soft)  # == hard; kept for parity clarity
        elif is_variational(drop_type):
            out.append(coeff * (mask * jnp.exp(gate_params.log_thetas[lvl]))[None])
        else:
            raise ValueError(drop_type)
    return tuple(out)


def gate_size(drop_type: str, gate_params) -> int:
    """Total number of gate values == stored mask bits (size_layer sum).

    Defined for *all* types, including 'straight_through' (the reference
    forgot to override size_layer there — Straight_Through_Dropout.py:20-42).
    """
    if drop_type == 'smallify':
        arrs = gate_params.betas
    elif drop_type in ('straight_through', 'masked_straight_through'):
        arrs = gate_params.mask_values
    elif is_variational(drop_type):
        arrs = gate_params.log_thetas
    else:
        return 0
    return int(sum(a.size for a in arrs))
