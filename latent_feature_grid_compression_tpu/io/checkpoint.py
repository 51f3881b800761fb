"""Pytree checkpointing (.npz) — the model.pth equivalent.

The reference saves a torch state-dict after training
(training/training.py:59) and warm-starts from it via --checkpoint_path
(model/model_utils.py:56-57).  Here the params pytree is stored as a flat
npz archive with self-describing keys; gate params/aux included so training
can also warm-start gated models.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.feature_grid import ModelParams
from ..models import gates as G


def _flatten(params: ModelParams, gate_aux, drop_type: str) -> dict:
    out = {}
    for i, c in enumerate(params.coeffs):
        out[f'coeffs_{i}'] = np.asarray(c)
    for i, w in enumerate(params.mlp_w):
        out[f'mlp_w_{i}'] = np.asarray(w)
    for i, b in enumerate(params.mlp_b):
        out[f'mlp_b_{i}'] = np.asarray(b)
    g = params.gates
    if g is not None:
        if drop_type == 'smallify':
            for i, a in enumerate(g.betas):
                out[f'gate_betas_{i}'] = np.asarray(a)
            if gate_aux is not None:
                for i, a in enumerate(gate_aux.ema):
                    out[f'gate_ema_{i}'] = np.asarray(a)
                for i, a in enumerate(gate_aux.ema_var):
                    out[f'gate_emavar_{i}'] = np.asarray(a)
        elif drop_type in ('straight_through', 'masked_straight_through'):
            for i, a in enumerate(g.mask_values):
                out[f'gate_mask_values_{i}'] = np.asarray(a)
        elif G.is_variational(drop_type):
            for i, a in enumerate(g.log_thetas):
                out[f'gate_log_thetas_{i}'] = np.asarray(a)
            for i, a in enumerate(g.log_var):
                out[f'gate_log_var_{i}'] = np.asarray(a)
    out['drop_type'] = np.asarray(drop_type)
    return out


def save_checkpoint(path: str, params: ModelParams, gate_aux=None,
                    drop_type: str = ''):
    np.savez(path, **_flatten(params, gate_aux, drop_type))


def load_checkpoint(path: str, params: ModelParams, gate_aux=None
                    ) -> Tuple[ModelParams, Any]:
    """Load into the structure of an already-initialized (params, aux)."""
    with np.load(path, allow_pickle=False) as z:
        n_coeffs = len(params.coeffs)
        coeffs = tuple(jnp.asarray(z[f'coeffs_{i}']) for i in range(n_coeffs))
        mlp_w = tuple(jnp.asarray(z[f'mlp_w_{i}']) for i in range(len(params.mlp_w)))
        mlp_b = tuple(jnp.asarray(z[f'mlp_b_{i}']) for i in range(len(params.mlp_b)))
        gates = params.gates
        drop_type = str(z['drop_type']) if 'drop_type' in z else ''
        if gates is not None:
            if drop_type == 'smallify' and 'gate_betas_0' in z:
                gates = gates.replace(betas=tuple(
                    jnp.asarray(z[f'gate_betas_{i}']) for i in range(n_coeffs)))
                if gate_aux is not None and 'gate_ema_0' in z:
                    gate_aux = gate_aux.replace(
                        ema=tuple(jnp.asarray(z[f'gate_ema_{i}'])
                                  for i in range(n_coeffs)),
                        ema_var=tuple(jnp.asarray(z[f'gate_emavar_{i}'])
                                      for i in range(n_coeffs)))
            elif 'gate_mask_values_0' in z:
                gates = gates.replace(mask_values=tuple(
                    jnp.asarray(z[f'gate_mask_values_{i}']) for i in range(n_coeffs)))
            elif 'gate_log_thetas_0' in z:
                gates = gates.replace(
                    log_thetas=tuple(jnp.asarray(z[f'gate_log_thetas_{i}'])
                                     for i in range(n_coeffs)),
                    log_var=tuple(jnp.asarray(z[f'gate_log_var_{i}'])
                                  for i in range(n_coeffs)))
        return params.replace(coeffs=coeffs, mlp_w=mlp_w, mlp_b=mlp_b,
                              gates=gates), gate_aux
