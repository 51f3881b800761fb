"""Affine quantization ops + the post-training quantization study.

Replaces torch.quantize_per_tensor in the reference's mock-quantization probe
(tests/Mock_Quantization.py): grid coefficients are affine-quantized to int8
(scale 0.02), MLP weights to int32 (scale 1e-4), PSNR is re-measured, and the
compression ratio recomputed assuming 1-byte grid / 2-byte MLP params
(Mock_Quantization.py:26-95).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.feature_grid import ModelSpec, ModelParams, num_net_params


def quantize_affine(x: jax.Array, scale: float, zero_point: int = 0,
                    dtype=jnp.int8) -> jax.Array:
    """q = clip(round(x/scale) + zp) in the target integer range."""
    info = jnp.iinfo(dtype)
    q = jnp.round(x / scale) + zero_point
    return jnp.clip(q, info.min, info.max).astype(dtype)


def dequantize_affine(q: jax.Array, scale: float, zero_point: int = 0
                      ) -> jax.Array:
    return (q.astype(jnp.float32) - zero_point) * scale


def quantize_model(params: ModelParams, grid_scale: float = 0.02,
                   mlp_scale: float = 1e-4) -> ModelParams:
    """Apply the study's quantize->dequantize round to all parameters."""
    coeffs = tuple(dequantize_affine(quantize_affine(c, grid_scale), grid_scale)
                   for c in params.coeffs)
    mlp_w = tuple(dequantize_affine(
        quantize_affine(w, mlp_scale, dtype=jnp.int32), mlp_scale)
        for w in params.mlp_w)
    mlp_b = tuple(dequantize_affine(
        quantize_affine(b, mlp_scale, dtype=jnp.int32), mlp_scale)
        for b in params.mlp_b)
    return params.replace(coeffs=coeffs, mlp_w=mlp_w, mlp_b=mlp_b)


def mock_quantization_study(spec: ModelSpec, params: ModelParams, volume_np,
                            grid_scale: float = 0.02, mlp_scale: float = 1e-4
                            ) -> Dict[str, float]:
    """PSNR before/after quantization + byte-accounted compression ratios."""
    from ..data.volume import VolumeMeta
    from ..eval.reconstruct import tiled_net_out

    meta = VolumeMeta(tuple(volume_np.shape))
    psnr, _, _, _ = tiled_net_out(spec, params, meta, gt_vol=volume_np,
                                  evaluate=True, write_vols=False)
    qparams = quantize_model(params, grid_scale, mlp_scale)
    psnr_q, _, _, _ = tiled_net_out(spec, qparams, meta, gt_vol=volume_np,
                                    evaluate=True, write_vols=False)

    n_grid = sum(int(np.asarray(c).size) for c in params.coeffs)
    zeros = sum(int((np.asarray(c) == 0).sum()) for c in params.coeffs)
    n_mlp = num_net_params(params) - n_grid
    # float baseline: 4 bytes each; quantized: grid 1 byte, MLP 2 bytes
    # (Mock_Quantization.py:75-93)
    ratio_float = meta.n_voxels / (n_grid - zeros + n_mlp)
    ratio_quant = meta.n_voxels * 4.0 / ((n_grid - zeros) * 1.0 + n_mlp * 2.0)
    return {
        'psnr': psnr, 'psnr_quant': psnr_q,
        'compression_ratio': ratio_float,
        'compression_ratio_quant': ratio_quant,
        'num_grid_params': n_grid, 'num_mlp_params': n_mlp,
        'num_zeros': zeros,
    }
