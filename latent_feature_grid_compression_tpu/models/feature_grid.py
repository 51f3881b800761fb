"""The latent-feature-grid scene-representation model, TPU-native.

Functional re-design of reference model/Feature_Grid_Model.py: parameters are
an explicit pytree (wavelet coefficients + MLP weights + gate params), the
forward pass is a pure function, and all shape bookkeeping lives in a static,
hashable :class:`ModelSpec` so every phase of training jits cleanly.

Forward pipeline (reference Feature_Grid_Model.py:50-80):
  decode gated wavelet pyramid -> trilinear feature fetch at input coords
  (torch grid_sample align_corners=False semantics) -> concat
  [coords, fourier(coords), features] -> n_layers x (Linear + SnakeAlt)
  -> final Linear; eval path clamps the output to [-1, 1].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.dwt import WaveletFilter3d, encode_pyramid, decode_pyramid, dwt_max_level
from ..ops.embedding import fourier_embed, fourier_out_dim
from ..ops.interpolation import grid_sample_3d
from ..ops.mlp import init_mlp, mlp_apply, snake_alt
from . import gates as G


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static architecture description (hashable; safe as a jit static arg)."""

    d_in: int = 3
    hidden: int = 32
    d_out: int = 1
    num_layers: int = 4
    n_freqs: int = 2
    grid_features: int = 16
    grid_size: int = 32
    wavelet: str = 'db2'
    drop_type: str = ''
    drop_momentum: float = 0.025
    # per-level pruning thresholds, lowpass first (reference's
    # pruning_threshold_list hack, Dropout_Layer.py:6-18, made first-class)
    thresholds: Tuple[float, ...] = ()
    # spatial shapes to restore per decode level, coarsest first
    level_shapes: Tuple[Tuple[int, int, int], ...] = ()
    # feature-fetch backend: 'xla' (gather path), 'pallas' (fused MXU
    # one-hot matmul kernel, ~f32 accurate 3-pass), 'pallas_bf16' (single
    # MXU pass, mixed-precision), 'fused' (ONE Pallas kernel for
    # interpolation + fourier embedding + the whole MLP, activations never
    # leave VMEM — ops/fused_forward.py), or 'auto' (resolved at spec build
    # time: fused on TPU when the decoded grid is small enough to be
    # VMEM-resident, xla otherwise)
    interp_backend: str = 'xla'
    # 'float32' (default) or 'bfloat16': dtype of the interpolation + MLP
    # compute path (params and the DWT decode stay f32; casts happen at the
    # feature-fetch boundary, output is always f32)
    compute_dtype: str = 'float32'
    # MLP execution: 'xla' (jnp.dot chain) or 'pallas' (fused single-kernel
    # fwd/bwd, ops/mlp_pallas.py — TPU only, all dims <= 128; matmul
    # precision matches the XLA path's effective TPU default of one bf16
    # MXU pass)
    mlp_backend: str = 'xla'

    @property
    def num_levels(self) -> int:
        return len(self.level_shapes)

    @property
    def mlp_in(self) -> int:
        return self.d_in + fourier_out_dim(self.n_freqs, self.d_in) + self.grid_features

    def filter(self) -> WaveletFilter3d:
        return WaveletFilter3d(self.wavelet)


@struct.dataclass
class ModelParams:
    """Trainable state: wavelet coefficients, MLP, gates."""

    coeffs: Tuple[jax.Array, ...]          # [lowpass (F,g,g,g), details (F,7,s,s,s)...]
    mlp_w: Tuple[jax.Array, ...]
    mlp_b: Tuple[jax.Array, ...]
    gates: Any = None                       # gate params pytree or None


def resolve_interp_backend(backend: str, grid_size: int) -> str:
    """Resolve 'auto' to the fastest correct backend for this platform.

    'auto' picks winners by MEASUREMENT.  Full flagship train step (smallify,
    255^3 volume, batch 32768, 4x32 MLP), one v5e chip, ms/step at every
    NAS-reachable grid size (examples/bench_interp_crossover.py, r5 —
    VERDICT r4 #6; NAS spaces span 4..62, nas/search.py):

        grid   xla     pallas    winner
           8   3.080    1.051    pallas
          15   3.269    1.346    pallas      <- flagship shape
          16   3.293    1.360    pallas
          24   3.517    2.442    pallas
          28   3.703    2.885    pallas
          30   3.645    2.839    pallas
          31   3.915    3.070    pallas
          32   4.276   36.372    xla   (one-hot weight tile spills VMEM)
          48   5.553    7.444    xla
          62   9.149   13.373    xla

    The Pallas one-hot-matmul kernel materializes a (block_n, M = HW x DC)
    weight tile in VMEM, so it wins while the tile stays a few MB and loses
    catastrophically once it spills (32^3); the XLA gather path is O(N) in
    samples.  Measured boundary: EXACT — pallas wins at every size through
    31 and loses 8.5x from 32 (the spill edge was bracketed down to
    adjacent sizes; nothing NAS-reachable is unmeasured around it).
    """
    if backend != 'auto':
        if backend not in ('xla', 'pallas', 'pallas_bf16', 'fused'):
            raise ValueError(
                f"interp_backend must be one of 'auto', 'xla', 'pallas', "
                f"'pallas_bf16', 'fused'; got {backend!r}")
        return backend
    import jax
    on_tpu = jax.default_backend() not in ('cpu', 'gpu')
    return 'pallas' if (on_tpu and grid_size <= 31) else 'xla'


def make_spec(d_in=3, hidden=32, d_out=1, num_layers=4, n_freqs=2,
              grid_features=16, grid_size=32, wavelet='db2', drop_type='',
              drop_momentum=0.025, drop_threshold=0.75,
              pruning_threshold_list=None, interp_backend='xla',
              compute_dtype='float32', mlp_backend='xla') -> ModelSpec:
    """Build a ModelSpec, precomputing the wavelet pyramid level shapes."""
    requested = interp_backend
    resolved = resolve_interp_backend(interp_backend, grid_size)
    if compute_dtype in ('bf16', 'bfloat16'):
        compute_dtype = 'bfloat16'
    elif compute_dtype in ('f32', 'float32'):
        compute_dtype = 'float32'
    else:
        raise ValueError(f"compute_dtype must be 'float32' or 'bfloat16'; "
                         f"got {compute_dtype!r}")
    if wavelet in ('', 'none'):
        # no-wavelet mode: the feature grid is stored/gated in the spatial
        # domain directly (one coefficient tensor, zero decode levels — the
        # ablation axis of the reference's wavelet-gain study,
        # README.md:59-60 / plots/wavelet_gain.JPG, which its CLI itself
        # never exposed)
        wavelet = 'none'
        level_shapes = ()
        n_tensors = 1
    else:
        filt = WaveletFilter3d(wavelet)
        num_levels = dwt_max_level(grid_size, filt.filter_length)
        # level shapes: run the shape recursion of encode_pyramid without data
        shapes = []
        s = np.array([grid_size] * 3)
        for _ in range(num_levels):
            shapes.append(tuple(int(v) for v in s))
            pad_lo = (2 * filt.filter_length - 3) // 2
            s = (s + pad_lo * 2 + (s % 2) - filt.filter_length) // 2 + 1
        level_shapes = tuple(shapes[::-1])
        n_tensors = num_levels + 1
    if pruning_threshold_list:
        # reference assigns list entries to gate instances in construction
        # order == our coefficient order (lowpass, coarsest detail, ...).
        tl = list(pruning_threshold_list)
        thresholds = tuple(tl[i] if i < len(tl) else drop_threshold
                           for i in range(n_tensors))
    else:
        thresholds = (drop_threshold,) * n_tensors
    if mlp_backend not in ('xla', 'pallas'):
        raise ValueError(f"mlp_backend must be 'xla' or 'pallas'; "
                         f"got {mlp_backend!r}")
    spec = ModelSpec(d_in=d_in, hidden=hidden, d_out=d_out,
                     num_layers=num_layers, n_freqs=n_freqs,
                     grid_features=grid_features, grid_size=grid_size,
                     wavelet=wavelet, drop_type=drop_type,
                     drop_momentum=drop_momentum, thresholds=thresholds,
                     level_shapes=level_shapes, interp_backend=resolved,
                     compute_dtype=compute_dtype, mlp_backend=mlp_backend)
    if requested == 'fused' and not _fused_eligible(spec):
        # an explicitly requested backend must never be silently swapped
        # (ADVICE r3); only 'auto' may fall back
        raise ValueError(
            f"interp_backend='fused' requires grid_size^2 <= 512 and all MLP "
            f"dims <= 128 (got grid_size={grid_size}, mlp_in={spec.mlp_in}, "
            f"hidden={hidden}, d_out={d_out}); use 'auto' or 'pallas'")
    if requested == 'auto' and resolved == 'fused' and not _fused_eligible(spec):
        spec = dataclasses.replace(spec, interp_backend='pallas')
    return spec


def init_model(key: jax.Array, spec: ModelSpec):
    """Initialize (params, gate_aux).

    Grid init: U(0,1) volume -> multi-level DWT (model_utils.py:27-28 +
    Feature_Grid_Model.py:83-99).  MLP init: torch Linear default.
    """
    k_grid, k_mlp, k_gate = jax.random.split(key, 3)
    grid = jax.random.uniform(
        k_grid, (spec.grid_features,) + (spec.grid_size,) * 3, jnp.float32)
    if spec.num_levels == 0:
        coeffs = [grid]
    else:
        coeffs, shapes = encode_pyramid(spec.filter(), grid, spec.num_levels)
        assert tuple(tuple(int(v) for v in s)
                     for s in shapes) == spec.level_shapes

    mlp_w, mlp_b = init_mlp(k_mlp, spec.mlp_in, spec.hidden, spec.d_out,
                            spec.num_layers)
    gate_params, gate_aux = G.init_gates(
        k_gate, spec.drop_type, [c.shape for c in coeffs], spec.drop_momentum)
    params = ModelParams(tuple(coeffs), tuple(mlp_w), tuple(mlp_b), gate_params)
    return params, gate_aux


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def decode_volume(spec: ModelSpec, params: ModelParams, *,
                  train_gates: bool = False,
                  rng: Optional[jax.Array] = None,
                  masks: Optional[Tuple[jax.Array, ...]] = None,
                  x_window=None) -> jax.Array:
    """Gated inverse DWT -> (F, G, G, G) spatial feature grid.

    Reference Feature_Grid_Model.py:102-108.  Gating modes:
      train_gates=True : apply the differentiable gate per level
      masks is not None: multiply by frozen binary masks (post-bake phase,
                         the d_mask path of the reference gates)
      neither          : identity (dense model / after remove_drop_layers)

    x_window: optional (start, length) — decode only that window of the
    grid's LAST spatial axis (the axis sample coordinate 0 indexes; used by
    the space-sharded train step to decode each device's grid tile locally,
    see ops/dwt.decode_pyramid).
    """
    coeffs = params.coeffs
    if train_gates and spec.drop_type:
        keys = (jax.random.split(rng, len(coeffs)) if rng is not None
                else [None] * len(coeffs))
        coeffs = tuple(
            G.apply_gate(spec.drop_type, params.gates, i, c, keys[i],
                         spec.thresholds[i])
            for i, c in enumerate(coeffs))
    elif masks is not None:
        coeffs = tuple(c * m[None] for c, m in zip(coeffs, masks))
    if spec.num_levels == 0:
        # no-wavelet mode: the gated grid IS the spatial feature volume
        grid = coeffs[0]
        if x_window is not None:
            start, length = x_window
            grid = jax.lax.dynamic_slice_in_dim(
                grid, jnp.asarray(start, jnp.int32), int(length), axis=3)
        return grid
    return decode_pyramid(spec.filter(), list(coeffs),
                          np.asarray(spec.level_shapes),
                          last_window=x_window)


def _fused_eligible(spec: ModelSpec) -> bool:
    """The one-kernel forward needs the whole padded G_stack VMEM-resident
    and every MLP dimension within one 128-lane tile; otherwise apply_model
    falls back to the two-kernel pallas path (which blocks large grids)."""
    return (spec.grid_size ** 2 <= 512 and spec.mlp_in <= 128
            and spec.hidden <= 128 and spec.d_out <= 128)


def apply_model(spec: ModelSpec, params: ModelParams, coords: jax.Array, *,
                train: bool = True,
                train_gates: bool = False,
                rng: Optional[jax.Array] = None,
                masks: Optional[Tuple[jax.Array, ...]] = None,
                x_window=None) -> jax.Array:
    """Full forward pass at (N, d_in) normalized coordinates -> (N, d_out).

    ``train=False`` additionally clamps to [-1, 1]
    (Feature_Grid_Model.py:77-78).

    x_window: optional (start, length) grid-tile-local decode window on the
    axis coords[:, 0] indexes — caller guarantees every sample's
    interpolation support lies inside the window (the space-sharded trainer
    derives it from the device's volume slab + a 1-cell halo).  XLA interp
    backend only.
    """
    if x_window is not None:
        assert spec.interp_backend == 'xla', \
            "x_window (tile-local decode) requires interp_backend='xla'"
        grid = decode_volume(spec, params, train_gates=train_gates, rng=rng,
                             masks=masks, x_window=x_window)
        W = spec.grid_size
        start, length = x_window
        # re-express coordinate 0 in the window's normalized frame: pixel
        # coordinate pix = ((c+1)*W - 1)/2 must equal ((c'+1)*r - 1)/2 + start
        c0 = ((coords[:, 0] + 1.0) * W - 2.0 * jnp.asarray(start, coords.dtype)
              ) / float(length) - 1.0
        coords_local = jnp.concatenate(
            [c0[:, None], coords[:, 1:]], axis=1)
        feats = grid_sample_3d(grid, coords_local)
        emb = fourier_embed(coords, spec.n_freqs)
        x = jnp.concatenate([coords, emb, feats.astype(jnp.float32)], axis=-1)
        out = mlp_apply(list(params.mlp_w), list(params.mlp_b), x, snake_alt)
        if not train:
            out = jnp.clip(out, -1.0, 1.0)
        return out
    grid = decode_volume(spec, params, train_gates=train_gates, rng=rng,
                         masks=masks)
    bf16 = spec.compute_dtype == 'bfloat16'
    if spec.interp_backend == 'fused' and _fused_eligible(spec):
        from ..ops.fused_forward import fused_forward
        # 'mixed' = f32-split interpolation + single-pass bf16 MLP — the
        # same effective numerics as the pallas+XLA path it replaces
        out = fused_forward(grid, coords, list(params.mlp_w),
                            list(params.mlp_b), spec.n_freqs,
                            precision='bf16' if bf16 else 'mixed')
        if not train:
            out = jnp.clip(out, -1.0, 1.0)
        return out
    if spec.interp_backend.startswith('pallas') or spec.interp_backend == 'fused':
        from ..ops.pallas_kernels import pallas_grid_sample_3d
        prec = ('bf16' if (spec.interp_backend == 'pallas_bf16' or bf16)
                else 'f32')
        feats = pallas_grid_sample_3d(grid, coords, precision=prec)  # (N, F)
    else:
        feats = grid_sample_3d(grid.astype(jnp.bfloat16) if bf16 else grid,
                               coords)                         # (N, F)
    emb = fourier_embed(coords, spec.n_freqs)
    x = jnp.concatenate([coords, emb, feats.astype(jnp.float32)], axis=-1)
    if spec.mlp_backend == 'pallas':
        from ..ops.mlp_pallas import mlp_apply_pallas
        out = mlp_apply_pallas(list(params.mlp_w), list(params.mlp_b), x,
                               precision='bf16')
    elif bf16:
        out = mlp_apply([w.astype(jnp.bfloat16) for w in params.mlp_w],
                        [b.astype(jnp.bfloat16) for b in params.mlp_b],
                        x.astype(jnp.bfloat16), snake_alt)
        out = out.astype(jnp.float32)
    else:
        out = mlp_apply(list(params.mlp_w), list(params.mlp_b), x, snake_alt)
    if not train:
        out = jnp.clip(out, -1.0, 1.0)
    return out


# ---------------------------------------------------------------------------
# Baking / pruning (between training phases; host-level, not in the hot loop)
# ---------------------------------------------------------------------------

def save_dropvalues_on_grid(spec: ModelSpec, params: ModelParams, gate_aux):
    """Bake gate values into the grid; returns (params', masks, zeros).

    Reference Feature_Grid_Model.py:110-128: multiplies each coefficient
    tensor with gate*mask, counts resulting zeros, and discounts the
    binary-mask storage cost (one bit per gate value => size/32 floats).
    ``zeros`` is that discounted count (a float, can be negative).
    ``masks`` are the frozen per-level keep-masks applied during finetuning.
    """
    if not spec.drop_type:
        return params, None, 0.0
    masks = G.pruning_masks(spec.drop_type, params.gates, gate_aux,
                            spec.thresholds)
    baked = G.bake_values(spec.drop_type, params.gates, gate_aux,
                          params.coeffs, spec.thresholds)
    zeros = sum(int(c.size - jnp.count_nonzero(c)) for c in baked)
    mask_bits = G.gate_size(spec.drop_type, params.gates)
    zeros_discounted = float(zeros) - mask_bits / 32.0
    return params.replace(coeffs=tuple(baked)), masks, zeros_discounted


def remove_drop_layers(spec: ModelSpec, params: ModelParams,
                       masks: Optional[Tuple[jax.Array, ...]]) -> ModelParams:
    """Hard-prune: coeffs *= mask, gates dropped (Feature_Grid_Model.py:130-140)."""
    if masks is None:
        return params
    coeffs = tuple(c * m[None] for c, m in zip(params.coeffs, masks))
    return params.replace(coeffs=coeffs, gates=None)


def num_net_params(params: ModelParams) -> int:
    """Parameter count excluding gates (training.py:25-27 'drop' filter)."""
    n = sum(c.size for c in params.coeffs)
    n += sum(w.size for w in params.mlp_w)
    n += sum(b.size for b in params.mlp_b)
    return int(n)
