"""Fused SnakeAlt-MLP forward+backward as one Pallas TPU kernel each way.

STATUS (r4): opt-in via ModelSpec.mlp_backend='pallas'; NOT the default.
Measured in the full flagship train step on one chip the fused MLP runs
~2.4 ms/step vs ~1.3 ms for the XLA chain, even though STANDALONE the same
kernel matches XLA (1.64 vs 1.71 ms/step scan-amortized).  Three hypotheses
for the constant ~+1.1 ms were tested and ELIMINATED in-step:
  (1) in-kernel transposes — rewritten as dot_general contracting dims:
      no change;
  (2) invocation count — folding the MLP into the fused interp kernel pair
      (fused_forward 'mixed', same 2 invocations as the shipped path) still
      measures ~2.4 ms;
  (3) operand count — packing all weights/biases into single stacked
      operands (this file's current interface): no change.
The remaining explanation is an opaque scheduling property of this
remote-TPU platform: whenever the step's custom calls grow beyond the
two lean interpolation kernels, ~1.1 ms of cross-iteration overlap is
lost.  Practical rule for r5: only a profiler trace of the two step
variants side by side can localize it; do not iterate blind kernel
variants.  The kernel stays because it is parity-tested
(tests/test_mlp_pallas.py) and standalone-competitive.

The motivating arithmetic: the XLA MLP at flagship shapes
((32768, 31) -> 4x32 -> 1) costs ~0.4 ms of
the 1.28 ms train step fwd+bwd: ~10 small matmuls and ~8 transcendental
fusions, each paying an HBM round trip for its (N, 32) activations plus
per-op fixed cost.  Fusing the whole chain keeps every activation in VMEM:
HBM traffic is the (N, 128-padded) input, the (N, d_out) output, the padded
weights, and their gradients.

Design notes:
* Every layer is zero-padded to the 128-lane MXU tile.  At bf16 single-pass
  precision (the SAME effective precision as the XLA path: jnp.dot's
  DEFAULT precision on TPU is one bf16 pass) the padded FLOPs are ~80 us
  per step -- the padding is cheap; what was expensive in the one-kernel
  fused_forward.py attempt was 3-pass f32 splitting plus recomputing the
  interpolation, neither of which applies here.
* Backward recomputes the forward chain in-kernel (hs held in VMEM,
  block_n=1024 keeps the residency ~8 MB) and accumulates dW/db into
  single revisited output blocks over the sequential TPU grid; dX streams
  out per block and feeds the interpolation backward.
* Semantics: mlp_apply with snake_alt (reference Feature_Grid_Model.py:
  43-48, 72-75); parity asserted in tests/test_mlp_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _dot, _round_up, _split_bf16

LANE = 128


def _snake(x):
    s = jnp.sin(x)
    return 0.5 * x + s * s


def _snake_grad(x):
    return 0.5 + jnp.sin(2.0 * x)


def _dg(a16, b16, dims):
    return jax.lax.dot_general(a16, b16, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_dims(a, b, dims, precision):
    """Matmul with explicit contracting dims (avoids materializing .T)."""
    if precision == 'f32':
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)
        return (_dg(a_hi, b_hi, dims) + _dg(a_lo, b_hi, dims)
                + _dg(a_hi, b_lo, dims))
    return _dg(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims)


def _dot_tn(a, b, precision):
    """a^T @ b: contract dim 0 of both."""
    return _dot_dims(a, b, ((0,), (0,)), precision)


def _dot_nt(a, b, precision):
    """a @ b^T: contract dim 1 of both."""
    return _dot_dims(a, b, ((1,), (1,)), precision)


# Weights/biases travel as ONE stacked operand each ((nw*LANE, LANE) and
# (nw, LANE)) instead of 2*(n_layers+1) separate refs: Mosaic re-issues a
# DMA per operand per grid step even for constant-index blocks, and ~20
# small operands measurably serialize the whole step.
def _w(ws_ref, i):
    return ws_ref[i * LANE:(i + 1) * LANE, :]


def _fwd_kernel(x_ref, ws_ref, bs_ref, out_ref, *, n_layers, precision):
    h = x_ref[:, :]
    for i in range(n_layers):
        h = _snake(_dot(h, _w(ws_ref, i), precision) + bs_ref[i, :][None, :])
    out_ref[:, :] = (_dot(h, _w(ws_ref, n_layers), precision)
                     + bs_ref[n_layers, :][None, :])


def _bwd_kernel(x_ref, ws_ref, bs_ref, g_ref, dx_ref, dws_ref, dbs_ref, *,
                n_layers, precision):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dws_ref[:, :] = jnp.zeros_like(dws_ref)
        dbs_ref[:, :] = jnp.zeros_like(dbs_ref)

    # recompute the forward chain (activations stay in VMEM)
    hs = [x_ref[:, :]]
    zs = []
    h = hs[0]
    for i in range(n_layers):
        z = _dot(h, _w(ws_ref, i), precision) + bs_ref[i, :][None, :]
        zs.append(z)
        h = _snake(z)
        hs.append(h)

    g = g_ref[:, :]
    nw = n_layers + 1
    dws_ref[n_layers * LANE:nw * LANE, :] += _dot_tn(hs[-1], g, precision)
    dbs_ref[n_layers, :] += jnp.sum(g, axis=0)
    dh = _dot_nt(g, _w(ws_ref, n_layers), precision)
    for i in range(n_layers - 1, -1, -1):
        dz = dh * _snake_grad(zs[i])
        dws_ref[i * LANE:(i + 1) * LANE, :] += _dot_tn(hs[i], dz, precision)
        dbs_ref[i, :] += jnp.sum(dz, axis=0)
        dh = _dot_nt(dz, _w(ws_ref, i), precision)
    dx_ref[:, :] = dh


def _call(kernel, xp, ws, bs, static, extra_in=(), extra_specs=(),
          out_specs=None, out_shape=None):
    (block_n, n_layers, precision, interpret) = static
    n = xp.shape[0]
    nw = n_layers + 1
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((block_n, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [blk, row((nw * LANE, LANE)), row((nw, LANE))]
    in_specs += list(extra_specs)
    return pl.pallas_call(
        functools.partial(kernel, n_layers=n_layers, precision=precision),
        grid=(n // block_n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xp, ws, bs, *extra_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mlp(xp, wp, bp, static, n_layers):
    out, _ = _mlp_fwd(xp, wp, bp, static, n_layers)
    return out


def _mlp_fwd(xp, ws, bs, static, n_layers):
    (block_n, _nl, precision, interpret) = static
    n = xp.shape[0]
    out = _call(_fwd_kernel, xp, ws, bs, static,
                out_specs=pl.BlockSpec((block_n, LANE), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, LANE), jnp.float32))
    return out, (xp, ws, bs)


def _mlp_bwd(static, n_layers, res, g):
    (block_n, _nl, precision, interpret) = static
    xp, ws, bs = res
    n = xp.shape[0]
    nw = n_layers + 1
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((block_n, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out_specs = [blk, row((nw * LANE, LANE)), row((nw, LANE))]
    out_shape = [jax.ShapeDtypeStruct((n, LANE), jnp.float32),
                 jax.ShapeDtypeStruct((nw * LANE, LANE), jnp.float32),
                 jax.ShapeDtypeStruct((nw, LANE), jnp.float32)]
    outs = _call(_bwd_kernel, xp, ws, bs, static,
                 extra_in=(g,), extra_specs=(blk,),
                 out_specs=out_specs, out_shape=out_shape)
    dx, dws, dbs = outs
    return dx, dws, dbs


_mlp.defvjp(_mlp_fwd, _mlp_bwd)


def mlp_apply_pallas(weights: Sequence[jax.Array], biases: Sequence[jax.Array],
                     x: jax.Array, *, precision: str = 'bf16',
                     block_n: int = 1024,
                     interpret: bool = False) -> jax.Array:
    """Fused-MLP drop-in for ops.mlp.mlp_apply (SnakeAlt activations).

    x: (N, d_in); weights/biases as in mlp_apply.  All dims must be <= 128.
    precision 'bf16' = one MXU pass per dot (the XLA path's effective
    default on TPU); 'f32' = 3-pass bf16 splitting (~1e-6 rel).
    Differentiable wrt x, weights, biases.
    """
    n, d_in = x.shape
    d_out = biases[-1].shape[-1]
    n_layers = len(weights) - 1
    assert d_in <= LANE and d_out <= LANE
    assert all(w.shape[0] <= LANE and w.shape[1] <= LANE for w in weights)

    n_pad = _round_up(max(n, block_n), block_n)
    xp = jnp.pad(x, ((0, n_pad - n), (0, LANE - d_in)))
    ws = jnp.concatenate(
        [jnp.pad(w, ((0, LANE - w.shape[0]), (0, LANE - w.shape[1])))
         for w in weights], axis=0)                    # (nw*LANE, LANE)
    bs = jnp.stack([jnp.pad(b, (0, LANE - b.shape[-1])) for b in biases])
    static = (block_n, n_layers, precision, interpret)
    out = _mlp(xp, ws, bs, static, n_layers)
    return out[:n, :d_out]
