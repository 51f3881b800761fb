"""Fused SnakeAlt-MLP forward+backward as one Pallas TPU kernel each way.

STATUS (r4): opt-in via ModelSpec.mlp_backend='pallas'; NOT the default.
Measured in the full flagship train step on one chip the fused MLP runs
2.42 ms/step vs 1.28 ms for the XLA chain, even though STANDALONE the same
kernel matches XLA (1.64 vs 1.71 ms/step scan-amortized): the +1.14 ms is a
scheduling effect — XLA cannot software-pipeline the step's other ops
across custom-call boundaries the way it overlaps its own fusions, so every
added invocation serializes real work (the same pathology that sank the
one-kernel fused_forward.py; rewriting the backward's transposes as
dot_general contractions changed nothing).  Conclusion recorded so r5
doesn't re-try standalone kernels blind: keep the number of custom calls
per step minimal — fusing the MLP means folding it into the existing
interp kernels' two invocations, not adding new ones.  The kernel stays
because it is parity-tested (tests/test_mlp_pallas.py) and is the building
block for that fold-in.

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


def _fwd_kernel(x_ref, *rest, n_layers, precision):
    nw = n_layers + 1
    w_refs = rest[:nw]
    b_refs = rest[nw:2 * nw]
    out_ref = rest[-1]
    h = x_ref[:, :]
    for i in range(n_layers):
        h = _snake(_dot(h, w_refs[i][:, :], precision) + b_refs[i][:, :])
    out_ref[:, :] = _dot(h, w_refs[-1][:, :], precision) + b_refs[-1][:, :]


def _bwd_kernel(x_ref, *rest, n_layers, precision):
    nw = n_layers + 1
    w_refs = rest[:nw]
    b_refs = rest[nw:2 * nw]
    g_ref = rest[2 * nw]
    dx_ref = rest[2 * nw + 1]
    dw_refs = rest[2 * nw + 2:3 * nw + 2]
    db_refs = rest[3 * nw + 2:4 * nw + 2]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in list(dw_refs) + list(db_refs):
            r[:, :] = jnp.zeros_like(r)

    # recompute the forward chain (activations stay in VMEM)
    hs = [x_ref[:, :]]
    zs = []
    h = hs[0]
    for i in range(n_layers):
        z = _dot(h, w_refs[i][:, :], precision) + b_refs[i][:, :]
        zs.append(z)
        h = _snake(z)
        hs.append(h)

    g = g_ref[:, :]
    dw_refs[-1][:, :] += _dot_tn(hs[-1], g, precision)
    db_refs[-1][:, :] += jnp.sum(g, axis=0, keepdims=True)
    dh = _dot_nt(g, w_refs[-1][:, :], precision)
    for i in range(n_layers - 1, -1, -1):
        dz = dh * _snake_grad(zs[i])
        dw_refs[i][:, :] += _dot_tn(hs[i], dz, precision)
        db_refs[i][:, :] += jnp.sum(dz, axis=0, keepdims=True)
        dh = _dot_nt(dz, w_refs[i][:, :], precision)
    dx_ref[:, :] = dh


def _call(kernel, xp, wp, bp, static, extra_in=(), extra_specs=(),
          out_specs=None, out_shape=None):
    (block_n, n_layers, precision, interpret) = static
    n = xp.shape[0]
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((block_n, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [blk]
    in_specs += [row((LANE, LANE))] * (n_layers + 1)
    in_specs += [row((1, LANE))] * (n_layers + 1)
    in_specs += list(extra_specs)
    return pl.pallas_call(
        functools.partial(kernel, n_layers=n_layers, precision=precision),
        grid=(n // block_n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xp, *wp, *bp, *extra_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mlp(xp, wp, bp, static, n_layers):
    out, _ = _mlp_fwd(xp, wp, bp, static, n_layers)
    return out


def _mlp_fwd(xp, wp, bp, static, n_layers):
    (block_n, _nl, precision, interpret) = static
    n = xp.shape[0]
    out = _call(_fwd_kernel, xp, wp, bp, static,
                out_specs=pl.BlockSpec((block_n, LANE), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, LANE), jnp.float32))
    return out, (xp, wp, bp)


def _mlp_bwd(static, n_layers, res, g):
    (block_n, _nl, precision, interpret) = static
    xp, wp, bp = res
    n = xp.shape[0]
    nw = n_layers + 1
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((block_n, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out_specs = ([blk] + [row((LANE, LANE))] * nw + [row((1, LANE))] * nw)
    out_shape = ([jax.ShapeDtypeStruct((n, LANE), jnp.float32)]
                 + [jax.ShapeDtypeStruct((LANE, LANE), jnp.float32)] * nw
                 + [jax.ShapeDtypeStruct((1, LANE), jnp.float32)] * nw)
    outs = _call(_bwd_kernel, xp, wp, bp, static,
                 extra_in=(g,), extra_specs=(blk,),
                 out_specs=out_specs, out_shape=out_shape)
    dx = outs[0]
    dws = tuple(outs[1:1 + nw])
    dbs = tuple(outs[1 + nw:1 + 2 * nw])
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
    wp = tuple(jnp.pad(w, ((0, LANE - w.shape[0]), (0, LANE - w.shape[1])))
               for w in weights)
    bp = tuple(jnp.pad(b[None, :], ((0, 0), (0, LANE - b.shape[-1])))
               for b in biases)
    static = (block_n, n_layers, precision, interpret)
    out = _mlp(xp, wp, bp, static, n_layers)
    return out[:n, :d_out]
