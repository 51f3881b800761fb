"""Fully-fused model forward: interpolation + fourier embedding + MLP in ONE
Pallas TPU kernel, with a recompute-based backward.

STATUS (r4): opt-in, NOT the default.  Measured end-to-end at flagship
shapes (examples/bench_step_backends.py, one v5e chip) this kernel runs the
train step at 3.67 ms vs 2.11 ms for the two-kernel path
(ops/pallas_kernels.py interp + XLA MLP), so resolve_interp_backend('auto')
picks 'pallas'.  Suspected causes of the gap: every MLP layer is padded to
128x128 lanes with 3-pass f32 splitting (~16x the useful FLOPs, doubled by
the recompute-based backward), and the ~22 VMEM-resident refs of the
backward kernel at block_n=1024 likely exceed comfortable VMEM pipelining.
Kept because it is parity-tested (tests/test_fused_forward.py) and is the
scaffold for a packed-lane v2; any future default flip must win
bench_step_backends.py first (bench.py --check guards the end-to-end rate).

Original motivation (v5e, flagship shapes): the unfused
step spends ~0.36 ms in interp fwd+bwd and another ~0.36 ms in the 4x32 MLP
— almost all of it HBM round trips for (N, 128)-padded activations between
tiny matmuls, not FLOPs.  Fusing the whole sample pipeline keeps every
activation in VMEM: the only HBM traffic is the decoded grid (G_stack, a
few hundred KB), the (N, 3) coordinates, and the (N, d_out) prediction.

Pipeline inside the kernel (per sample block, all VMEM-resident):

  w2, hz      separable trilinear hat weights        (pallas_kernels.py docs)
  tmp         = w2 @ G_stack                         MXU
  X           = [coords | fourier(coords) | 0...] + (hz*tmp) @ S_shift
                where S_shift scatters the C feature lanes to columns
                emb_dim..emb_dim+C of the 128-wide MLP input
  h_i         = SnakeAlt(h_{i-1} @ W_i + b_i)        (0.5x + sin^2 x)
  out         = h_L @ W_head + b_head                -> (bn, d_out)

Backward recomputes the forward chain in-kernel (FLOPs are nearly free at
these sizes) and emits dG_stack, dW_i, db_i via the exact transposes; the
grid iterates sample blocks sequentially, accumulating into the single
output block, so accumulation order is deterministic.  Coordinate gradients
are not defined (training never differentiates wrt positions).

Weight layout: every layer is zero-padded to 128 lanes (the MXU tile), so
the padded gradient rows/cols are exactly zero and are sliced off on exit.

Matches the reference semantics of model/Feature_Grid_Model.py:50-80
(grid_sample align_corners=False + Feature_Embedding + SnakeAlt MLP); parity
with the unfused path is asserted in tests/test_fused_forward.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (_cells_xy, _cells_z, _dot, _hat, _round_up,
                             _w2_hz)
from .mlp_pallas import _dot_nt, _dot_tn

LANE = 128


def _scatter_matrix(D: int, C: int, dc_pad: int, col0: int) -> np.ndarray:
    """(DCp, LANE) 0/1 matrix: sums over z AND scatters feature c to MLP
    input column col0 + c (fusing the z-contraction with the concat)."""
    s = np.zeros((dc_pad, LANE), np.float32)
    idx = np.arange(D * C)
    s[idx, col0 + idx % C] = 1.0
    return s


def _emb_cols(coords, n_freqs: int, d_in: int):
    """[coords | sin/cos fourier stack] as a (bn, 3 + 2*n_freqs*d_in) tile."""
    parts = [coords]
    for k in range(n_freqs):
        f = (2.0 ** k) * 2.0 * np.pi
        parts.append(jnp.sin(coords * f))
        parts.append(jnp.cos(coords * f))
    return jnp.concatenate(parts, axis=1)


def _snake(x):
    s = jnp.sin(x)
    return 0.5 * x + s * s


def _snake_grad(x):
    return 0.5 + jnp.sin(2.0 * x)


def _mlp_chain(x0, w_refs, b_refs, precision):
    """Forward through the padded MLP; returns (out, pre_activations)."""
    pre = []
    h = x0
    for i in range(len(w_refs) - 1):
        z = _dot(h, w_refs[i][:, :], precision) + b_refs[i][:, :]
        pre.append(z)
        h = _snake(z)
    out = _dot(h, w_refs[-1][:, :], precision) + b_refs[-1][:, :]
    return out, pre


def _prec_split(precision):
    """(interp_precision, mlp_precision).  'mixed' = f32-split interpolation
    + single-pass bf16 MLP (the XLA MLP's effective TPU default)."""
    if precision == 'mixed':
        return 'f32', 'bf16'
    return precision, precision


def _fwd_kernel(pix_ref, crd_ref, cxy_ref, cz_ref, gstack_ref, s_ref,
                *rest, n_layers, n_freqs, d_in, d_out, precision):
    w_refs = rest[:n_layers + 1]
    b_refs = rest[n_layers + 1:2 * (n_layers + 1)]
    out_ref, x0_ref = rest[-2], rest[-1]
    iprec, mprec = _prec_split(precision)
    w2, hz = _w2_hz(pix_ref, cxy_ref, cz_ref)
    tmp = _dot(w2, gstack_ref[:, :], iprec)                 # (bn, DCp)
    x0 = _dot(hz * tmp, s_ref[:, :], iprec, right_exact=True)  # (bn,128)
    emb = _emb_cols(crd_ref[:, :], n_freqs, d_in)
    x0 = x0 + jnp.pad(emb, ((0, 0), (0, LANE - emb.shape[1])))
    x0_ref[:, :] = x0                # residual: saves the backward from
    out, _ = _mlp_chain(x0, w_refs, b_refs, mprec)  # recomputing the interp
    out_ref[:, :] = out[:, :out_ref.shape[1]]


def _bwd_kernel(pix_ref, crd_ref, cxy_ref, cz_ref, gstack_ref, s_ref,
                *rest, n_layers, n_freqs, d_in, d_out, precision):
    nw = n_layers + 1
    w_refs = rest[:nw]
    b_refs = rest[nw:2 * nw]
    g_ref = rest[2 * nw]
    x0_ref = rest[2 * nw + 1]
    dg_ref = rest[2 * nw + 2]
    dw_refs = rest[2 * nw + 3:3 * nw + 3]
    db_refs = rest[3 * nw + 3:4 * nw + 3]
    iprec, mprec = _prec_split(precision)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[:, :] = jnp.zeros_like(dg_ref)
        for r in list(dw_refs) + list(db_refs):
            r[:, :] = jnp.zeros_like(r)

    # --- recompute only the cheap MLP chain from the saved x0 residual ----
    # (the forward's interpolation matmuls are NOT redone; only the VPU hat
    # weights are rebuilt for the grid-gradient contraction below)
    x0 = x0_ref[:, :]
    hs = [x0]
    pre = []
    h = x0
    for i in range(n_layers):
        z = _dot(h, w_refs[i][:, :], mprec) + b_refs[i][:, :]
        pre.append(z)
        h = _snake(z)
        hs.append(h)

    # --- backward ---------------------------------------------------------
    g = g_ref[:, :]                                         # (bn, d_out)
    gp = jnp.pad(g, ((0, 0), (0, LANE - g.shape[1])))
    dw_refs[-1][:, :] += _dot_tn(hs[-1], gp, mprec)
    db_refs[-1][:, :] += jnp.sum(gp, axis=0, keepdims=True)
    dh = _dot_nt(gp, w_refs[-1][:, :], mprec)               # (bn, 128)
    for i in range(n_layers - 1, -1, -1):
        dz = dh * _snake_grad(pre[i])
        dw_refs[i][:, :] += _dot_tn(hs[i], dz, mprec)
        db_refs[i][:, :] += jnp.sum(dz, axis=0, keepdims=True)
        dh = _dot_nt(dz, w_refs[i][:, :], mprec)
    # dh is now dX: route the feature lanes back through the interpolation
    w2, hz = _w2_hz(pix_ref, cxy_ref, cz_ref)
    dfeat_exp = _dot(dh, s_ref[:, :].T, iprec, right_exact=True)
    dg_ref[:, :] += _dot(w2.T, hz * dfeat_exp, iprec)


def _pad_lane(a: jax.Array, rows: int = 0) -> jax.Array:
    """Zero-pad a weight/bias to (rows or same, LANE) lanes."""
    if a.ndim == 1:
        a = a[None, :]
    r = rows or a.shape[0]
    return jnp.pad(a, ((0, r - a.shape[0]), (0, LANE - a.shape[1])))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused(gstack, weights, biases, consts, static, interpret):
    out, _ = _fused_fwd(gstack, weights, biases, consts, static, interpret)
    return out


def _call(kernel, gstack, weights, biases, static, consts, interpret,
          extra_in=(), extra_specs=(), out_specs=None, out_shape=None):
    (block_n, n_layers, n_freqs, d_in, d_out, precision) = static
    pix, crd, cxy, cz, s = consts
    n = pix.shape[0]
    hwp, dcp = gstack.shape
    grid = (n // block_n,)
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    blk = lambda w: pl.BlockSpec((block_n, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [blk(3), blk(3), row((2, hwp)), row((1, dcp)),
                row((hwp, dcp)), row((dcp, LANE))]
    in_specs += [row((LANE, LANE))] * (n_layers + 1)
    in_specs += [row((1, LANE))] * (n_layers + 1)
    in_specs += list(extra_specs)
    return pl.pallas_call(
        functools.partial(kernel, n_layers=n_layers, n_freqs=n_freqs,
                          d_in=d_in, d_out=d_out, precision=precision),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(pix, crd, cxy, cz, gstack, s, *weights, *biases, *extra_in)


def _fused_fwd(gstack, weights, biases, consts, static, interpret):
    (block_n, n_layers, n_freqs, d_in, d_out, precision) = static
    n = consts[0].shape[0]
    blk = lambda w: pl.BlockSpec((block_n, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    out, x0 = _call(
        _fwd_kernel, gstack, weights, biases, static, consts, interpret,
        out_specs=[blk(d_out), blk(LANE)],
        out_shape=[jax.ShapeDtypeStruct((n, d_out), jnp.float32),
                   jax.ShapeDtypeStruct((n, LANE), jnp.float32)])
    return out, (gstack, weights, biases, consts, x0)


def _fused_bwd(static, interpret, res, g):
    (block_n, n_layers, n_freqs, d_in, d_out, precision) = static
    gstack, weights, biases, consts, x0 = res
    hwp, dcp = gstack.shape
    nw = n_layers + 1
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    blk = lambda w: pl.BlockSpec((block_n, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    out_specs = ([row((hwp, dcp))] + [row((LANE, LANE))] * nw
                 + [row((1, LANE))] * nw)
    out_shape = ([jax.ShapeDtypeStruct((hwp, dcp), jnp.float32)]
                 + [jax.ShapeDtypeStruct((LANE, LANE), jnp.float32)] * nw
                 + [jax.ShapeDtypeStruct((1, LANE), jnp.float32)] * nw)
    outs = _call(
        _bwd_kernel, gstack, weights, biases, static, consts, interpret,
        extra_in=(g, x0),
        extra_specs=(blk(d_out), blk(LANE)),
        out_specs=out_specs, out_shape=out_shape)
    dg = outs[0]
    # cotangents match the PADDED weights/biases passed to _fused; the outer
    # _pad_lane ops transpose to slices in the caller's AD.
    dws = tuple(outs[1:1 + nw])
    dbs = tuple(outs[1 + nw:1 + 2 * nw])
    return dg, dws, dbs, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_forward(features: jax.Array, coords: jax.Array,
                  weights: Sequence[jax.Array], biases: Sequence[jax.Array],
                  n_freqs: int, *, precision: str = 'f32',
                  interpret: bool = False, block_n: int = 1024) -> jax.Array:
    """One-kernel model forward at (N, 3) coords in [-1, 1].

    features: decoded (C, D, H, W) feature grid; weights/biases: MLP layers
    ([d_in_mlp->h], hidden..., [h->d_out]); differentiable wrt features and
    the MLP parameters.  Requires H*W small enough for the VMEM-resident
    formulation (the caller falls back to the unfused path otherwise) and
    mlp input/hidden widths <= 128.

    precision: 'f32' (3-pass bf16 splitting everywhere, ~1e-6 parity with
    the unfused f32 path), 'mixed' (f32-split interpolation + single-pass
    bf16 MLP — matching the unfused path's EFFECTIVE TPU numerics, where
    jnp.dot's default precision is one bf16 pass), or 'bf16'.
    """
    C, D, H, W = features.shape
    n, d_in = coords.shape
    d_out = biases[-1].shape[-1]
    n_layers = len(weights) - 1
    emb_cols = d_in + 2 * n_freqs * d_in
    assert emb_cols + C <= LANE and weights[0].shape[0] == emb_cols + C
    assert all(w.shape[1] <= LANE for w in weights)

    dcp = _round_up(D * C, LANE)
    hwp = _round_up(H * W, LANE)
    sizes = jnp.asarray([W, H, D], dtype=coords.dtype)
    pix = ((coords + 1.0) * sizes - 1.0) * 0.5       # align_corners=False
    n_pad = _round_up(max(n, block_n), block_n)
    crd = coords
    if n_pad != n:
        pix = jnp.pad(pix, ((0, n_pad - n), (0, 0)), constant_values=-4.0)
        crd = jnp.pad(crd, ((0, n_pad - n), (0, 0)))
    cxy = jnp.asarray(_cells_xy(H, W, hwp))
    cz = jnp.asarray(_cells_z(D, C, dcp))
    s = jnp.asarray(_scatter_matrix(D, C, dcp, emb_cols))
    gstack = jnp.transpose(features, (2, 3, 1, 0)).reshape(H * W, D * C)
    gstack = jnp.pad(gstack, ((0, hwp - H * W), (0, dcp - D * C)))

    # W1's rows are ordered [coords|emb|features] to match the reference
    # concat (Feature_Grid_Model.py:72); X in-kernel uses the same layout.
    wp = tuple(_pad_lane(w, LANE) for w in weights)
    bp = tuple(_pad_lane(b) for b in biases)
    static = (block_n, n_layers, n_freqs, d_in, d_out, precision)
    consts = (jax.lax.stop_gradient(pix), jax.lax.stop_gradient(crd),
              cxy, cz, s)
    out = _fused(gstack, wp, bp, consts, static, interpret)
    return out[:n]
