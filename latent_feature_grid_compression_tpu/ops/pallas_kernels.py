"""Pallas TPU kernels for the interpolation hot path.

The north-star fused op (SURVEY.md §2.2): trilinear feature-grid interpolation
at sampled coordinates with a hand-written backward that accumulates into the
grid WITHOUT scatter — both directions are expressed as blocked matmuls so
they run on the MXU with deterministic accumulation.

Formulation (separable / factored one-hot).  Trilinear weights are a product
of three hat functions, hat(d) = max(0, 1 - |d|):

  out[n, c] = sum_{z, y, x} hat(pz_n - z) hat(py_n - y) hat(px_n - x) G[z,y,x,c]

A naive one-hot matmul materializes the full (N, D*H*W) weight matrix A and
pays a (N, DHW) @ (DHW, C) MXU contraction.  With C ~ 16 of 128 output lanes
used, that wastes ~8x of the MXU *and* ~5 VPU passes over an (N, DHW) tile to
build A.  Instead we factor the z axis out of the contraction:

  W2[n, y*W + x]        = hat(py_n - y) * hat(px_n - x)        (N, HW)  small
  tmp[n, z*C + c]       = W2 @ G_stack,  G_stack[(y*W+x), z*C+c] = G[z,y,x,c]
  out[n, c]             = sum_z hat(pz_n - z) * tmp[n, z*C + c]
                        = (Hz_exp * tmp) @ S,   S[z*C+c', c] = [c' == c]

Both matmuls now have >= 128 useful output lanes (D*C ~ 288), cutting padded
MXU work ~3x and the VMEM weight-build ~5x versus the full-A kernel; measured
~2.2x end-to-end step throughput on v5e at the flagship shapes.  The backward
is the exact transpose:

  g_exp = g @ S^T; g2 = Hz_exp * g_exp; dG_stack = W2^T @ g2

All operands are explicitly zero-padded to lane multiples host-side (cell
coordinate rows are padded with -4 so their hat weights vanish), so no Pallas
implicit block padding is ever read.  Out-of-range corners get zero hat
weight, reproducing torch grid_sample's zero padding for free.

Matmul precision: the MXU multiplies in bf16.  `precision='f32'` (default)
splits inexact operands into high/low bf16 halves and runs accumulating
passes (3 for the main contraction, 2 where one operand is an exact 0/1
matrix), giving ~1e-6 relative error.  `precision='bf16'` runs single passes
(~4e-3 relative error, mixed-precision training regime).

The public entry :func:`pallas_grid_sample_3d` has the exact semantics of
ops.interpolation.grid_sample_3d (torch grid_sample align_corners=False,
zero padding, reference model/Feature_Grid_Model.py:63) and is verified
against it in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cells_xy(H: int, W: int, hw_pad: int) -> np.ndarray:
    """(2, HWp) rows [jx; jy] of the flat (y*W + x) layout, f32; padding
    lanes are -4 so every hat weight there is exactly zero."""
    out = np.full((2, hw_pad), -4.0, np.float32)
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
    out[0, :H * W] = x.ravel()
    out[1, :H * W] = y.ravel()
    return out


def _cells_z(D: int, C: int, dc_pad: int) -> np.ndarray:
    """(1, DCp) row of jz for the stacked (z*C + c) layout, padded with -4."""
    out = np.full((1, dc_pad), -4.0, np.float32)
    out[0, :D * C] = np.repeat(np.arange(D), C).astype(np.float32)
    return out


def _sum_z_matrix(D: int, C: int, dc_pad: int, c_pad: int) -> np.ndarray:
    """(DCp, Cp) 0/1 matrix S with S[z*C + c, c] = 1 (sum over z)."""
    s = np.zeros((dc_pad, c_pad), np.float32)
    idx = np.arange(D * C)
    s[idx, idx % C] = 1.0
    return s


def _hat(p, j):
    """hat(p - j) for a (bn, 1) column against a (1, L) cell row."""
    return jnp.maximum(1.0 - jnp.abs(p - j), 0.0)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_f32(a, b):
    """~f32-accurate matmul out of three bf16 MXU passes."""
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    out += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    out += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    return out


def _dot_f32_right_exact(a, b):
    """a @ b where b is exactly representable in bf16 (0/1 matrix)."""
    a_hi, a_lo = _split_bf16(a)
    b16 = b.astype(jnp.bfloat16)
    out = jnp.dot(a_hi, b16, preferred_element_type=jnp.float32)
    out += jnp.dot(a_lo, b16, preferred_element_type=jnp.float32)
    return out


def _dot(a, b, precision, right_exact=False):
    if precision == 'f32':
        return (_dot_f32_right_exact if right_exact else _dot_f32)(a, b)
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _w2_hz(pix_ref, cxy_ref, cz_ref):
    """Build the (bn, HWp) xy-weight tile and (bn, DCp) z-weight tile."""
    px = pix_ref[:, 0][:, None]
    py = pix_ref[:, 1][:, None]
    pz = pix_ref[:, 2][:, None]
    w2 = _hat(px, cxy_ref[0, :][None, :]) * _hat(py, cxy_ref[1, :][None, :])
    hz = _hat(pz, cz_ref[0, :][None, :])
    return w2, hz


def _fwd_kernel(pix_ref, cxy_ref, cz_ref, gstack_ref, s_ref, out_ref, *,
                precision):
    w2, hz = _w2_hz(pix_ref, cxy_ref, cz_ref)
    tmp = _dot(w2, gstack_ref[:, :], precision)          # (bn, DCp)
    out_ref[:, :] = _dot(hz * tmp, s_ref[:, :], precision, right_exact=True)


def _bwd_kernel(pix_ref, cxy_ref, cz_ref, g_ref, st_ref, dg_ref, *,
                precision):
    # dG_stack += W2^T @ (Hz_exp * (g @ S^T)) for this sample block; grid
    # dim 0 iterates blocks and accumulates into the single output block
    # (sequential TPU grid).
    w2, hz = _w2_hz(pix_ref, cxy_ref, cz_ref)
    g_exp = _dot(g_ref[:, :], st_ref[:, :], precision, right_exact=True)
    contrib = _dot(w2.T, hz * g_exp, precision)          # (HWp, DCp)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[:, :] = jnp.zeros_like(dg_ref)

    dg_ref[:, :] += contrib


def _fwd_kernel_blocked(pix_ref, cxy_ref, cz_ref, gstack_ref, s_ref, out_ref,
                        acc_ref, *, precision):
    """Forward with the HW axis blocked (large grids): grid = (n_blk, hw_blk),
    hw innermost; partial W2 @ Gstack contributions accumulate in a VMEM
    scratch, the z-contraction runs once on the last hw block."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    px = pix_ref[:, 0][:, None]
    py = pix_ref[:, 1][:, None]
    w2 = _hat(px, cxy_ref[0, :][None, :]) * _hat(py, cxy_ref[1, :][None, :])
    acc_ref[:, :] += _dot(w2, gstack_ref[:, :], precision)

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        pz = pix_ref[:, 2][:, None]
        hz = _hat(pz, cz_ref[0, :][None, :])
        out_ref[:, :] = _dot(hz * acc_ref[:, :], s_ref[:, :], precision,
                             right_exact=True)


def _bwd_kernel_blocked(pix_ref, cxy_ref, cz_ref, g_ref, st_ref, dg_ref, *,
                        precision):
    """Backward with the HW axis blocked: grid = (hw_blk, n_blk), n innermost
    accumulating into this hw block's dG_stack slab."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dg_ref[:, :] = jnp.zeros_like(dg_ref)

    px = pix_ref[:, 0][:, None]
    py = pix_ref[:, 1][:, None]
    pz = pix_ref[:, 2][:, None]
    w2 = _hat(px, cxy_ref[0, :][None, :]) * _hat(py, cxy_ref[1, :][None, :])
    hz = _hat(pz, cz_ref[0, :][None, :])
    g_exp = _dot(g_ref[:, :], st_ref[:, :], precision, right_exact=True)
    dg_ref[:, :] += _dot(w2.T, hz * g_exp, precision)


def _pallas_forward_blocked(pix, cxy, cz, gstack, s, *, block_n, hw_block,
                            precision, interpret):
    n = pix.shape[0]
    hwp, dcp = gstack.shape
    cp = s.shape[1]
    kernel = functools.partial(_fwd_kernel_blocked, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(n // block_n, hwp // hw_block),
        in_specs=[
            pl.BlockSpec((block_n, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hw_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dcp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hw_block, dcp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dcp, cp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, cp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_n, dcp), jnp.float32)],
        interpret=interpret,
    )(pix, cxy, cz, gstack, s)


def _pallas_backward_blocked(pix, cxy, cz, g, st, hwp, *, block_n, hw_block,
                             precision, interpret):
    n, cp = g.shape
    dcp = st.shape[1]
    kernel = functools.partial(_bwd_kernel_blocked, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(hwp // hw_block, n // block_n),
        in_specs=[
            pl.BlockSpec((block_n, 3), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hw_block), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dcp), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, cp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, dcp), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hw_block, dcp), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hwp, dcp), jnp.float32),
        interpret=interpret,
    )(pix, cxy, cz, g, st)


def _pallas_forward(pix, cxy, cz, gstack, s, *, block_n, precision, interpret):
    n = pix.shape[0]
    hwp, dcp = gstack.shape
    cp = s.shape[1]
    kernel = functools.partial(_fwd_kernel, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hwp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dcp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hwp, dcp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dcp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cp), jnp.float32),
        interpret=interpret,
    )(pix, cxy, cz, gstack, s)


def _pallas_backward(pix, cxy, cz, g, st, hwp, *, block_n, precision,
                     interpret):
    n, cp = g.shape
    dcp = st.shape[1]
    kernel = functools.partial(_bwd_kernel, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hwp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dcp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, dcp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hwp, dcp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hwp, dcp), jnp.float32),
        interpret=interpret,
    )(pix, cxy, cz, g, st)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _interp(gstack, consts, block_n, hw_block, precision, interpret):
    """hw_block == 0 selects the unblocked (grid fully VMEM-resident) path."""
    pix, cxy, cz, s = consts
    if hw_block:
        return _pallas_forward_blocked(pix, cxy, cz, gstack, s,
                                       block_n=block_n, hw_block=hw_block,
                                       precision=precision,
                                       interpret=interpret)
    return _pallas_forward(pix, cxy, cz, gstack, s, block_n=block_n,
                           precision=precision, interpret=interpret)


def _interp_fwd(gstack, consts, block_n, hw_block, precision, interpret):
    out = _interp(gstack, consts, block_n, hw_block, precision, interpret)
    return out, (consts, gstack.shape[0])


def _interp_bwd(block_n, hw_block, precision, interpret, res, g):
    (pix, cxy, cz, s), hwp = res
    if hw_block:
        dg = _pallas_backward_blocked(pix, cxy, cz, g, s.T, hwp,
                                      block_n=block_n, hw_block=hw_block,
                                      precision=precision,
                                      interpret=interpret)
    else:
        dg = _pallas_backward(pix, cxy, cz, g, s.T, hwp, block_n=block_n,
                              precision=precision, interpret=interpret)
    return dg, None


_interp.defvjp(_interp_fwd, _interp_bwd)


# Unblocked path only while the whole padded G_stack + weight tiles fit
# comfortably in VMEM; above this the HW axis is blocked.
_UNBLOCKED_HW_LIMIT = 512


def _pick_block_n(hwp: int, dcp: int) -> int:
    """Largest sample block whose per-row VMEM footprint (the xy-weight tile
    plus ~3 (bn, DCp) f32 temporaries and bf16 splits) stays within ~8 MB."""
    per_row = (min(hwp, _UNBLOCKED_HW_LIMIT) + 3 * dcp) * 4 * 2
    for bn in (2048, 1024, 512, 256):
        if bn * per_row <= 8 * 1024 * 1024:
            return bn
    return 128


def pallas_grid_sample_3d(features: jax.Array, coords: jax.Array,
                          interpret: bool = False,
                          precision: str = 'f32') -> jax.Array:
    """Drop-in fused replacement for ops.interpolation.grid_sample_3d.

    features: (C, D, H, W); coords: (N, 3) in [-1, 1], torch grid_sample
    coordinate order (x->W).  N is padded to the block size internally.
    Differentiable wrt features (MXU matmul backward, no scatter); coords
    gradients are not defined (the training loop never differentiates wrt
    sampled positions).  precision: 'f32' (multi-pass bf16 split, ~1e-6 rel)
    or 'bf16' (single MXU passes, ~4e-3 rel).
    """
    C, D, H, W = features.shape
    n = coords.shape[0]
    dcp = _round_up(D * C, 128)
    cp = _round_up(C, 128)
    # large grids: block the HW axis (grid=(n,hw) with a VMEM accumulator)
    # so the padded G_stack never has to be VMEM-resident at once
    hw_block = _UNBLOCKED_HW_LIMIT if H * W > _UNBLOCKED_HW_LIMIT else 0
    hwp = _round_up(H * W, hw_block or 128)
    block_n = _pick_block_n(hwp, dcp)
    sizes = jnp.asarray([W, H, D], dtype=coords.dtype)
    pix = ((coords + 1.0) * sizes - 1.0) * 0.5   # align_corners=False
    n_pad = _round_up(max(n, block_n), block_n)
    if n_pad != n:
        # pad far outside the grid: all hat weights are exactly zero
        pix = jnp.pad(pix, ((0, n_pad - n), (0, 0)), constant_values=-4.0)
    cxy = jnp.asarray(_cells_xy(H, W, hwp))
    cz = jnp.asarray(_cells_z(D, C, dcp))
    s = jnp.asarray(_sum_z_matrix(D, C, dcp, cp))
    # G_stack[(y*W + x), z*C + c] = features[c, z, y, x], zero-padded
    gstack = jnp.transpose(features, (2, 3, 1, 0)).reshape(H * W, D * C)
    gstack = jnp.pad(gstack, ((0, hwp - H * W), (0, dcp - D * C)))
    out = _interp(gstack, (jax.lax.stop_gradient(pix), cxy, cz, s),
                  block_n, hw_block, precision, interpret)
    return out[:n, :C]
