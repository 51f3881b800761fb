"""Pallas TPU kernels for the interpolation hot path.

The north-star fused op (SURVEY.md §2.2): trilinear feature-grid interpolation
at sampled coordinates with a hand-written backward that accumulates into the
grid WITHOUT scatter — both directions are expressed as blocked one-hot
matmuls so they run on the MXU with deterministic accumulation:

  forward : feats(N, C)  = A(N, M) @ grid_flat(M, C)
  backward: dgrid(M, C)  = A(N, M)^T @ g(N, C)

A is the sparse trilinear-weight matrix (8 nonzeros per row).  Its blocks are
materialized on the fly in VMEM — never in HBM — from the *separable hat
structure* of trilinear weights:

  A[i, (z*H + y)*W + x] = hat(pz_i - z) * hat(py_i - y) * hat(px_i - x),
  hat(d) = max(0, 1 - |d|)

where (px, py, pz) are the sample's pixel-space coordinates.  This needs only
~5 VPU passes over the (block_n, M) tile (two hat evaluations fused with two
multiplies), versus 8 iota-compare/select passes for an explicit one-hot
construction, and it reproduces torch grid_sample's zero padding for free:
out-of-range corners simply have no matching column.  M = D*H*W grid cells
(grid_size<=32 pyramids keep M*C well under VMEM).

Matmul precision: the MXU multiplies in bf16.  `precision='f32'` (default)
splits both operands into high/low bf16 halves and runs three accumulating
passes (x_hi*y_hi + x_lo*y_hi + x_hi*y_lo), giving ~1e-6 relative error at
~3x the single-pass cost — still far cheaper than building A twice.
`precision='bf16'` runs one pass (~4e-3 relative error, mixed-precision
training regime).

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


def _cell_coords(D: int, H: int, W: int) -> np.ndarray:
    """(3, M) per-cell (x, y, z) integer coordinates of the flat grid layout
    (z-major: flat = (z*H + y)*W + x), as f32 rows for the hat evaluation."""
    z, y, x = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                          indexing='ij')
    return np.stack([x.ravel(), y.ravel(), z.ravel()]).astype(np.float32)


def _build_a(pix_ref, cells_ref, block_n, m_cells):
    """Materialize the (block_n, M) trilinear weight block in VMEM."""
    px = pix_ref[:, 0][:, None]                  # (bn, 1)
    py = pix_ref[:, 1][:, None]
    pz = pix_ref[:, 2][:, None]
    jx = cells_ref[0, :][None, :]                # (1, M)
    jy = cells_ref[1, :][None, :]
    jz = cells_ref[2, :][None, :]
    hx = jnp.maximum(1.0 - jnp.abs(px - jx), 0.0)
    hy = jnp.maximum(1.0 - jnp.abs(py - jy), 0.0)
    hz = jnp.maximum(1.0 - jnp.abs(pz - jz), 0.0)
    return hx * hy * hz


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


def _dot(a, b, precision):
    if precision == 'f32':
        return _dot_f32(a, b)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _fwd_kernel(pix_ref, cells_ref, grid_ref, out_ref, *,
                block_n, m_cells, precision):
    a = _build_a(pix_ref, cells_ref, block_n, m_cells)
    out_ref[:, :] = _dot(a, grid_ref[:, :], precision)


def _bwd_kernel(pix_ref, cells_ref, g_ref, dgrid_ref, *,
                block_n, m_cells, precision):
    # dgrid += A^T @ g for this sample block; grid dim 0 iterates blocks and
    # accumulates into the single output block (sequential TPU grid).
    a = _build_a(pix_ref, cells_ref, block_n, m_cells)
    contrib = _dot(a.T, g_ref[:, :], precision)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgrid_ref[:, :] = jnp.zeros_like(dgrid_ref)

    dgrid_ref[:, :] += contrib


def _pallas_forward(pix, cells, grid_flat, *, block_n, precision, interpret):
    n = pix.shape[0]
    m, C = grid_flat.shape
    grid_blocks = n // block_n
    kernel = functools.partial(_fwd_kernel, block_n=block_n, m_cells=m,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(grid_blocks,),
        in_specs=[
            pl.BlockSpec((block_n, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, C), jnp.float32),
        interpret=interpret,
    )(pix, cells, grid_flat)


def _pallas_backward(pix, cells, g, m, *, block_n, precision, interpret):
    n, C = g.shape
    grid_blocks = n // block_n
    kernel = functools.partial(_bwd_kernel, block_n=block_n, m_cells=m,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(grid_blocks,),
        in_specs=[
            pl.BlockSpec((block_n, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, C), jnp.float32),
        interpret=interpret,
    )(pix, cells, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _interp(grid_flat, pc, block_n, precision, interpret):
    pix, cells = pc
    return _pallas_forward(pix, cells, grid_flat, block_n=block_n,
                           precision=precision, interpret=interpret)


def _interp_fwd(grid_flat, pc, block_n, precision, interpret):
    out = _interp(grid_flat, pc, block_n, precision, interpret)
    return out, (pc, grid_flat.shape[0])


def _interp_bwd(block_n, precision, interpret, res, g):
    (pix, cells), m = res
    dgrid = _pallas_backward(pix, cells, g, m, block_n=block_n,
                             precision=precision, interpret=interpret)
    return dgrid, None


_interp.defvjp(_interp_fwd, _interp_bwd)


def _pick_block_n(m: int) -> int:
    """Largest sample block whose (block_n, M) f32 weight tile stays within
    ~8 MB of VMEM (leaving room for the hi/lo bf16 splits and the grid)."""
    m_pad = _round_up(m, 128)
    for bn in (1024, 512, 256):
        if bn * m_pad * 4 <= 8 * 1024 * 1024:
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
    sampled positions).  precision: 'f32' (3-pass bf16 split, ~1e-6 rel) or
    'bf16' (single MXU pass, ~4e-3 rel).
    """
    C, D, H, W = features.shape
    n = coords.shape[0]
    block_n = _pick_block_n(D * H * W)
    sizes = jnp.asarray([W, H, D], dtype=coords.dtype)
    pix = ((coords + 1.0) * sizes - 1.0) * 0.5   # align_corners=False
    n_pad = _round_up(max(n, block_n), block_n)
    if n_pad != n:
        # pad far outside the grid: all hat weights are exactly zero
        pix = jnp.pad(pix, ((0, n_pad - n), (0, 0)), constant_values=-2.0)
    cells = jnp.asarray(_cell_coords(D, H, W))
    grid_flat = jnp.transpose(features, (1, 2, 3, 0)).reshape(D * H * W, C)
    out = _interp(grid_flat, (jax.lax.stop_gradient(pix), cells),
                  block_n, precision, interpret)
    return out[:n]
