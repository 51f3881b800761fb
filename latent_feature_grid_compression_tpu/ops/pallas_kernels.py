"""Pallas TPU kernels for the interpolation hot path.

The north-star fused op (SURVEY.md §2.2): trilinear feature-grid interpolation
at sampled coordinates with a hand-written backward that accumulates into the
grid WITHOUT scatter — both directions are expressed as blocked one-hot
matmuls so they run on the MXU with deterministic accumulation:

  forward : feats(N, C)  = A(N, M) @ grid_flat(M, C)
  backward: dgrid(M, C)  = A(N, M)^T @ g(N, C)

A is the sparse trilinear-weight matrix (8 nonzeros per row); its blocks are
materialized on the fly in VMEM from the corner indices/weights via iota
compares, never in HBM.  M = D*H*W grid cells (grid_size<=32 pyramids keep
M*C under a few MB, comfortably VMEM-resident).

The public entry :func:`pallas_grid_sample_3d` has the exact semantics of
ops.interpolation.grid_sample_3d (torch grid_sample align_corners=False,
zero padding) and is verified against it in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _corner_indices_weights(coords, D, H, W):
    """Flat cell index + trilinear weight for each of the 8 corners.

    Out-of-bounds corners get weight 0 and a clamped (valid) index, which
    reproduces grid_sample's zero padding inside the matmul formulation.
    Returns (idx (N, 8) int32, w (N, 8) f32).
    """
    sizes = jnp.asarray([W, H, D], dtype=coords.dtype)
    pix = ((coords + 1.0) * sizes - 1.0) * 0.5
    lo = jnp.floor(pix)
    frac = pix - lo
    lo = lo.astype(jnp.int32)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    idxs, ws = [], []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix = lo[:, 0] + dx
                iy = lo[:, 1] + dy
                iz = lo[:, 2] + dz
                valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
                         & (iz >= 0) & (iz < D))
                ixc = jnp.clip(ix, 0, W - 1)
                iyc = jnp.clip(iy, 0, H - 1)
                izc = jnp.clip(iz, 0, D - 1)
                idxs.append((izc * H + iyc) * W + ixc)
                w = ((fx if dx else 1.0 - fx)
                     * (fy if dy else 1.0 - fy)
                     * (fz if dz else 1.0 - fz))
                ws.append(w * valid)
    return jnp.stack(idxs, 1), jnp.stack(ws, 1)


# ---------------------------------------------------------------------------
# Forward kernel: block of samples x all cells, one-hot matmul on the MXU
# ---------------------------------------------------------------------------

def _fwd_kernel(idx_ref, w_ref, grid_ref, out_ref, *, block_n, m_cells):
    # Build A block (block_n, M) = sum_corner w_c * onehot(idx_c)
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, (block_n, m_cells), 1)
    a = jnp.zeros((block_n, m_cells), jnp.float32)
    for c in range(8):
        idx_c = idx_ref[:, c][:, None]
        w_c = w_ref[:, c][:, None]
        a = a + jnp.where(cell_ids == idx_c, w_c, 0.0)
    out_ref[:, :] = jnp.dot(a, grid_ref[:, :],
                            preferred_element_type=jnp.float32)


def _bwd_kernel(idx_ref, w_ref, g_ref, dgrid_ref, *, block_n, m_cells):
    # dgrid += A^T @ g for this sample block; grid dim 0 iterates blocks and
    # accumulates into the single output block.
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, (block_n, m_cells), 1)
    a = jnp.zeros((block_n, m_cells), jnp.float32)
    for c in range(8):
        idx_c = idx_ref[:, c][:, None]
        w_c = w_ref[:, c][:, None]
        a = a + jnp.where(cell_ids == idx_c, w_c, 0.0)
    contrib = jnp.dot(a.T, g_ref[:, :], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgrid_ref[:, :] = jnp.zeros_like(dgrid_ref)

    dgrid_ref[:, :] += contrib


def _pallas_forward(idx, w, grid_flat, *, block_n, interpret):
    n = idx.shape[0]
    m, C = grid_flat.shape
    grid_blocks = n // block_n
    kernel = functools.partial(_fwd_kernel, block_n=block_n, m_cells=m)
    return pl.pallas_call(
        kernel,
        grid=(grid_blocks,),
        in_specs=[
            pl.BlockSpec((block_n, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, C), jnp.float32),
        interpret=interpret,
    )(idx, w, grid_flat)


def _pallas_backward(idx, w, g, m, *, block_n, interpret):
    n, C = g.shape
    grid_blocks = n // block_n
    kernel = functools.partial(_bwd_kernel, block_n=block_n, m_cells=m)
    return pl.pallas_call(
        kernel,
        grid=(grid_blocks,),
        in_specs=[
            pl.BlockSpec((block_n, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, C), jnp.float32),
        interpret=interpret,
    )(idx, w, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _interp(grid_flat, iw, dims, interpret):
    idx, w = iw
    return _pallas_forward(idx, w, grid_flat, block_n=_BLOCK_N,
                           interpret=interpret)


def _interp_fwd(grid_flat, iw, dims, interpret):
    out = _interp(grid_flat, iw, dims, interpret)
    return out, (iw, grid_flat.shape[0])


def _interp_bwd(dims, interpret, res, g):
    (idx, w), m = res
    dgrid = _pallas_backward(idx, w, g, m, block_n=_BLOCK_N,
                             interpret=interpret)
    return dgrid, None


_interp.defvjp(_interp_fwd, _interp_bwd)

_BLOCK_N = 1024


def pallas_grid_sample_3d(features: jax.Array, coords: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Drop-in fused replacement for ops.interpolation.grid_sample_3d.

    features: (C, D, H, W); coords: (N, 3) in [-1, 1], torch grid_sample
    coordinate order (x->W).  N is padded to the block size internally.
    Differentiable wrt features (MXU matmul backward, no scatter); coords
    gradients are not defined (the training loop never differentiates wrt
    sampled positions).
    """
    C, D, H, W = features.shape
    n = coords.shape[0]
    idx, w = _corner_indices_weights(coords, D, H, W)
    n_pad = _round_up(max(n, _BLOCK_N), _BLOCK_N)
    if n_pad != n:
        idx = jnp.pad(idx, ((0, n_pad - n), (0, 0)))
        w = jnp.pad(w, ((0, n_pad - n), (0, 0)))
    grid_flat = jnp.transpose(features, (1, 2, 3, 0)).reshape(D * H * W, C)
    out = _interp(grid_flat, (idx, jax.lax.stop_gradient(w)),
                  (D, H, W), interpret)
    return out[:n]
