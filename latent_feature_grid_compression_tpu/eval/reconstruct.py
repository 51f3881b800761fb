"""Full-volume reconstruction + deviation statistics.

Reference: visualization/OutputToVTK.py.  The reference loops 32^3 tiles
through the net with per-tile host<->device copies; the per-tile coordinates
it builds are exactly the global normalized lattice, so here the whole volume
is evaluated on-device in large flat chunks (one decode of the feature grid
per chunk, fori/scan-free host loop over chunk count), which is dramatically
faster on TPU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.volume import VolumeMeta, lattice_coords
from ..models.feature_grid import ModelSpec, ModelParams, apply_model, decode_volume
from ..ops.embedding import fourier_embed
from ..ops.interpolation import grid_sample_3d
from ..ops.mlp import mlp_apply, snake_alt


def field_from_net(spec: ModelSpec, params: ModelParams, meta: VolumeMeta,
                   chunk: int = 1 << 18) -> np.ndarray:
    """Reconstruct the full volume; returns (X, Y, Z) float32.

    Matches the eval path of the reference model (clamp to [-1,1],
    Feature_Grid_Model.py:77-78) over the full lattice (OutputToVTK.py:7-47
    semantics without the tile loop).  Lattice coordinates are generated
    on-device and the whole reconstruction runs as one jitted lax.map over
    row-major chunks — a single dispatch, no host->device coordinate upload
    (the reference round-trips every 32^3 tile, OutputToVTK.py:39-42).
    """
    X, Y, Z = meta.resolution
    n = meta.n_voxels
    n_chunks = math.ceil(n / chunk)
    n_pad = n_chunks * chunk
    scales = jnp.asarray(meta.scales)
    res = jnp.asarray([X, Y, Z], jnp.int32)
    max_idx = jnp.asarray(meta.max_idx)

    @jax.jit
    def reconstruct(params):
        grid = decode_volume(spec, params)

        def eval_chunk(start):
            lin = start + jnp.arange(chunk, dtype=jnp.int32)
            iz = lin % Z
            iy = (lin // Z) % Y
            ix = lin // (Y * Z)
            raw = jnp.stack([ix, iy, iz], axis=1).astype(jnp.float32)
            c = (raw / max_idx[None]) * 2.0 - 1.0
            c = c * scales[None]
            # ALWAYS the gather path here, independent of spec.interp_backend:
            # the pallas one-hot kernel wins in the TRAIN step (fwd+bwd,
            # 32k-sample batches) but measured 5x SLOWER on eval's 262k-sample
            # forward-only chunks (r5 bench: 4.1 -> 0.85 Msamples/s) — its
            # O(N*M) matmul formulation pays off only against the backward
            # scatter it eliminates, which eval does not have.
            feats = grid_sample_3d(grid, c)
            emb = fourier_embed(c, spec.n_freqs)
            x = jnp.concatenate([c, emb, feats], axis=-1)
            out = mlp_apply(list(params.mlp_w), list(params.mlp_b), x,
                            snake_alt)
            return jnp.clip(out[:, 0], -1.0, 1.0)

        starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
        return jax.lax.map(eval_chunk, starts).reshape(n_pad)

    full = np.asarray(reconstruct(params))[:n]
    return full.reshape(meta.resolution).astype(np.float32)


def deviation_statistics(prediction: np.ndarray, ground_truth: np.ndarray):
    """PSNR/L1/MSE/RMSE (OutputToVTK.py:53-60): PSNR over the GT dynamic range."""
    diff = ground_truth.astype(np.float64) - prediction.astype(np.float64)
    sqd_max_diff = float((ground_truth.max() - ground_truth.min()) ** 2)
    l1 = float(np.abs(diff).mean())
    mse = float((diff ** 2).mean())
    psnr = float(10.0 * np.log10(sqd_max_diff / mse))
    return psnr, l1, mse, math.sqrt(mse)


def tiled_net_out(spec: ModelSpec, params: ModelParams, meta: VolumeMeta,
                  gt_vol: Optional[np.ndarray] = None, evaluate: bool = True,
                  write_vols: bool = False, filename: str = 'vol'):
    """Reconstruct, optionally compute stats and write .vti volumes
    (OutputToVTK.py:64-82 contract)."""
    full_vol = field_from_net(spec, params, meta)
    psnr, l1, mse, rmse = 0.0, 0.0, 0.0, 0.0
    if evaluate and gt_vol is not None:
        psnr, l1, mse, rmse = deviation_statistics(full_vol, gt_vol)
    if write_vols:
        import os
        from .vtk import write_vti
        write_vti(filename, full_vol, name='sf')
        if gt_vol is not None:
            gt_path = os.path.join(os.path.dirname(filename) or '.', 'gt')
            write_vti(gt_path, np.asarray(gt_vol), name='sf')
    return psnr, l1, mse, rmse
