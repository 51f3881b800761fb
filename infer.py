#!/usr/bin/env python
"""Inference CLI (reference: Feature_Grid_Inference.py).

Rebuilds a model from an npz checkpoint (--reconstruct checkpoint) or the
packed binary container (--reconstruct binary), re-evaluates PSNR against the
config's volume, and writes .vti reconstructions.
"""

import argparse

import jax
import numpy as np

from latent_feature_grid_compression_tpu.config import load_config, dict_from_file
from latent_feature_grid_compression_tpu.data.volume import load_volume, VolumeMeta
from latent_feature_grid_compression_tpu.eval.reconstruct import tiled_net_out
from latent_feature_grid_compression_tpu.io.checkpoint import load_checkpoint
from latent_feature_grid_compression_tpu.io.container import restore_model
from latent_feature_grid_compression_tpu.models.feature_grid import make_spec, init_model
from latent_feature_grid_compression_tpu.utils.compilation_cache import (
    enable_compilation_cache)

enable_compilation_cache()


def create_model_from_checkpoint(cfg):
    spec = make_spec(d_in=cfg.d_in, hidden=cfg.n_hidden_size, d_out=cfg.d_out,
                     num_layers=cfg.n_layers, n_freqs=cfg.n_embedding_freq,
                     grid_features=cfg.grid_features, grid_size=cfg.grid_size,
                     wavelet=cfg.wavelet_filter, drop_type='')
    params, _ = init_model(jax.random.key(0), spec)
    params, _ = load_checkpoint(cfg.checkpoint_path, params)
    return spec, params


def create_model_from_binary_file(cfg):
    return restore_model(cfg.binary_checkpoint_path,
                         wavelet=cfg.wavelet_filter)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config_path', type=str, required=True,
                   help='path to config of model; is required')
    p.add_argument('--reconstruct', type=str, required=True,
                   choices=['binary', 'checkpoint'],
                   help='binary: from packed container; checkpoint: from npz')
    args = p.parse_args()

    cfg = load_config(args.config_path)
    volume = load_volume(cfg.data)
    meta = VolumeMeta(tuple(volume.shape))

    if args.reconstruct == 'checkpoint':
        spec, params = create_model_from_checkpoint(cfg)
    else:
        spec, params = create_model_from_binary_file(cfg)

    psnr, l1, mse, rmse = tiled_net_out(spec, params, meta, gt_vol=volume,
                                        evaluate=True, write_vols=True)
    print(f'PSNR: {psnr:.3f} l1: {l1:.6f} mse: {mse:.6f} rmse: {rmse:.6f}')


if __name__ == '__main__':
    main()
