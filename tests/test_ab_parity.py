"""Head-to-head A/B training parity vs the torch reference implementation.

Both implementations start from the SAME initial parameters and train with
the same config on the same volume (reference training/training.py:71-243
semantics); final full-volume PSNR must agree within a small tolerance.
RNG streams necessarily differ (torch vs jax samplers), so this validates
training *dynamics* parity, not bitwise equality.
"""

import numpy as np
import pytest
import jax

from latent_feature_grid_compression_tpu.config import TrainConfig
from latent_feature_grid_compression_tpu.models import make_spec, init_model
from latent_feature_grid_compression_tpu.train import training

from tests.torch_ab import training_torch


def synthetic_volume(n=32):
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)
           + 0.3 * np.cos(5 * x * y))
    vol = vol / np.abs(vol).max()
    return vol.astype(np.float32)


def run_ab(tmp_path, drop_type, expname, **cfg_kw):
    vol = synthetic_volume()
    import os
    cfg = TrainConfig(expname=expname, data='',
                      basedir=f'/{os.path.relpath(tmp_path)}/',
                      drop_type=drop_type, max_pass=30, batch_size=256,
                      sample_size=8, grid_size=8, grid_features=8,
                      n_hidden_size=16, n_layers=2, steps_per_chunk=64,
                      lr=0.01, pass_decay=20, lr_decay=0.2, seed=0,
                      rng_impl='threefry2x32',   # init below must match
                      **cfg_kw)
    spec = make_spec(grid_size=cfg.grid_size, grid_features=cfg.grid_features,
                     hidden=cfg.n_hidden_size, num_layers=cfg.n_layers,
                     drop_type=cfg.drop_type, drop_momentum=cfg.drop_momentum,
                     drop_threshold=cfg.drop_threshold)
    # identical init to what training() derives from cfg.seed
    k_model, _, _ = jax.random.split(jax.random.key(cfg.seed), 3)
    params, _ = init_model(k_model, spec)

    psnr_torch, zeros_torch = training_torch(spec, params, vol, cfg, seed=0)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    return info, psnr_torch, zeros_torch


@pytest.mark.slow
def test_ab_dense_training_psnr_parity(tmp_path):
    info, psnr_torch, _ = run_ab(tmp_path, '', 'ab_dense')
    assert abs(info['psnr'] - psnr_torch) < 0.5, (info['psnr'], psnr_torch)


@pytest.mark.slow
def test_ab_smallify_training_psnr_parity(tmp_path):
    """Measured across seeds 0-2 the deltas are +1.03/+0.43/-0.12 dB with
    zero-counts within 2% (no systematic bias; see BENCH_NOTES.md) — the
    stochastic pruning makes per-seed spread wider than the dense case's
    0.5 dB, so the bound here is 1.25 dB."""
    info, psnr_torch, zeros_torch = run_ab(
        tmp_path, 'smallify', 'ab_smallify', lambda_drop_loss=2e-5,
        lambda_weight_loss=1e-8)
    assert abs(info['psnr'] - psnr_torch) < 1.25, (info['psnr'], psnr_torch)
    assert zeros_torch > 0
    assert info['num_zeros'] == pytest.approx(zeros_torch, rel=0.1), \
        (info['num_zeros'], zeros_torch)
