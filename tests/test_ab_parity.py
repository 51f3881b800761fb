"""Head-to-head A/B training parity vs the torch reference implementation.

Both implementations start from the SAME initial parameters and train with
the same config on the same volume (reference training/training.py:71-243
semantics).

Two gates per family:

* *stream-matched* (primary, exact): the torch mirror is driven with the
  jax trainer's exact position stream (torch_ab.jax_pos_stream), so the
  comparison isolates training DYNAMICS — forward math, loss, Adam, the lr
  strategy, phase structure, baking/pruning.  Final full-volume PSNR must
  agree to 0.05 dB and (for pruned families) zero-counts must agree
  exactly.

* *free-stream* (statistical smoke): each side samples from its own PRNG.
  Measured spread across seeds 0-5 at this config (examples/ab_seed_sweep.py,
  BENCH_NOTES r4): dense delta +0.28 +- 0.24 dB (max +0.60), i.e. pure
  sampling luck on a 32^3 volume — the stream-matched gate proves the
  dynamics are identical.  Tolerances here are pinned from that evidence.
"""

import numpy as np
import pytest
import jax

from latent_feature_grid_compression_tpu.config import TrainConfig
from latent_feature_grid_compression_tpu.models import make_spec, init_model
from latent_feature_grid_compression_tpu.train import training

from tests.torch_ab import (training_torch, jax_pos_stream,
                            jax_gate_noise_stream)


def synthetic_volume(n=32):
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)
           + 0.3 * np.cos(5 * x * y))
    vol = vol / np.abs(vol).max()
    return vol.astype(np.float32)


def run_ab(tmp_path, drop_type, expname, stream_matched=False, **cfg_kw):
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
                     drop_threshold=cfg.drop_threshold,
                     wavelet=cfg.wavelet_filter)
    # identical init to what training() derives from cfg.seed
    k_model, k_var, k_train = jax.random.split(jax.random.key(cfg.seed), 3)
    params, _ = init_model(k_model, spec)
    var_params = None
    if 'dynamic' in drop_type:
        from latent_feature_grid_compression_tpu.models.variance import (
            init_variance_model)
        var_params = init_variance_model(k_var, cfg.d_in, 1, 4, 32)

    streams = (None, None)
    noise = None
    if stream_matched:
        N = cfg.batch_size * cfg.sample_size
        streams = (
            jax_pos_stream(k_train, cfg.steps_per_chunk, N, vol.shape),
            jax_pos_stream(jax.random.fold_in(k_train, 1),
                           cfg.steps_per_chunk, N, vol.shape),
        )
        if 'variational' in drop_type:
            shapes = [c.shape[1:] for c in params.coeffs]
            noise = jax_gate_noise_stream(k_train, cfg.steps_per_chunk,
                                          shapes)
    psnr_torch, zeros_torch = training_torch(spec, params, vol, cfg, seed=0,
                                             pos_streams=streams,
                                             noise_stream=noise,
                                             var_params=var_params)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    return info, psnr_torch, zeros_torch


@pytest.mark.slow
def test_ab_dense_stream_matched(tmp_path):
    info, psnr_torch, _ = run_ab(tmp_path, '', 'absm_dense',
                                 stream_matched=True)
    assert abs(info['psnr'] - psnr_torch) < 0.05, (info['psnr'], psnr_torch)


@pytest.mark.slow
def test_ab_smallify_stream_matched(tmp_path):
    info, psnr_torch, zeros_torch = run_ab(
        tmp_path, 'smallify', 'absm_smallify', stream_matched=True,
        lambda_drop_loss=2e-5, lambda_weight_loss=1e-8)
    assert abs(info['psnr'] - psnr_torch) < 0.05, (info['psnr'], psnr_torch)
    assert zeros_torch > 0
    # ULP-level f32 trajectory divergence flips borderline EMAVar-threshold
    # mask entries: measured zero-count disagreement <= 0.7% over seeds 0-2
    assert info['num_zeros'] == pytest.approx(zeros_torch, rel=0.02), \
        (info['num_zeros'], zeros_torch)


@pytest.mark.slow
def test_ab_masked_st_stream_matched(tmp_path):
    """Masked-wavelet STE family (Straight_Through_Dropout.py:46-78).

    The gates are deterministic, but the STE forward is DISCONTINUOUS at
    sigmoid(mask) == threshold, so ULP-level f32 divergence (torch vs XLA
    sigmoid) flips hard-mask elements and the trajectories separate
    chaotically: perturbing the torch mirror's own init by 1e-6 moves its
    final PSNR by 0.32 dB (BENCH_NOTES r4).  The bound here is that
    measured intrinsic sensitivity, not sampling luck (positions are
    stream-matched)."""
    info, psnr_torch, zeros_torch = run_ab(
        tmp_path, 'masked_straight_through', 'absm_mst', stream_matched=True,
        lambda_drop_loss=1e-6, lambda_weight_loss=1e-8)
    assert abs(info['psnr'] - psnr_torch) < 0.6, (info['psnr'], psnr_torch)
    assert info['num_zeros'] == pytest.approx(zeros_torch, rel=0.02), \
        (info['num_zeros'], zeros_torch)


@pytest.mark.slow
def test_ab_variational_stream_matched(tmp_path):
    """Static variational dropout (Variational_Dropout_Layer.py): positions
    AND the per-step multiplicative gate noise replay the jax streams, so
    the trickiest loss scaling (LL/DKL/weight terms x n_voxels/batch, dkl
    ramp) is compared exactly."""
    # drop_momentum is the reference's init_dropout (model_utils.py:42):
    # 0.7 starts droprates near the 0.75 threshold so real pruning happens
    # within the short test budget (measured: 617 zeros, identical both
    # sides, delta 0.0001 dB)
    info, psnr_torch, zeros_torch = run_ab(
        tmp_path, 'static_variational', 'absm_var', stream_matched=True,
        lambda_drop_loss=1e-6, lambda_weight_loss=1e-8,
        weight_dkl_multiplier=5e-4, variational_sigma=-7.0,
        drop_momentum=0.7)
    assert abs(info['psnr'] - psnr_torch) < 0.1, (info['psnr'], psnr_torch)
    assert zeros_torch > 100
    assert info['num_zeros'] == pytest.approx(zeros_torch, rel=0.02), \
        (info['num_zeros'], zeros_torch)


@pytest.mark.slow
def test_ab_dynamic_variational_stream_matched(tmp_path):
    """Dynamic variational dropout: the per-sample log-sigma comes from the
    jointly-optimized Variance_Model (Variational_Dropout_Layer.py:159-175,
    optimizer wiring training/training.py:80-84) — the most coupled loss
    path.  Positions, gate noise AND the variance-model init are all
    matched (VERDICT r4 #4).

    Bound rationale (measured this round): the implementations are
    structurally identical — in f64 the variance-model forwards agree to
    5e-16 — but in f32 ULP flips at ReLU boundaries perturb log_sigma by
    ~3e-4 EVERY step, and unlike the static family (where the constant-sigma
    LL is just scaled MSE, a convex attractor that forgets the path) the
    learned per-sample weighting makes the trajectory path-dependent, so the
    re-injected noise random-walks to ~0.1 dB over 30 passes (measured
    0.109; torch-vs-torch with a 1e-6 init perturbation moves only
    0.0003 dB, ruling out chaos within one implementation)."""
    info, psnr_torch, zeros_torch = run_ab(
        tmp_path, 'dynamic_variational', 'absm_dynvar', stream_matched=True,
        lambda_drop_loss=1e-6, lambda_weight_loss=1e-8,
        weight_dkl_multiplier=5e-4, variational_sigma=0.0,
        drop_momentum=0.7)
    assert abs(info['psnr'] - psnr_torch) < 0.25, (info['psnr'], psnr_torch)
    assert zeros_torch > 100
    # droprates hover near the 0.75 threshold at this short budget: a 1e-6
    # perturbation of the torch mirror's own init flips ~8 masks (400.75 ->
    # 408.75 zeros), so the cross-implementation count gate is necessarily
    # loose here (measured 440.75 vs 392.75)
    assert info['num_zeros'] == pytest.approx(zeros_torch, rel=0.15), \
        (info['num_zeros'], zeros_torch)


@pytest.mark.slow
def test_ab_no_wavelet_smallify_stream_matched(tmp_path):
    """wavelet_filter = none (r5 spatial-domain mode): the torch mirror
    gates/prunes the raw grid with zero decode levels — stream-matched
    equality shows the mode's training dynamics match the same reference
    semantics as the wavelet path."""
    info, psnr_torch, zeros_torch = run_ab(
        tmp_path, 'smallify', 'absm_nowav', stream_matched=True,
        wavelet_filter='none', lambda_drop_loss=2e-5,
        lambda_weight_loss=1e-8)
    assert abs(info['psnr'] - psnr_torch) < 0.05, (info['psnr'], psnr_torch)
    assert info['num_zeros'] == pytest.approx(zeros_torch, rel=0.02), \
        (info['num_zeros'], zeros_torch)


@pytest.mark.slow
def test_ab_dense_training_psnr_parity(tmp_path):
    """Free-stream smoke: bound = mean + 3*std of the 6-seed sweep
    (+0.28 +- 0.24 dB, examples/ab_seed_sweep.py)."""
    info, psnr_torch, _ = run_ab(tmp_path, '', 'ab_dense')
    assert abs(info['psnr'] - psnr_torch) < 1.0, (info['psnr'], psnr_torch)


@pytest.mark.slow
def test_ab_smallify_training_psnr_parity(tmp_path):
    """Free-stream smoke; stochastic pruning widens the spread vs dense
    (seeds 0-2 measured +1.31/+0.43/-0.12 dB with zero-counts within 2%)."""
    info, psnr_torch, zeros_torch = run_ab(
        tmp_path, 'smallify', 'ab_smallify', lambda_drop_loss=2e-5,
        lambda_weight_loss=1e-8)
    assert abs(info['psnr'] - psnr_torch) < 1.75, (info['psnr'], psnr_torch)
    assert zeros_torch > 0
    assert info['num_zeros'] == pytest.approx(zeros_torch, rel=0.1), \
        (info['num_zeros'], zeros_torch)
