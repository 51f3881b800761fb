"""End-to-end training tests: PSNR rises, pruning produces zeros, artifacts
round-trip (the reference's test_impl_test.txt workflow in miniature)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from latent_feature_grid_compression_tpu.config import TrainConfig
from latent_feature_grid_compression_tpu.train import training
from latent_feature_grid_compression_tpu.io.container import restore_model
from latent_feature_grid_compression_tpu.io.checkpoint import load_checkpoint
from latent_feature_grid_compression_tpu.models import make_spec, init_model
from latent_feature_grid_compression_tpu.data.volume import VolumeMeta
from latent_feature_grid_compression_tpu.eval.reconstruct import tiled_net_out


def synthetic_volume(n=24):
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)
    return vol.astype(np.float32)


def base_cfg(tmp_path, **kw):
    d = dict(expname='e2e', data='', basedir=f'/{os.path.relpath(tmp_path)}/',
             drop_type='', max_pass=6, batch_size=128, sample_size=16,
             grid_size=8, grid_features=8, n_hidden_size=16, n_layers=2,
             steps_per_chunk=50, lr=0.01)
    d.update(kw)
    return TrainConfig(**d)


def test_dense_training_learns(tmp_path):
    vol = synthetic_volume()
    cfg = base_cfg(tmp_path)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert info['psnr'] > 20.0, info
    assert info['num_zeros'] == 0.0
    assert info['compression_ratio'] == pytest.approx(
        vol.size / info['num_parameters'])
    # artifacts exist
    exp = os.path.abspath(os.getcwd()) + cfg.basedir + cfg.expname + '/'
    for fname in ['model.npz', 'binary_model_file', 'binary_model_file_mask.bnr',
                  'info.txt', 'config.txt']:
        assert os.path.exists(os.path.join(exp, fname)), fname


def test_smallify_training_prunes_and_restores(tmp_path):
    vol = synthetic_volume()
    cfg = base_cfg(tmp_path, expname='e2e_smallify', drop_type='smallify',
                   lambda_drop_loss=3e-5, max_pass=9)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert info['num_zeros'] > 0, "smallify should prune some coefficients"
    assert info['psnr'] > 15.0

    # binary restore reproduces the stored model's reconstruction
    spec2, params2 = restore_model(cfg.binary_checkpoint_path)
    meta = VolumeMeta(vol.shape)
    psnr2, _, _, _ = tiled_net_out(spec2, params2, meta, gt_vol=vol,
                                   evaluate=True, write_vols=False)
    assert abs(psnr2 - info['psnr']) < 2.0, (psnr2, info['psnr'])


def test_variational_training_runs(tmp_path):
    vol = synthetic_volume()
    cfg = base_cfg(tmp_path, expname='e2e_var', drop_type='static_variational',
                   lambda_drop_loss=1e-8, variational_sigma=-3.2,
                   weight_dkl_multiplier=5e-5)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert np.isfinite(info['psnr'])
    assert info['psnr'] > 10.0


def test_checkpoint_warmstart(tmp_path):
    vol = synthetic_volume()
    cfg = base_cfg(tmp_path, expname='e2e_warm')
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)

    # reload via checkpoint and evaluate without training
    spec = make_spec(d_in=cfg.d_in, hidden=cfg.n_hidden_size, d_out=cfg.d_out,
                     num_layers=cfg.n_layers, n_freqs=cfg.n_embedding_freq,
                     grid_features=cfg.grid_features, grid_size=cfg.grid_size,
                     wavelet=cfg.wavelet_filter, drop_type='')
    params, _ = init_model(jax.random.key(9), spec)
    params, _ = load_checkpoint(cfg.checkpoint_path, params)
    meta = VolumeMeta(vol.shape)
    psnr, _, _, _ = tiled_net_out(spec, params, meta, gt_vol=vol,
                                  evaluate=True, write_vols=False)
    assert psnr == pytest.approx(info['psnr'], abs=1e-3)


def test_neurcomp_lr_decay_applied(tmp_path):
    """pass_decay triggers lr*=lr_decay at pass boundaries (phase 1)."""
    from latent_feature_grid_compression_tpu.train.trainer import (
        make_phase_spec, init_train_state, make_chunk_runner)
    from latent_feature_grid_compression_tpu.data.volume import VolumeMeta

    vol = synthetic_volume(16)
    cfg = base_cfg(tmp_path, batch_size=64, sample_size=8, max_pass=30,
                   pass_decay=3, lr_decay=0.5)
    meta = VolumeMeta(vol.shape)
    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2)
    ph = make_phase_spec(cfg, spec, meta, phase=1)
    params, aux = init_model(jax.random.key(0), spec)
    state = init_train_state(params, None, aux, cfg.lr, cfg.lr, jax.random.key(1), 0.0)
    steps_per_pass = meta.n_voxels / ph.batch_n
    n_steps = int(steps_per_pass * 7) + 2  # cross passes 0..6
    run = make_chunk_runner(ph, None, n_steps)
    state, metrics = run(state, jnp.asarray(vol))
    # boundary rule: decay when entering pass k with (k+1) % 3 == 0 -> k=2, 5
    assert float(state.lr) == pytest.approx(cfg.lr * 0.5 ** 2, rel=1e-5)


def test_flat_adam_matches_per_tensor_reference():
    """The flattened-vector Adam must be numerically identical to the naive
    per-tensor tree-mapped torch.optim.Adam formulation."""
    from latent_feature_grid_compression_tpu.train.trainer import (
        _adam_update, init_adam_like)

    key = jax.random.key(7)
    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2,
                     drop_type='smallify')
    params, _ = init_model(key, spec)
    trainables = (params, None)
    grads = jax.tree.map(lambda p: jnp.cos(p * 3.0) * 0.01, trainables)

    # reference per-tensor update
    b1, b2, eps, lr, t = 0.9, 0.999, 1e-8, 0.008, 3.0
    m_ref = jax.tree.map(lambda g: 0.1 * g, grads)       # nonzero moments
    v_ref = jax.tree.map(lambda g: 0.2 * g * g, grads)
    m2 = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, m_ref, grads)
    v2 = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, v_ref, grads)
    bc1, bc2 = 1.0 - b1 ** t, 1.0 - b2 ** t
    p_ref = jax.tree.map(
        lambda p, mm, vv: p - lr * (mm / bc1) / (jnp.sqrt(vv / bc2) + eps),
        trainables, m2, v2)

    from jax.flatten_util import ravel_pytree
    m0, _ = ravel_pytree(m_ref)
    v0, _ = ravel_pytree(v_ref)
    p_new, m_new, v_new = _adam_update(trainables, grads, m0, v0, t, lr)

    flat_ref, _ = ravel_pytree(p_ref)
    flat_new, _ = ravel_pytree(p_new)
    np.testing.assert_allclose(np.asarray(flat_new), np.asarray(flat_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(m_new),
                               np.asarray(ravel_pytree(m2)[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v_new),
                               np.asarray(ravel_pytree(v2)[0]), rtol=1e-6)
    assert init_adam_like(trainables).shape == m0.shape


def test_weight_dkl_pressure_reaches_gate_gradients():
    """lambda_drop_loss (initial weight_dkl) must scale the DKL pull on the
    variational gate parameters — guards the wiring from config to loss
    (with a 1e-8 lambda the DKL term is numerically invisible and
    variational runs silently never prune)."""
    from latent_feature_grid_compression_tpu.train.trainer import (
        make_phase_spec, init_train_state, make_train_step)

    vol = jnp.asarray(synthetic_volume(16))
    meta = VolumeMeta((16, 16, 16))
    deltas = []
    for ldl in (1.0, 200.0):
        cfg = TrainConfig(drop_type='static_variational', batch_size=64,
                          sample_size=8, grid_size=8, grid_features=4,
                          n_hidden_size=16, n_layers=2, lr=0.01,
                          lambda_drop_loss=ldl, lambda_weight_loss=2.0,
                          variational_sigma=-7.0, weight_dkl_multiplier=5e-5,
                          drop_momentum=0.1, drop_threshold=0.9)
        spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2,
                         drop_type=cfg.drop_type,
                         drop_momentum=cfg.drop_momentum,
                         drop_threshold=cfg.drop_threshold)
        ph = make_phase_spec(cfg, spec, meta, phase=1)
        params, aux = init_model(jax.random.key(0), spec)
        state = init_train_state(params, None, aux, cfg.lr, cfg.lr,
                                 jax.random.key(1), cfg.lambda_drop_loss)
        assert float(state.weight_dkl) == ldl
        s2, metrics = make_train_step(ph, None)(state, vol)
        deltas.append(np.asarray(s2.params.gates.log_var[0]
                                 - state.params.gates.log_var[0]))
        assert np.isfinite(float(metrics['DKL_loss']))
    assert not np.allclose(deltas[0], deltas[1]), \
        "DKL weight had no effect on gate updates"


def test_bior44_training_learns(tmp_path):
    """--wavelet_filter bior4.4 trains end-to-end (the reference's QC runner
    contemplates bior4.4, visualization/trigger_experiments.py:34)."""
    vol = synthetic_volume()
    cfg = base_cfg(tmp_path, expname='e2e_bior', wavelet_filter='bior4.4')
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert info['psnr'] > 20.0, info
