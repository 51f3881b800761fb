"""E2E coverage of the product-CLI features around training():

* multi-chip training reachable through the mesh_data/mesh_space config flags
  (green-field TPU design; the reference is single-device,
  training/training.py:15)
* mid-training --resume from the per-chunk TrainState checkpoint
* --profile_dir jax.profiler trace capture
* --compute_dtype bfloat16 mixed-precision path
* remaining gate families end-to-end: straight_through,
  masked_straight_through, dynamic_variational
  (reference model/model_utils.py:34-44 drop_type dispatch)
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from latent_feature_grid_compression_tpu.config import TrainConfig, write_dict
from latent_feature_grid_compression_tpu.train import training


def synthetic_volume(n=24):
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)
    return vol.astype(np.float32)


def base_cfg(tmp_path, **kw):
    d = dict(expname='cli', data='', basedir=f'/{os.path.relpath(tmp_path)}/',
             drop_type='', max_pass=6, batch_size=128, sample_size=16,
             grid_size=8, grid_features=8, n_hidden_size=16, n_layers=2,
             steps_per_chunk=50, lr=0.01)
    d.update(kw)
    return TrainConfig(**d)


def exp_dir(cfg):
    return os.path.abspath(os.getcwd()) + cfg.basedir + cfg.expname + '/'


# ---------------------------------------------------------------------------
# Multi-chip through the product entry
# ---------------------------------------------------------------------------

def test_training_mesh_flags_end_to_end(tmp_path):
    """training() with mesh_data=4, mesh_space=2 must train on the 8-device
    virtual mesh and reach PSNR comparable to single-device."""
    vol = synthetic_volume(16)
    cfg1 = base_cfg(tmp_path, expname='mesh_ref', max_pass=24)
    info1 = training(cfg1, verbose=False, volume_np=vol, write_vols=False)

    cfg8 = base_cfg(tmp_path, expname='mesh_8', max_pass=24, mesh_data=4,
                    mesh_space=2)
    info8 = training(cfg8, verbose=False, volume_np=vol, write_vols=False)

    assert info8['psnr'] > 20.0, (info8['psnr'], info1['psnr'])
    # different RNG streams (per-device fold_in) but same statistics
    assert abs(info8['psnr'] - info1['psnr']) < 4.0, (info1['psnr'],
                                                      info8['psnr'])


def test_training_mesh_smallify_prunes(tmp_path):
    """Gated multi-chip training: smallify EMA tracker + pruning under
    shard_map."""
    vol = synthetic_volume(16)
    cfg = base_cfg(tmp_path, expname='mesh_sm', drop_type='smallify',
                   lambda_drop_loss=3e-5, max_pass=24, mesh_data=2,
                   mesh_space=2)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert info['num_zeros'] > 0
    assert info['psnr'] > 12.0, info


# ---------------------------------------------------------------------------
# Resume
# ---------------------------------------------------------------------------

def test_resume_phase2_reproduces_final_model(tmp_path):
    """A run killed in phase 2 resumes from the chunk checkpoint: the resumed
    run must finish and match the uninterrupted final PSNR closely (the
    TrainState round-trip itself is bit-exact, tests/test_train_state_io.py)."""
    vol = synthetic_volume(16)
    cfg = base_cfg(tmp_path, expname='res_a', drop_type='smallify',
                   lambda_drop_loss=3e-5, max_pass=9)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    exp = exp_dir(cfg)
    assert os.path.exists(os.path.join(exp, 'train_state_phase2.npz'))
    assert os.path.exists(os.path.join(exp, 'bake.npz'))

    # simulate the kill: meta says we were mid-phase-2
    write_dict({'phase': 2}, 'resume_meta.txt', exp)
    cfg2 = base_cfg(tmp_path, expname='res_b', drop_type='smallify',
                    lambda_drop_loss=3e-5, max_pass=9, resume=exp)
    info2 = training(cfg2, verbose=False, volume_np=vol, write_vols=False)
    # the resumed state is the *finished* phase-2 state, so solve_phase runs
    # zero-to-few extra steps; the model must be essentially unchanged
    assert info2['psnr'] == pytest.approx(info['psnr'], abs=1.0)
    assert info2['num_zeros'] == info['num_zeros']


def test_resume_phase1_continues(tmp_path):
    """Resume from a phase-1 chunk checkpoint trains to a sane model."""
    vol = synthetic_volume(16)
    # short run that stops after phase 1's budget
    cfg = base_cfg(tmp_path, expname='res1_a', max_pass=24)
    training(cfg, verbose=False, volume_np=vol, write_vols=False)
    exp = exp_dir(cfg)
    write_dict({'phase': 1}, 'resume_meta.txt', exp)

    cfg2 = base_cfg(tmp_path, expname='res1_b', max_pass=24, resume=exp)
    info2 = training(cfg2, verbose=False, volume_np=vol, write_vols=False)
    assert info2['psnr'] > 20.0, info2


# ---------------------------------------------------------------------------
# profile_dir / timing stats
# ---------------------------------------------------------------------------

def test_profile_dir_writes_trace(tmp_path):
    vol = synthetic_volume(16)
    prof = str(tmp_path / 'trace')
    # small chunks so phase 1 dispatches >= 2 chunks (the trace captures the
    # second, post-compile chunk)
    cfg = base_cfg(tmp_path, expname='prof', max_pass=6, steps_per_chunk=4,
                   profile_dir=prof)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert np.isfinite(info['psnr'])
    files = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
    assert files, "profile_dir set but no trace files were written"


def test_info_contains_throughput_stats(tmp_path):
    vol = synthetic_volume(16)
    cfg = base_cfg(tmp_path, expname='stats')
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert info['train_samples_per_sec'] > 0
    assert info['train_ms_per_step'] > 0


# ---------------------------------------------------------------------------
# compute_dtype
# ---------------------------------------------------------------------------

def test_compute_dtype_bf16_forward_close():
    from latent_feature_grid_compression_tpu.models import (make_spec,
                                                            init_model,
                                                            apply_model)
    spec32 = make_spec(grid_size=8, grid_features=8, hidden=16, num_layers=2)
    spec16 = make_spec(grid_size=8, grid_features=8, hidden=16, num_layers=2,
                       compute_dtype='bfloat16')
    params, _ = init_model(jax.random.key(0), spec32)
    coords = jax.random.uniform(jax.random.key(1), (512, 3), minval=-1,
                                maxval=1)
    y32 = apply_model(spec32, params, coords, train=False)
    y16 = apply_model(spec16, params, coords, train=False)
    assert y16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), atol=0.05)


def test_compute_dtype_bf16_trains(tmp_path):
    vol = synthetic_volume(16)
    cfg = base_cfg(tmp_path, expname='bf16', max_pass=24,
                   compute_dtype='bfloat16')
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    cfg32 = base_cfg(tmp_path, expname='f32ref', max_pass=24)
    info32 = training(cfg32, verbose=False, volume_np=vol, write_vols=False)
    assert info['psnr'] > 15.0, info
    assert abs(info['psnr'] - info32['psnr']) < 6.0, (info['psnr'],
                                                      info32['psnr'])


def test_compute_dtype_rejects_unknown():
    from latent_feature_grid_compression_tpu.models import make_spec
    with pytest.raises(ValueError):
        make_spec(grid_size=8, compute_dtype='float16')


# ---------------------------------------------------------------------------
# Remaining gate families end-to-end
# ---------------------------------------------------------------------------

def test_masked_straight_through_end_to_end(tmp_path):
    vol = synthetic_volume()
    cfg = base_cfg(tmp_path, expname='e2e_mst',
                   drop_type='masked_straight_through',
                   lambda_drop_loss=1e-5, drop_threshold=0.7, max_pass=9)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert np.isfinite(info['psnr'])
    assert info['psnr'] > 12.0, info
    assert info['num_zeros'] > 0, "sigmoid-STE masks should prune"


def test_straight_through_end_to_end(tmp_path):
    vol = synthetic_volume()
    cfg = base_cfg(tmp_path, expname='e2e_st', drop_type='straight_through',
                   lambda_drop_loss=1e-4, drop_threshold=0.75, max_pass=9)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert np.isfinite(info['psnr'])
    assert info['psnr'] > 12.0, info


def test_dynamic_variational_end_to_end(tmp_path):
    vol = synthetic_volume()
    cfg = base_cfg(tmp_path, expname='e2e_dyn',
                   drop_type='dynamic_variational',
                   lambda_drop_loss=1e-8, variational_sigma=-3.2,
                   weight_dkl_multiplier=5e-5, max_pass=9)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert np.isfinite(info['psnr'])
    assert info['psnr'] > 10.0, info


def test_dynamic_variational_variance_model_updates():
    """The jointly-trained Variance_Model must actually receive gradients
    (reference training/training.py:80-84 adds it to the optimizer)."""
    from latent_feature_grid_compression_tpu.data.volume import VolumeMeta
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.models.variance import (
        init_variance_model)
    from latent_feature_grid_compression_tpu.train.trainer import (
        make_phase_spec, init_train_state, make_chunk_runner)

    vol = jnp.asarray(synthetic_volume(16))
    meta = VolumeMeta((16, 16, 16))
    cfg = TrainConfig(drop_type='dynamic_variational', batch_size=64,
                      sample_size=8, grid_size=8, grid_features=4,
                      n_hidden_size=16, n_layers=2, lr=0.01, max_pass=30,
                      variational_sigma=-3.2, weight_dkl_multiplier=5e-5)
    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2,
                     drop_type='dynamic_variational')
    ph = make_phase_spec(cfg, spec, meta, phase=1)
    params, aux = init_model(jax.random.key(0), spec)
    var0 = init_variance_model(jax.random.key(2), 3, 1, 4, 32)
    state = init_train_state(params, var0, aux, cfg.lr, cfg.lr,
                             jax.random.key(1), cfg.lambda_drop_loss)
    run = make_chunk_runner(ph, None, 20)
    state, _ = run(state, vol)
    delta = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(var0),
                                jax.tree.leaves(state.var_params)))
    assert delta > 1e-6, "variance model received no updates"


def test_rng_impl_flag(tmp_path):
    """cfg.rng_impl selects the PRNG family; both train end-to-end."""
    import numpy as np
    from latent_feature_grid_compression_tpu.config import TrainConfig
    from latent_feature_grid_compression_tpu.train import training

    n = 16
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * x) * np.cos(2 * y)).astype(np.float32)
    psnrs = {}
    for impl in ('rbg', 'threefry2x32'):
        cfg = TrainConfig(expname='rng_' + impl, data='',
                          basedir=f'/{os.path.relpath(tmp_path)}/',
                          drop_type='', max_pass=4, batch_size=64,
                          sample_size=8, grid_size=8, grid_features=4,
                          n_hidden_size=16, n_layers=2, steps_per_chunk=25,
                          rng_impl=impl)
        info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
        psnrs[impl] = info['psnr']
        assert np.isfinite(info['psnr']) and info['psnr'] > 10.0, (impl, info)
    # different streams, same statistics: both must learn
    assert abs(psnrs['rbg'] - psnrs['threefry2x32']) < 15.0


def test_epoch_boundary_early_stop_quirk():
    """Reference termination semantics: the outer `while int(vp)+1 < max_pass`
    check only runs when the DataLoader is exhausted (training/training.py:88),
    so a phase whose budget lands just past an epoch boundary stops EARLY.

    Here: 16^3 volume (4096 voxels), batch 512x1 -> one loader epoch = 8
    steps = exactly 1 volume pass.  With max_pass=2.5 the epoch check at
    vp=2.0 sees int(2)+1 >= 2.5 and stops after 16 steps; the per-step break
    (int(vp) >= 2.5) alone would have run to vp=3.0 (24 steps)."""
    from latent_feature_grid_compression_tpu.data.volume import VolumeMeta
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.train.trainer import (
        make_phase_spec, init_train_state, make_chunk_runner)

    n = 16
    vol = np.zeros((n, n, n), np.float32)
    meta = VolumeMeta(vol.shape)
    cfg = TrainConfig(drop_type='', batch_size=512, sample_size=1,
                      grid_size=8, grid_features=4, n_hidden_size=8,
                      n_layers=2, max_pass=2.5, lr=0.01)
    spec = make_spec(grid_size=cfg.grid_size, grid_features=cfg.grid_features,
                     hidden=cfg.n_hidden_size, num_layers=cfg.n_layers)
    ph = make_phase_spec(cfg, spec, meta, phase=1)
    assert ph.loader_len == 8
    # phase 1 budget = 2.5 * 2/3 ... use the raw budget instead
    import dataclasses
    ph = dataclasses.replace(ph, max_pass=2.5)
    params, aux = init_model(jax.random.key(0), spec)
    state = init_train_state(params, None, aux, cfg.lr, cfg.lr,
                             jax.random.key(1), cfg.lambda_drop_loss)
    run = make_chunk_runner(ph, None, steps_per_chunk=30)
    state, metrics = run(state, jnp.asarray(vol))
    live = int(np.sum(np.asarray(metrics['lr']) > 0))
    assert int(state.step) == 16, int(state.step)
    assert live == 16, live


def test_no_wavelet_mode(tmp_path):
    """wavelet_filter = none: the feature grid is gated/pruned in the
    spatial domain with zero decode levels (the ablation axis of the
    reference's wavelet-gain study, README.md:59-60, which its CLI never
    exposed).  Full pipeline: train, bake, prune, serialize, eval."""
    import os
    import numpy as np
    import jax
    from latent_feature_grid_compression_tpu.config import TrainConfig
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.train import training

    spec = make_spec(grid_size=10, grid_features=6, hidden=16, num_layers=2,
                     wavelet='none', drop_type='smallify')
    assert spec.num_levels == 0
    params, _ = init_model(jax.random.key(0), spec)
    assert len(params.coeffs) == 1
    assert params.coeffs[0].shape == (6, 10, 10, 10)

    n = 24
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)).astype(np.float32)
    cfg = TrainConfig(expname='nowav', data='',
                      basedir=f'/{os.path.relpath(tmp_path)}/',
                      drop_type='smallify', wavelet_filter='none',
                      max_pass=6, batch_size=128, sample_size=8,
                      grid_size=10, grid_features=6, n_hidden_size=16,
                      n_layers=2, lr=0.01, steps_per_chunk=16,
                      lambda_drop_loss=1e-6)
    info = training(cfg, verbose=False, volume_np=vol, write_vols=False)
    assert info['psnr'] > 20.0, info
    assert info['num_zeros'] > 0
