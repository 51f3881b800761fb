"""Worker for the 2-process jax.distributed CPU test.

Launched by tests/test_distributed.py as
  python tests/distributed_worker.py <coordinator> <num_procs> <pid>

Each process owns 4 virtual CPU devices (8 global), initializes the
distributed runtime via parallel.initialize_distributed, builds the global
('data','space') mesh, and drives one chunk of the product sharded runner.
Prints one line: `RESULT <final_loss> <param_checksum>` — the parent asserts
both processes print identical values (replicated state stayed in sync).
"""

import os
import sys

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import numpy as np
    import jax.numpy as jnp
    from latent_feature_grid_compression_tpu.parallel.distributed import (
        initialize_distributed)

    assert initialize_distributed(coordinator_address=coordinator,
                                  num_processes=num_procs, process_id=pid)
    assert jax.process_count() == num_procs
    assert jax.device_count() == 4 * num_procs
    assert jax.local_device_count() == 4

    from latent_feature_grid_compression_tpu.config import TrainConfig
    from latent_feature_grid_compression_tpu.data.volume import VolumeMeta
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.train.trainer import (
        make_phase_spec, init_train_state)
    from latent_feature_grid_compression_tpu.parallel.mesh import (
        make_mesh, make_sharded_chunk_runner, replicate, shard_volume)

    n = 16
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)).astype(np.float32)
    meta = VolumeMeta(vol.shape)
    cfg = TrainConfig(drop_type='smallify', max_pass=4, batch_size=64,
                      sample_size=8, grid_size=8, grid_features=4,
                      n_hidden_size=16, n_layers=2, lr=0.01,
                      lambda_drop_loss=1e-6)
    spec = make_spec(grid_size=cfg.grid_size, grid_features=cfg.grid_features,
                     hidden=cfg.n_hidden_size, num_layers=cfg.n_layers,
                     drop_type=cfg.drop_type)
    ph = make_phase_spec(cfg, spec, meta, phase=1)
    params, aux = init_model(jax.random.key(0), spec)
    state = init_train_state(params, None, aux, cfg.lr, cfg.lr,
                             jax.random.key(1), cfg.lambda_drop_loss)

    mesh = make_mesh(data=4, space=2)          # global mesh over 8 devices
    run = make_sharded_chunk_runner(mesh, ph, None, steps_per_chunk=20)
    state = replicate(mesh, state)
    volume = shard_volume(mesh, jnp.asarray(vol))
    state, metrics = run(state, volume)

    losses = np.asarray(jax.device_get(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses[[0, -1]]
    # checksum over the (process-local shards of the) replicated params: the
    # fully-replicated state must be identical on every process
    from jax.flatten_util import ravel_pytree
    flat, _ = ravel_pytree(jax.device_get(
        jax.tree.map(lambda a: np.asarray(a.addressable_shards[0].data),
                     state.params)))

    # --- same chunk again with ZeRO-sharded model state + tile-local decode:
    # identical keys -> identical sampling streams, so the loss trajectory
    # must match the replicated run to f32 collective-order noise — this
    # proves the cross-process all_gather/psum_scatter state path end-to-end
    from latent_feature_grid_compression_tpu.parallel.mesh import (
        shard_train_state, make_zero_sharded_chunk_runner)
    params2, aux2 = init_model(jax.random.key(0), spec)
    state2 = init_train_state(params2, None, aux2, cfg.lr, cfg.lr,
                              jax.random.key(1), cfg.lambda_drop_loss)
    zstate, zc = shard_train_state(mesh, state2)
    zrun = make_zero_sharded_chunk_runner(mesh, ph, None, 20, zc,
                                          use_space=True, local_decode=True)
    zstate, zmetrics = zrun(zstate, volume)
    zlosses = np.asarray(jax.device_get(zmetrics['loss']))
    assert np.allclose(zlosses, losses, rtol=5e-4, atol=1e-6), \
        (zlosses[:3], losses[:3])
    # per-device shard shapes: state really is sharded over 'space'
    n_pad = -(-zc.n_params // 2) * 2
    for s in zstate.params.addressable_shards:
        assert s.data.shape == (n_pad // 2,), s.data.shape

    print(f'RESULT {losses[-1]:.8e} {float(np.sum(np.abs(flat))):.8e} '
          f'{zlosses[-1]:.8e}', flush=True)


if __name__ == '__main__':
    main()
