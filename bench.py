#!/usr/bin/env python
"""Benchmark: training throughput of the flagship config on one chip.

Measures the fully-fused phase-1 train step (smallify-gated model, mhd_p
shapes: 255^3 volume, batch 2048x16, grid 16x15^3 db2, 4x32 MLP) and prints
one JSON line:  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is relative to the reference implementation's measured PyTorch
step rate on its shipped config (see BASELINE_SAMPLES_PER_SEC below; the
reference publishes no throughput numbers — this constant is the measured
throughput of this framework's first working TPU build, r1, so later rounds
report their speedup against it).
"""

import json
import time

import numpy as np

# r1 first-working-build throughput on one TPU v5e chip (samples/s).
BASELINE_SAMPLES_PER_SEC = 6.0e6


def main():
    from latent_feature_grid_compression_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from latent_feature_grid_compression_tpu.config import TrainConfig
    from latent_feature_grid_compression_tpu.data.volume import VolumeMeta
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.train.trainer import (
        make_phase_spec, init_train_state, make_chunk_runner)

    # mhd_p-like volume: 255^3.  Use the real RichtmyerMeshkov data if
    # available (crop 256->255 to exercise the odd-size path), else synthetic.
    try:
        from latent_feature_grid_compression_tpu.data.cvol import read_cvol
        vol = read_cvol(
            '/root/reference/datasets/RichtmyerMeshkov/ppm-t0020.cvol')
        vol = vol[:255, :255, :255].astype(np.float32)
        vol = (vol - vol.min()) / (vol.max() - vol.min()) * 2.0 - 1.0
    except Exception:
        n = 255
        x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
        vol = (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)).astype(np.float32)

    meta = VolumeMeta(vol.shape)
    cfg = TrainConfig(drop_type='smallify', batch_size=2048, sample_size=16,
                      grid_size=15, grid_features=16, n_hidden_size=32,
                      n_layers=4, lr=0.008, max_pass=60)
    spec = make_spec(grid_size=cfg.grid_size, grid_features=cfg.grid_features,
                     hidden=cfg.n_hidden_size, num_layers=cfg.n_layers,
                     drop_type=cfg.drop_type, drop_momentum=cfg.drop_momentum,
                     drop_threshold=cfg.drop_threshold,
                     interp_backend=cfg.interp_backend)
    ph = make_phase_spec(cfg, spec, meta, phase=1)
    params, aux = init_model(jax.random.key(0), spec)
    state = init_train_state(params, None, aux, cfg.lr, cfg.lr,
                             jax.random.key(1, impl=cfg.rng_impl),
                             cfg.lambda_drop_loss)
    volume = jnp.asarray(vol)

    steps_per_chunk = 100
    run = make_chunk_runner(ph, None, steps_per_chunk)

    # warmup + compile.  NOTE: on the axon remote-TPU platform
    # jax.block_until_ready does not reliably wait; sync by fetching a
    # scalar to the host instead.
    state, m = run(state, volume)
    _ = float(m['loss'][-1])

    n_chunks = 5
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, m = run(state, volume)
    _ = float(m['loss'][-1])
    dt = time.perf_counter() - t0

    steps = n_chunks * steps_per_chunk
    samples_per_sec = steps * ph.batch_n / dt
    assert np.isfinite(float(m['loss'][-1]))

    print(json.dumps({
        'metric': 'volume samples/sec/chip (mhd_p smallify train step)',
        'value': round(samples_per_sec, 1),
        'unit': 'samples/s',
        'vs_baseline': round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
