#!/usr/bin/env python
"""Full flagship train step under each interp backend, on the real chip.

This is the measurement behind resolve_interp_backend('auto'): whichever
backend wins HERE at the flagship shapes is what 'auto' must pick
(VERDICT r3 finding 1: the fused kernel became the default without
winning this bench).  Run: python examples/bench_step_backends.py
"""

import sys
import time

import numpy as np


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

    n = 255
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)).astype(np.float32)
    meta = VolumeMeta(vol.shape)
    volume = jnp.asarray(vol)

    backends = sys.argv[1:] or ['xla', 'pallas', 'fused']
    for backend in backends:
        cfg = TrainConfig(drop_type='smallify', batch_size=2048,
                          sample_size=16, grid_size=15, grid_features=16,
                          n_hidden_size=32, n_layers=4, lr=0.008, max_pass=60,
                          interp_backend=backend)
        spec = make_spec(grid_size=cfg.grid_size,
                         grid_features=cfg.grid_features,
                         hidden=cfg.n_hidden_size, num_layers=cfg.n_layers,
                         drop_type=cfg.drop_type,
                         drop_momentum=cfg.drop_momentum,
                         drop_threshold=cfg.drop_threshold,
                         interp_backend=cfg.interp_backend)
        ph = make_phase_spec(cfg, spec, meta, phase=1)
        params, aux = init_model(jax.random.key(0), spec)
        state = init_train_state(params, None, aux, cfg.lr, cfg.lr,
                                 jax.random.key(1, impl=cfg.rng_impl),
                                 cfg.lambda_drop_loss)
        steps_per_chunk = 100
        run = make_chunk_runner(ph, None, steps_per_chunk)
        state, m = run(state, volume)
        _ = float(m['loss'][-1])                  # compile + sync
        n_chunks = 5
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, m = run(state, volume)
        _ = float(m['loss'][-1])
        dt = time.perf_counter() - t0
        steps = n_chunks * steps_per_chunk
        sps = steps * ph.batch_n / dt
        print(f'{backend:12s} {dt / steps * 1e3:7.3f} ms/step '
              f'{sps / 1e6:7.2f} Msamples/s')


if __name__ == '__main__':
    main()
