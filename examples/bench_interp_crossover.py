#!/usr/bin/env python
"""Pallas/XLA interp-backend crossover curve over grid size (VERDICT r4 #6).

Runs the full flagship-shaped train step (smallify, 255^3 volume, batch
32768) at every NAS-reachable grid size under both backends and prints the
winner per size.  The measured boundary feeds
models/feature_grid.py::resolve_interp_backend — 'auto' must be justified at
every shape the NAS spaces can visit (4..62, Multi_Objective_NAS.py bounds).

Run: python examples/bench_interp_crossover.py [grid sizes...]
"""

import sys
import time

import numpy as np


def bench(backend, grid_size, volume, meta):
    import jax
    import jax.numpy as jnp  # noqa: F401
    from latent_feature_grid_compression_tpu.config import TrainConfig
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.train.trainer import (
        make_phase_spec, init_train_state, make_chunk_runner)

    cfg = TrainConfig(drop_type='smallify', batch_size=2048, sample_size=16,
                      grid_size=grid_size, grid_features=16, n_hidden_size=32,
                      n_layers=4, lr=0.008, max_pass=60,
                      interp_backend=backend)
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
    steps_per_chunk = 100
    run = make_chunk_runner(ph, None, steps_per_chunk)
    state, m = run(state, volume)
    _ = float(m['loss'][-1])                  # compile + sync (axon quirk)
    n_chunks = 3
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, m = run(state, volume)
    _ = float(m['loss'][-1])
    dt = time.perf_counter() - t0
    return dt / (n_chunks * steps_per_chunk) * 1e3


def main():
    from latent_feature_grid_compression_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    import jax.numpy as jnp
    from latent_feature_grid_compression_tpu.data.volume import VolumeMeta

    n = 255
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)).astype(np.float32)
    meta = VolumeMeta(vol.shape)
    volume = jnp.asarray(vol)

    sizes = [int(a) for a in sys.argv[1:]] or [8, 15, 16, 24, 32, 48, 62]
    print(f"{'grid':>5s} {'xla ms':>8s} {'pallas ms':>10s}  winner")
    for g in sizes:
        t_xla = bench('xla', g, volume, meta)
        try:
            t_pal = bench('pallas', g, volume, meta)
        except Exception as e:  # pallas kernel may be infeasible at size
            print(f"{g:5d} {t_xla:8.3f} {'infeasible':>10s}  xla   ({type(e).__name__})")
            continue
        win = 'pallas' if t_pal < t_xla else 'xla'
        print(f"{g:5d} {t_xla:8.3f} {t_pal:10.3f}  {win}")


if __name__ == '__main__':
    main()
