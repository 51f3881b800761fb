"""Capture side-by-side profiler traces of the flagship train step with the
XLA MLP chain vs the fused Pallas MLP kernel (VERDICT r4 #1).

The r4 finding: adding the (standalone-equal) Pallas MLP kernel pair to the
step costs +1.1 ms even though the kernel itself matches XLA — suspected
scheduling/pipelining effect at custom-call boundaries.  This script captures
one steady-state 200-step chunk per variant so the per-op timelines can be
diffed (examples/trace_summarize.py).

Usage (on the TPU):
    python examples/trace_mlp_ab.py --mlp_backend xla    --out tmp/r5/trace_mlp_xla
    python examples/trace_mlp_ab.py --mlp_backend pallas --out tmp/r5/trace_mlp_pallas
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mlp_backend', default='xla', choices=['xla', 'pallas'])
    ap.add_argument('--interp_backend', default='pallas')
    ap.add_argument('--compute_dtype', default='float32')
    ap.add_argument('--out', required=True)
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--data', default='datasets/mhd_like.npy')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from latent_feature_grid_compression_tpu.config import TrainConfig
    from latent_feature_grid_compression_tpu.data.volume import (load_volume,
                                                                 VolumeMeta)
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.train.trainer import (
        make_phase_spec, init_train_state, make_chunk_runner)
    from latent_feature_grid_compression_tpu.utils.profiling import trace

    vol = load_volume(args.data)
    meta = VolumeMeta(tuple(vol.shape))
    volume = jnp.asarray(vol)

    cfg = TrainConfig(drop_type='smallify', batch_size=2048, sample_size=16,
                      max_pass=60, lr=0.008, grid_size=15, grid_features=16,
                      n_hidden_size=32, n_layers=4)
    spec = make_spec(d_in=3, hidden=32, d_out=1, num_layers=4, n_freqs=2,
                     grid_features=16, grid_size=15, wavelet='db2',
                     drop_type='smallify',
                     interp_backend=args.interp_backend,
                     compute_dtype=args.compute_dtype,
                     mlp_backend=args.mlp_backend)
    ph = make_phase_spec(cfg, spec, meta, phase=1)
    key = jax.random.key(0, impl='rbg')
    k_model, _, k_train = jax.random.split(key, 3)
    params, gate_aux = init_model(k_model, spec)
    state = init_train_state(params, None, gate_aux, cfg.lr, cfg.lr, k_train,
                             cfg.lambda_drop_loss)
    run = make_chunk_runner(ph, None, args.steps)

    # compile + warm (2 chunks), syncing by scalar fetch (axon quirk)
    for _ in range(2):
        state, m = run(state, volume)
        _ = float(np.asarray(m['loss'])[-1])

    t0 = time.perf_counter()
    state, m = run(state, volume)
    _ = float(np.asarray(m['loss'])[-1])
    wall = time.perf_counter() - t0
    print(f"untraced chunk: {wall * 1e3 / args.steps:.3f} ms/step "
          f"({cfg.batch_size * cfg.sample_size * args.steps / wall / 1e6:.2f} Ms/s)")

    with trace(args.out):
        state, m = run(state, volume)
        _ = float(np.asarray(m['loss'])[-1])
    print(f"trace written to {args.out}")


if __name__ == '__main__':
    main()
