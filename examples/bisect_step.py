#!/usr/bin/env python
"""Bisect the train step: time each pipeline stage scan-amortized on the
current backend (run on the TPU chip for BENCH_NOTES numbers).

Variants, all at flagship shapes (255^3 volume, batch 2048x16, grid 16x15^3
db2, 4x32 MLP, smallify phase 1):

  sample+gt    on-device position sampling + exact GT gather
  fwd          loss evaluation (decode + interp + MLP + penalties)
  fwd+bwd      jax.value_and_grad of the loss
  full         complete train step (grads + Adam + tracker + lr strategy)
  full[xla]    same, interp_backend='xla' (gather path)
  full[bf16]   same, pallas_bf16 single-MXU-pass interpolation

Usage: python examples/bisect_step.py [--grid 15] [--batch 32768]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--grid', type=int, default=15)
    ap.add_argument('--batch', type=int, default=32768)
    ap.add_argument('--steps', type=int, default=100)
    ap.add_argument('--vol', type=int, default=255)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from latent_feature_grid_compression_tpu.config import TrainConfig
    from latent_feature_grid_compression_tpu.data.volume import VolumeMeta
    from latent_feature_grid_compression_tpu.models import (make_spec,
                                                            init_model,
                                                            apply_model)
    from latent_feature_grid_compression_tpu.ops.interpolation import (
        gather_volume)
    from latent_feature_grid_compression_tpu.train import losses as L
    from latent_feature_grid_compression_tpu.train.trainer import (
        make_phase_spec, init_train_state, make_chunk_runner)

    n = args.vol
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)).astype(np.float32)
    volume = jnp.asarray(vol)
    meta = VolumeMeta(vol.shape)
    res = np.asarray(vol.shape, np.int32)
    max_idx = (res - 1).astype(np.float32)
    scales = max_idx / max_idx.max()
    N = args.batch
    steps = args.steps

    def timeit(label, fn, carry):
        """fn: (carry) -> carry with a fetchable scalar at carry[0]."""
        carry = fn(carry)
        _ = float(np.asarray(jax.device_get(carry[0])).ravel()[0])  # compile+sync
        t0 = time.perf_counter()
        carry = fn(carry)
        _ = float(np.asarray(jax.device_get(carry[0])).ravel()[0])
        dt = time.perf_counter() - t0
        print(f"{label:14s} {dt / steps * 1e3:8.3f} ms/step "
              f"({N * steps / dt / 1e6:8.2f} Msamples/s)")

    def sample(key):
        k_pos, k_gate = jax.random.split(key)
        pos = jax.random.randint(k_pos, (N, 3), 0, res[None, :])
        norm = (pos.astype(jnp.float32) / max_idx[None]) * 2.0 - 1.0
        return pos, norm * scales[None], k_gate

    # --- sampling + GT gather ------------------------------------------------
    @jax.jit
    def run_sample(carry):
        def body(c, _):
            acc, key = c
            key, sub = jax.random.split(key)
            pos, _, _ = sample(sub)
            return (acc + jnp.sum(gather_volume(volume, pos)), key), None
        return jax.lax.scan(body, carry, None, length=steps)[0]

    timeit('sample+gt', run_sample, (jnp.zeros(()), jax.random.key(0)))

    # --- fwd / fwd+bwd on each backend --------------------------------------
    for backend in ('pallas', 'xla'):
        spec = make_spec(grid_size=args.grid, grid_features=16, hidden=32,
                         num_layers=4, drop_type='smallify',
                         interp_backend=backend)
        params, _ = init_model(jax.random.key(0), spec)

        def loss_fn(p, npos, gt, k_gate):
            pred = apply_model(spec, p, npos, train=True, train_gates=True,
                               rng=k_gate)[:, 0]
            return (jnp.mean((pred - gt) ** 2)
                    + L.smallify_family_loss('smallify', p, 1e-8, 1e-8))

        @jax.jit
        def run_fwd(carry, _loss=loss_fn):
            def body(c, _):
                acc, key = c
                key, sub = jax.random.split(key)
                pos, npos, k_gate = sample(sub)
                gt = gather_volume(volume, pos)
                return (acc + _loss(params, npos, gt, k_gate), key), None
            return jax.lax.scan(body, carry, None, length=steps)[0]

        @jax.jit
        def run_fwd_bwd(carry, _loss=loss_fn):
            def body(c, _):
                acc, key = c
                key, sub = jax.random.split(key)
                pos, npos, k_gate = sample(sub)
                gt = gather_volume(volume, pos)
                l, g = jax.value_and_grad(_loss)(params, npos, gt, k_gate)
                return (acc + l + ravel_pytree(g)[0][0], key), None
            return jax.lax.scan(body, carry, None, length=steps)[0]

        timeit(f'fwd[{backend}]', run_fwd, (jnp.zeros(()), jax.random.key(1)))
        timeit(f'fwd+bwd[{backend}]', run_fwd_bwd,
               (jnp.zeros(()), jax.random.key(2)))

    # --- full train step per backend -----------------------------------------
    for backend in ('pallas', 'xla', 'pallas_bf16'):
        cfg = TrainConfig(drop_type='smallify', batch_size=N // 16,
                          sample_size=16, grid_size=args.grid,
                          grid_features=16, n_hidden_size=32, n_layers=4,
                          lr=0.008, max_pass=10**6, interp_backend=backend)
        spec = make_spec(grid_size=cfg.grid_size, grid_features=16, hidden=32,
                         num_layers=4, drop_type='smallify',
                         interp_backend=backend)
        ph = make_phase_spec(cfg, spec, meta, phase=1)
        params, aux = init_model(jax.random.key(0), spec)
        state = init_train_state(params, None, aux, cfg.lr, cfg.lr,
                                 jax.random.key(1, impl=cfg.rng_impl),
                                 cfg.lambda_drop_loss)
        run = make_chunk_runner(ph, None, steps)

        def run_full(carry, _run=run):
            st, _ = carry
            st, m = _run(st, volume)
            return (m['loss'][-1], st)

        timeit(f'full[{backend}]', run_full, (jnp.zeros(()), state))


if __name__ == '__main__':
    main()
