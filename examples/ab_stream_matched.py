#!/usr/bin/env python
"""Stream-matched torch-vs-jax A/B: drive the torch mirror with the jax
trainer's EXACT position stream, so any residual PSNR delta isolates a
training-dynamics difference from sampling-stream luck.

The jax side samples positions chunk-wise from the TrainState key chain
(trainer._scan_chunk: per chunk `key, k_pos, k_gate = split(key, 3)`, then
one (steps, N, 3) randint).  This probe replays that exact chain to build a
position iterator for tests/torch_ab.solve_model_torch.

  PYTHONPATH=. python examples/ab_stream_matched.py [--seeds 3]
"""

import argparse
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
# the axon TPU plugin in this image ignores JAX_PLATFORMS; force via config
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seeds', type=int, default=3)
    ap.add_argument('--family', default='dense', choices=['dense', 'smallify'])
    args = ap.parse_args()

    import numpy as np
    import jax
    from latent_feature_grid_compression_tpu.config import TrainConfig
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.train import training
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.torch_ab import training_torch, jax_pos_stream
    from tests.test_ab_parity import synthetic_volume
    import tempfile

    vol = synthetic_volume()
    drop_type = '' if args.family == 'dense' else args.family
    kw = dict(lambda_drop_loss=2e-5, lambda_weight_loss=1e-8) \
        if drop_type == 'smallify' else {}
    deltas = []
    for seed in range(args.seeds):
        with tempfile.TemporaryDirectory(dir='.') as td:
            cfg = TrainConfig(
                expname=f'absm_{seed}', data='',
                basedir=f'/{os.path.relpath(td)}/',
                drop_type=drop_type, max_pass=30, batch_size=256,
                sample_size=8, grid_size=8, grid_features=8,
                n_hidden_size=16, n_layers=2, steps_per_chunk=64,
                lr=0.01, pass_decay=20, lr_decay=0.2, seed=seed,
                rng_impl='threefry2x32', **kw)
            spec = make_spec(
                grid_size=cfg.grid_size, grid_features=cfg.grid_features,
                hidden=cfg.n_hidden_size, num_layers=cfg.n_layers,
                drop_type=cfg.drop_type, drop_momentum=cfg.drop_momentum,
                drop_threshold=cfg.drop_threshold)
            k_model, _, k_train = jax.random.split(jax.random.key(cfg.seed), 3)
            params, _ = init_model(k_model, spec)
            N = cfg.batch_size * cfg.sample_size
            res = vol.shape
            streams = (
                jax_pos_stream(k_train, cfg.steps_per_chunk, N, res),
                jax_pos_stream(jax.random.fold_in(k_train, 1),
                               cfg.steps_per_chunk, N, res),
            )
            psnr_t, zeros_t = training_torch(spec, params, vol, cfg,
                                             seed=seed, pos_streams=streams)
            info = training(cfg, verbose=False, volume_np=vol,
                            write_vols=False)
        d = info['psnr'] - psnr_t
        deltas.append(d)
        print(f"seed {seed}: torch {psnr_t:7.3f}  jax {info['psnr']:7.3f}  "
              f"delta {d:+6.3f}  zeros t/j {zeros_t:.0f}/{info['num_zeros']:.0f}",
              flush=True)
    deltas = np.asarray(deltas)
    print(f"mean delta {deltas.mean():+.3f}  std {deltas.std():.3f}")


if __name__ == '__main__':
    main()
