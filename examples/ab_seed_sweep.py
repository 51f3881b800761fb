#!/usr/bin/env python
"""Multi-seed torch-vs-jax A/B parity sweep (CPU).

Runs the head-to-head of tests/test_ab_parity.py across several seeds and
prints per-seed PSNR deltas, so the parity tolerances are pinned by
measured spread rather than a single draw (ADVICE r3, high).

  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/ab_seed_sweep.py [--family dense]
"""

import argparse
import os
import sys
import tempfile

os.environ['JAX_PLATFORMS'] = 'cpu'   # CPU study; never grab the TPU chip
# the axon TPU plugin in this image ignores JAX_PLATFORMS; force via config
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--family', default='dense',
                    choices=['dense', 'smallify', 'masked_straight_through',
                             'variational_static'])
    ap.add_argument('--seeds', type=int, default=6)
    args = ap.parse_args()

    import numpy as np
    import jax
    from latent_feature_grid_compression_tpu.config import TrainConfig
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.train import training
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.torch_ab import training_torch
    from tests.test_ab_parity import synthetic_volume

    vol = synthetic_volume()
    drop_type = '' if args.family == 'dense' else args.family
    deltas = []
    for seed in range(args.seeds):
        kw = {}
        if drop_type == 'smallify':
            kw = dict(lambda_drop_loss=2e-5, lambda_weight_loss=1e-8)
        elif drop_type == 'masked_straight_through':
            kw = dict(lambda_drop_loss=2e-6, lambda_weight_loss=1e-8)
        elif drop_type == 'variational_static':
            kw = dict(lambda_drop_loss=1e-6, lambda_weight_loss=1e-8,
                      weight_dkl_multiplier=5e-4, variational_sigma=-7.0)
        with tempfile.TemporaryDirectory(dir='.') as td:
            cfg = TrainConfig(
                expname=f'ab_{args.family}_{seed}', data='',
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
            k_model, _, _ = jax.random.split(jax.random.key(cfg.seed), 3)
            params, _ = init_model(k_model, spec)
            psnr_t, zeros_t = training_torch(spec, params, vol, cfg, seed=seed)
            info = training(cfg, verbose=False, volume_np=vol,
                            write_vols=False)
        d = info['psnr'] - psnr_t
        deltas.append(d)
        print(f"seed {seed}: torch {psnr_t:7.3f}  jax {info['psnr']:7.3f}  "
              f"delta {d:+6.3f}  zeros t/j {zeros_t:.0f}/{info['num_zeros']:.0f}",
              flush=True)
    deltas = np.asarray(deltas)
    print(f"mean delta {deltas.mean():+.3f}  std {deltas.std():.3f}  "
          f"min {deltas.min():+.3f}  max {deltas.max():+.3f}")


if __name__ == '__main__':
    main()
