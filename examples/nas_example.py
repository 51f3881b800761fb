#!/usr/bin/env python
"""Multi-objective NAS driver (the reference's Multiobjective-NAS.ipynb flow):
build a search, run all trials, extract the Pareto frontier, plot it.

Usage:
    python examples/make_test_volume.py            # once, to create data
    python examples/nas_example.py [--trials 12] [--drop_type smallify]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from latent_feature_grid_compression_tpu.nas import run_search, pareto_front
from latent_feature_grid_compression_tpu.utils.plots import plot_pareto_comparison


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config', default='experiment-config-files/test_impl_test.txt')
    p.add_argument('--drop_type', default='smallify')
    p.add_argument('--trials', type=int, default=12)
    p.add_argument('--parallelism', type=int, default=3)
    p.add_argument('--basedir', default='/experiments/NAS/')
    p.add_argument('--max_pass', type=int, default=0,
                   help='override max_pass for every trial (0 = config value)')
    args = p.parse_args()

    overrides = {'max_pass': args.max_pass} if args.max_pass else None
    trials = run_search(args.config, drop_type=args.drop_type,
                        total_trials=args.trials,
                        parallelism=args.parallelism, basedir=args.basedir,
                        extra_overrides=overrides)

    done = [t for t in trials if t.objective is not None]
    if done:
        front = [done[i] for i in pareto_front([t.objective for t in done])]
        print('\nPareto frontier (compression_ratio, psnr):')
        for t in sorted(front, key=lambda t: t.objective):
            print(f'  trial {t.index}: ratio={t.objective[0]:.1f} '
                  f'psnr={t.objective[1]:.2f}  params={t.params}')
        base = os.path.abspath(os.getcwd()) + args.basedir
        out = plot_pareto_comparison({'NAS': base}, 'nas_pareto.png')
        print(f'wrote {out}')


if __name__ == '__main__':
    main()
