#!/usr/bin/env python
"""Micro-benchmark: XLA gather path vs Pallas one-hot-MXU kernel for the
feature-grid trilinear fetch, forward and forward+backward, and the full
train step under each backend.  Run on the real TPU chip."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from latent_feature_grid_compression_tpu.ops.interpolation import grid_sample_3d
from latent_feature_grid_compression_tpu.ops.pallas_kernels import (
    pallas_grid_sample_3d)


def sync(x):
    # axon: block_until_ready returns early; fetch a scalar to sync.
    return float(jnp.sum(x).block_until_ready() if hasattr(x, 'block_until_ready')
                 else x)


def timeit(fn, *args, iters=50):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    key = jax.random.key(0)
    C, G = 16, 15
    N = 2048 * 16
    feats = jax.random.normal(jax.random.fold_in(key, 1), (C, G, G, G))
    coords = jax.random.uniform(jax.random.fold_in(key, 2), (N, 3),
                                minval=-1.0, maxval=1.0)
    g = jax.random.normal(jax.random.fold_in(key, 3), (N, C))

    xla_fwd = jax.jit(grid_sample_3d)
    a = np.asarray(xla_fwd(feats, coords))

    def xla_fwdbwd(f, c, ct):
        # keep the forward live (mirrors the train step where the prediction
        # feeds the loss) so XLA cannot DCE it
        out, vjp = jax.vjp(lambda ff: grid_sample_3d(ff, c), f)
        return vjp(ct)[0], jnp.sum(out)

    xb = jax.jit(xla_fwdbwd)
    da = np.asarray(xb(feats, coords, g)[0])
    print(f'xla fwd      {timeit(xla_fwd, feats, coords):8.3f} ms')
    print(f'xla fwd+bwd  {timeit(xb, feats, coords, g):8.3f} ms')

    for prec in ('f32', 'bf16'):
        pal_fwd = jax.jit(lambda f, c: pallas_grid_sample_3d(f, c,
                                                             precision=prec))

        def pal_fwdbwd(f, c, ct):
            out, vjp = jax.vjp(
                lambda ff: pallas_grid_sample_3d(ff, c, precision=prec), f)
            return vjp(ct)[0], jnp.sum(out)

        pb = jax.jit(pal_fwdbwd)
        b = np.asarray(pal_fwd(feats, coords))
        db = np.asarray(pb(feats, coords, g)[0])
        print(f'[{prec}] fwd max abs diff:', np.abs(a - b).max())
        print(f'[{prec}] bwd max abs diff:', np.abs(da - db).max(),
              'rel:', np.abs(da - db).max() / max(np.abs(da).max(), 1e-9))
        print(f'pallas/{prec} fwd   {timeit(pal_fwd, feats, coords):8.3f} ms')
        print(f'pallas/{prec} f+b   {timeit(pb, feats, coords, g):8.3f} ms')


if __name__ == '__main__':
    main()
