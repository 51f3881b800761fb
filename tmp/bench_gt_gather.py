"""Microbench: GT voxel-fetch strategies on the real TPU.

Variants:
  scalar : volume[x, y, z] (current gather_volume)
  rows   : gather (N, Z) rows then one-hot select over lanes
  rows_ta: gather rows then take_along_axis
Also times position sampling RNG alone for context.
"""
import time
import numpy as np

from latent_feature_grid_compression_tpu.utils.compilation_cache import (
    enable_compilation_cache)
enable_compilation_cache()

import jax
import jax.numpy as jnp

N = 32768
R = 255
vol = jnp.asarray(np.random.rand(R, R, R).astype(np.float32))
key = jax.random.key(0)


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=50):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


@jax.jit
def sample_only(key):
    pos = jax.random.randint(key, (N, 3), 0, jnp.asarray([R, R, R])[None])
    return pos.sum()


@jax.jit
def scalar(vol, key):
    pos = jax.random.randint(key, (N, 3), 0, jnp.asarray([R, R, R])[None])
    return vol[pos[:, 0], pos[:, 1], pos[:, 2]]


@jax.jit
def rows(vol, key):
    pos = jax.random.randint(key, (N, 3), 0, jnp.asarray([R, R, R])[None])
    X, Y, Z = vol.shape
    r = vol.reshape(X * Y, Z)[pos[:, 0] * Y + pos[:, 1]]
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, Z), 1) == pos[:, 2][:, None]
    return jnp.sum(jnp.where(sel, r, 0.0), axis=1)


@jax.jit
def rows_ta(vol, key):
    pos = jax.random.randint(key, (N, 3), 0, jnp.asarray([R, R, R])[None])
    X, Y, Z = vol.shape
    r = vol.reshape(X * Y, Z)[pos[:, 0] * Y + pos[:, 1]]
    return jnp.take_along_axis(r, pos[:, 2][:, None], axis=1)[:, 0]


# correctness
p = jax.random.randint(jax.random.key(1), (N, 3), 0, jnp.asarray([R, R, R])[None])
a = vol[p[:, 0], p[:, 1], p[:, 2]]
X, Y, Z = vol.shape
r = vol.reshape(X * Y, Z)[p[:, 0] * Y + p[:, 1]]
sel = jax.lax.broadcasted_iota(jnp.int32, (1, Z), 1) == p[:, 2][:, None]
b = jnp.sum(jnp.where(sel, r, 0.0), axis=1)
c = jnp.take_along_axis(r, p[:, 2][:, None], axis=1)[:, 0]
assert np.array_equal(np.asarray(a), np.asarray(b))
assert np.array_equal(np.asarray(a), np.asarray(c))
print('parity ok')

print('sample_only ms:', timeit(sample_only, key))
print('scalar ms:', timeit(scalar, vol, key))
print('rows ms:', timeit(rows, vol, key))
print('rows_ta ms:', timeit(rows_ta, vol, key))
