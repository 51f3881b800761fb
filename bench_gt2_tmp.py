"""Scan-amortized microbench: sampling RNG + GT fetch variants."""
import time
import numpy as np

from latent_feature_grid_compression_tpu.utils.compilation_cache import (
    enable_compilation_cache)
enable_compilation_cache()

import jax
import jax.numpy as jnp

N = 32768
R = 255
STEPS = 100
vol = jnp.asarray(np.random.rand(R, R, R).astype(np.float32))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(out[1] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out[1] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / iters / STEPS * 1e3


def make(body, key):
    @jax.jit
    def run(key, vol):
        def step(carry, _):
            k, acc = carry
            k, k2 = jax.random.split(k)
            acc = acc + body(k2, vol)
            return (k, acc), None
        (k, acc), _ = jax.lax.scan(step, (key, 0.0), None, length=STEPS)
        return acc
    return lambda: run(key, vol)


res = jnp.asarray([R, R, R])

def sample_only(k, vol):
    pos = jax.random.randint(k, (N, 3), 0, res[None])
    return jnp.sum(pos).astype(jnp.float32)

def scalar(k, vol):
    pos = jax.random.randint(k, (N, 3), 0, res[None])
    return jnp.sum(vol[pos[:, 0], pos[:, 1], pos[:, 2]])

def rows(k, vol):
    pos = jax.random.randint(k, (N, 3), 0, res[None])
    r = vol.reshape(R * R, R)[pos[:, 0] * R + pos[:, 1]]
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1) == pos[:, 2][:, None]
    return jnp.sum(jnp.where(sel, r, 0.0))

def bits_only(k, vol):
    b = jax.random.bits(k, (N, 3))
    return jnp.sum(b % jnp.uint32(R)).astype(jnp.float32)

def noop(k, vol):
    return jnp.float32(0.0)

key_tf = jax.random.key(0)
key_rbg = jax.random.key(0, impl='rbg')

print('noop       ms/step:', timeit(make(noop, key_tf)))
print('sample tf  ms/step:', timeit(make(sample_only, key_tf)))
print('sample rbg ms/step:', timeit(make(sample_only, key_rbg)))
print('bits tf    ms/step:', timeit(make(bits_only, key_tf)))
print('scalar tf  ms/step:', timeit(make(scalar, key_tf)))
print('scalar rbg ms/step:', timeit(make(scalar, key_rbg)))
print('rows tf    ms/step:', timeit(make(rows, key_tf)))
print('rows rbg   ms/step:', timeit(make(rows, key_rbg)))
