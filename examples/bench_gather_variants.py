#!/usr/bin/env python
"""Micro-bench: GT exact-voxel gather variants on the real chip.

The train step's ground-truth fetch is a random gather of N voxels from a
255^3 f32 volume resident in HBM.  XLA row gathers are per-row-overhead
bound (~15 ns/row regardless of row length, examples/bisect_micro.py), so
the variants differ in how many gathered rows they need and how aligned
those rows are:

  row255      current: (X*Y, Z) rows, iota lane select     (1 row/sample)
  row128      Z padded to 256, (X*Y*2, 128) aligned rows   (1 row/sample)
  row128bf16  same but volume pre-cast to bf16             (1 row/sample)
  plane-sum   one-hot z matmul over gathered (N, Z) rows -- MXU select
  elem        volume[x, y, z] per-element gather

Run: python - < examples/bench_gather_variants.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 255
    X = Y = Z = n
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((X, Y, Z), dtype=np.float32)
    volume = jnp.asarray(vol)
    N = 32768
    steps = 200

    Zp = 256
    volp = jnp.pad(volume, ((0, 0), (0, 0), (0, Zp - Z)))
    rows128 = volp.reshape(X * Y * 2, 128)
    rows128b = rows128.astype(jnp.bfloat16)
    rows255 = volume.reshape(X * Y, Z)

    key = jax.random.key(0, impl='rbg')

    def sample(k):
        return jax.random.randint(k, (N, 3), 0,
                                  jnp.asarray([X, Y, Z], jnp.int32)[None, :])

    def v_row255(pos):
        r = rows255[pos[:, 0] * Y + pos[:, 1]]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (1, Z), 1)
               == pos[:, 2][:, None])
        return jnp.sum(jnp.where(sel, r, 0.0), axis=1)

    def v_row128(pos):
        flat = (pos[:, 0] * Y + pos[:, 1]) * 2 + pos[:, 2] // 128
        r = rows128[flat]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
               == (pos[:, 2] % 128)[:, None])
        return jnp.sum(jnp.where(sel, r, 0.0), axis=1)

    def v_row128bf16(pos):
        flat = (pos[:, 0] * Y + pos[:, 1]) * 2 + pos[:, 2] // 128
        r = rows128b[flat]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
               == (pos[:, 2] % 128)[:, None])
        return jnp.sum(jnp.where(sel, r.astype(jnp.float32), 0.0), axis=1)

    def v_planesum(pos):
        r = rows255[pos[:, 0] * Y + pos[:, 1]]                    # (N, Z)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (N, Z), 1)
                  == pos[:, 2][:, None]).astype(jnp.bfloat16)
        return jnp.sum(r.astype(jnp.bfloat16) * onehot,
                       axis=1).astype(jnp.float32)

    def v_elem(pos):
        return volume[pos[:, 0], pos[:, 1], pos[:, 2]]

    variants = [('row255', v_row255), ('row128', v_row128),
                ('row128bf16', v_row128bf16), ('planesum', v_planesum),
                ('elem', v_elem)]

    # correctness first
    pos0 = jax.device_get(sample(key))
    want = vol[pos0[:, 0], pos0[:, 1], pos0[:, 2]]
    for name, fn in variants:
        got = np.asarray(jax.device_get(fn(jnp.asarray(pos0))))
        tol = 1e-2 if 'bf16' in name or name == 'planesum' else 0.0
        err = np.abs(got - want).max()
        assert err <= tol, (name, err)

    for name, fn in variants:
        @jax.jit
        def loop(k):
            def body(c, _):
                k = c
                k, ks = jax.random.split(k)
                pos = sample(ks)
                g = fn(pos)
                return k, jnp.sum(g)
            k, out = jax.lax.scan(body, k, None, length=steps)
            return jnp.sum(out)

        _ = float(loop(key))          # compile+warm
        t0 = time.perf_counter()
        s = float(loop(key))
        dt = time.perf_counter() - t0
        assert np.isfinite(s)
        print(f'{name:12s} {dt / steps * 1e3:7.3f} ms/step '
              f'({N * steps / dt / 1e6:8.2f} Msamples/s)')


main()
