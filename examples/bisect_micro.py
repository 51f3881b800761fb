#!/usr/bin/env python
"""Micro-bisection of the train step's primitive costs, scan-amortized.

Times each independent ingredient of the fused step at flagship shapes
(255^3 volume, batch 32768, grid 16x15^3 db2, 4x32 MLP) so the optimization
target is unambiguous:

  rng[threefry]   key split + (N,3) randint, default impl
  rng[rbg]        same with the rbg PRNG (hardware RNG path)
  gt[row255]      gather_volume z-row gather + lane select (current)
  gt[elem]        naive per-element volume[x,y,z]
  gt[seg8]        8-voxel segment gather + 8-lane select
  decode          gated inverse DWT coeffs -> (16, G, G, G) grid
  interp[f32]     Pallas fused interpolation fwd (decoded grid)
  interp+bwd      forward + grid cotangent
  mlp             4x32 SnakeAlt MLP fwd+bwd at (N, in)
  adam            flat-vector Adam update on the full trainable pytree

Run on the TPU chip: python examples/bisect_micro.py [--steps 200]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--grid', type=int, default=15)
    ap.add_argument('--batch', type=int, default=32768)
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--vol', type=int, default=255)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from latent_feature_grid_compression_tpu.models import (make_spec,
                                                            init_model)
    from latent_feature_grid_compression_tpu.models.feature_grid import (
        decode_volume)
    from latent_feature_grid_compression_tpu.ops.interpolation import (
        gather_volume)
    from latent_feature_grid_compression_tpu.ops.pallas_kernels import (
        pallas_grid_sample_3d)
    from latent_feature_grid_compression_tpu.ops.mlp import mlp_apply, snake_alt
    from latent_feature_grid_compression_tpu.ops.embedding import fourier_embed
    from latent_feature_grid_compression_tpu.train.trainer import _adam_update

    n = args.vol
    N = args.batch
    steps = args.steps
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)).astype(np.float32)
    volume = jnp.asarray(vol)
    res = np.asarray(vol.shape, np.int32)

    spec = make_spec(grid_size=args.grid, grid_features=16, hidden=32,
                     num_layers=4, drop_type='smallify',
                     interp_backend='pallas')
    params, _ = init_model(jax.random.key(0), spec)
    grid = decode_volume(spec, params)           # static decoded grid
    grid = jax.block_until_ready(grid)

    def timeit(label, fn, carry):
        carry = fn(carry)
        _ = float(np.asarray(jax.device_get(
            jax.tree.leaves(carry)[0])).ravel()[0])
        t0 = time.perf_counter()
        carry = fn(carry)
        _ = float(np.asarray(jax.device_get(
            jax.tree.leaves(carry)[0])).ravel()[0])
        dt = time.perf_counter() - t0
        print(f"{label:16s} {dt / steps * 1e3:8.3f} ms/step "
              f"({N * steps / dt / 1e6:8.2f} Msamples/s)")

    def scan(body):
        @jax.jit
        def run(carry):
            return jax.lax.scan(lambda c, _: (body(c), None), carry, None,
                                length=steps)[0]
        return run

    # --- RNG -----------------------------------------------------------------
    for impl in ('threefry2x32', 'rbg'):
        key0 = jax.random.key(0, impl=impl)

        def rng_body(c, _impl=impl):
            acc, key = c
            key, k_pos, k_gate = jax.random.split(key, 3)
            pos = jax.random.randint(k_pos, (N, 3), 0, res[None, :])
            return (acc + jnp.sum(pos), key)

        timeit(f'rng[{impl[:8]}]', scan(rng_body), (jnp.zeros((), jnp.int32), key0))

    # --- GT gather variants (fixed positions per step, cycled) ---------------
    key = jax.random.key(1)
    pos = jax.random.randint(key, (N, 3), 0, res[None, :])

    def gt_row(c):
        acc, p = c
        p = (p + 131) % res[None, :]
        return (acc + jnp.sum(gather_volume(volume, p)), p)

    def gt_elem(c):
        acc, p = c
        p = (p + 131) % res[None, :]
        return (acc + jnp.sum(volume[p[:, 0], p[:, 1], p[:, 2]]), p)

    Zpad = 256  # pad Z to a multiple of seg
    vol_pad = jnp.pad(volume, ((0, 0), (0, 0), (0, Zpad - res[2])))
    seg = 8
    vseg = vol_pad.reshape(res[0] * res[1] * (Zpad // seg), seg)

    def gt_seg(c):
        acc, p = c
        p = (p + 131) % res[None, :]
        row = (p[:, 0] * res[1] + p[:, 1]) * (Zpad // seg) + p[:, 2] // seg
        rows = vseg[row]                                   # (N, seg)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (1, seg), 1)
               == (p[:, 2] % seg)[:, None])
        return (acc + jnp.sum(jnp.where(sel, rows, 0.0)), p)

    # 128-lane rows: pad Z to a multiple of 128 so each gathered row is
    # exactly one 512-byte lane tile (half the bytes of the 255-f32 row)
    Z128 = -(-res[2] // 128) * 128
    vol_128 = jnp.pad(volume, ((0, 0), (0, 0), (0, Z128 - res[2])))
    v128 = vol_128.reshape(res[0] * res[1] * (Z128 // 128), 128)

    def gt_row128(c):
        acc, p = c
        p = (p + 131) % res[None, :]
        row = (p[:, 0] * res[1] + p[:, 1]) * (Z128 // 128) + p[:, 2] // 128
        rows = v128[row]                                   # (N, 128)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
               == (p[:, 2] % 128)[:, None])
        return (acc + jnp.sum(jnp.where(sel, rows, 0.0)), p)

    timeit('gt[row255]', scan(gt_row), (jnp.zeros(()), pos))
    timeit('gt[elem]', scan(gt_elem), (jnp.zeros(()), pos))
    timeit('gt[seg8]', scan(gt_seg), (jnp.zeros(()), pos))
    timeit('gt[row128]', scan(gt_row128), (jnp.zeros(()), pos))

    # --- decode (gated inverse DWT) ------------------------------------------
    def decode_body(c):
        acc, key = c
        key, k = jax.random.split(key)
        g = decode_volume(spec, params, train_gates=True, rng=k)
        return (acc + jnp.sum(g), key)

    timeit('decode', scan(decode_body), (jnp.zeros(()), jax.random.key(2)))

    # --- interpolation on a fixed decoded grid -------------------------------
    coords = jax.random.uniform(jax.random.key(3), (N, 3), minval=-1.0,
                                maxval=1.0)

    def interp_fwd(c):
        acc, cr = c
        cr = -cr
        return (acc + jnp.sum(pallas_grid_sample_3d(grid, cr)), cr)

    def interp_fwd_bwd(c):
        acc, cr = c
        cr = -cr
        f = lambda g: jnp.sum(pallas_grid_sample_3d(g, cr) ** 2)
        val, dg = jax.value_and_grad(f)(grid)
        return (acc + val + dg[0, 0, 0, 0], cr)

    try:
        timeit('interp[f32]', scan(interp_fwd), (jnp.zeros(()), coords))
        timeit('interp+bwd', scan(interp_fwd_bwd), (jnp.zeros(()), coords))
    except ValueError as e:          # Pallas needs a TPU (CPU smoke runs)
        print(f"interp          skipped ({e})")

    # --- MLP fwd+bwd ---------------------------------------------------------
    emb = fourier_embed(coords, spec.n_freqs)
    feats0 = jnp.zeros((N, 16))
    xin = jnp.concatenate([coords, emb, feats0], axis=-1)

    def mlp_body(c):
        acc, xi = c
        xi = -xi
        f = lambda ws: jnp.sum(mlp_apply(list(ws), list(params.mlp_b), xi,
                                         snake_alt) ** 2)
        val, dw = jax.value_and_grad(f)(params.mlp_w)
        return (acc + val + dw[0][0, 0], xi)

    timeit('mlp', scan(mlp_body), (jnp.zeros(()), xin))

    # --- Adam ----------------------------------------------------------------
    trainables = (params, None)
    grads = jax.tree.map(lambda p: jnp.cos(p * 3.0) * 0.01, trainables)
    m0, _ = ravel_pytree(jax.tree.map(jnp.zeros_like, trainables))

    def adam_body(c):
        t, tr, m, v = c
        tr, m, v = _adam_update(tr, grads, m, v, t, 0.008)
        return (t + 1.0, tr, m, v)

    timeit('adam', scan(adam_body), (jnp.ones(()), trainables, m0, m0))


if __name__ == '__main__':
    main()
