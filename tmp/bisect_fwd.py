"""Bisect inside the model forward/backward: decode vs grid_sample vs MLP,
pallas f32 vs bf16 vs XLA backend, RNG cost.  Each timed fn takes a scalar
`eps` derived from the scan carry so XLA cannot hoist it out of the loop."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.models.feature_grid import (
        decode_volume, apply_model)
    from latent_feature_grid_compression_tpu.ops.interpolation import grid_sample_3d
    from latent_feature_grid_compression_tpu.ops.pallas_kernels import pallas_grid_sample_3d
    from latent_feature_grid_compression_tpu.ops.embedding import fourier_embed
    from latent_feature_grid_compression_tpu.ops.mlp import mlp_apply

    spec = make_spec(d_in=3, hidden=32, d_out=1, num_layers=4, n_freqs=2,
                     grid_features=16, grid_size=15, wavelet='db2',
                     drop_type='smallify')
    params, _ = init_model(jax.random.key(0), spec)
    N = 2048 * 16
    coords = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (N, 3)).astype(np.float32))
    steps = 100

    def timeit(fn, reps=3):
        """fn(eps) -> array; eps varies per scan iteration."""
        @jax.jit
        def jfn():
            def body(c, _):
                out = fn(c * 1e-30)
                return jnp.sum(out[:1]) * 1e-20 + c * 0.5, None
            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=steps)
            return c
        float(jfn())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jfn()
            float(out)
            best = min(best, time.perf_counter() - t0)
        return best / steps

    grid = decode_volume(spec, params, train_gates=False)  # (C,D,H,W)
    grid = jax.block_until_ready(grid)

    def t(name, fn):
        print(f"{name:34s}: {timeit(fn)*1e3:.3f} ms")

    t('empty body', lambda e: coords[:1, 0] + e)
    t('decode_volume (gated)',
      lambda e: decode_volume(spec, jax.tree.map(lambda x: x + e, params),
                              train_gates=True, rng=jax.random.key(1)).ravel())
    t('apply_model full fwd',
      lambda e: apply_model(spec, params, coords + e, train=True,
                            train_gates=True, rng=jax.random.key(1)).ravel())
    t('grid_sample pallas f32 fwd',
      lambda e: pallas_grid_sample_3d(grid, coords + e).ravel())
    t('grid_sample pallas bf16 fwd',
      lambda e: pallas_grid_sample_3d(grid, coords + e, precision='bf16').ravel())
    t('grid_sample xla fwd',
      lambda e: grid_sample_3d(grid, coords + e).ravel())

    def bwd(fn):
        def f(e):
            l, gr = jax.value_and_grad(lambda gg: jnp.sum(fn(gg, coords + e) ** 2))(grid)
            return gr.ravel() + l
        return f

    t('grid_sample pallas f32 fwd+bwd', bwd(lambda g, c: pallas_grid_sample_3d(g, c)))
    t('grid_sample pallas bf16 fwd+bwd',
      bwd(lambda g, c: pallas_grid_sample_3d(g, c, precision='bf16')))
    t('grid_sample xla fwd+bwd', bwd(lambda g, c: grid_sample_3d(g, c)))

    t('fourier embed', lambda e: fourier_embed(coords + e, spec.n_freqs).ravel())
    feats = pallas_grid_sample_3d(grid, coords)
    emb = fourier_embed(coords, spec.n_freqs)
    inp = jnp.concatenate([coords, emb, feats], axis=1)
    inp = jax.block_until_ready(inp)
    t('mlp fwd', lambda e: mlp_apply(list(params.mlp_w), list(params.mlp_b),
                                     inp + e).ravel())
    t('mlp fwd+bwd', lambda e: jax.grad(
        lambda pp: jnp.sum(mlp_apply(list(pp.mlp_w), list(pp.mlp_b),
                                     inp + e) ** 2))(params).mlp_w[0].ravel())

    t('randint threefry (N,3)', lambda e: jax.random.randint(
        jax.random.fold_in(jax.random.key(3), (e > 2).astype(jnp.int32)),
        (N, 3), 0, 255).astype(jnp.float32).ravel())
    t('normal (N,)', lambda e: jax.random.normal(
        jax.random.fold_in(jax.random.key(3), (e > 2).astype(jnp.int32)), (N,)))


if __name__ == '__main__':
    main()
