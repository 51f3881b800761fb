"""Bisect the train-step cost on the real chip: time the full step, then
variants with pieces ablated, to rank bottlenecks for round-2 perf work."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from latent_feature_grid_compression_tpu.config import TrainConfig
    from latent_feature_grid_compression_tpu.data.volume import VolumeMeta
    from latent_feature_grid_compression_tpu.models import make_spec, init_model, apply_model
    from latent_feature_grid_compression_tpu.models import gates as G
    from latent_feature_grid_compression_tpu.ops.interpolation import gather_volume
    from latent_feature_grid_compression_tpu.train.trainer import (
        make_phase_spec, init_train_state, make_chunk_runner)

    n = 255
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)).astype(np.float32)
    meta = VolumeMeta(vol.shape)
    volume = jnp.asarray(vol)

    cfg = TrainConfig(drop_type='smallify', batch_size=2048, sample_size=16,
                      grid_size=15, grid_features=16, n_hidden_size=32,
                      n_layers=4, lr=0.008, max_pass=60)
    spec = make_spec(grid_size=cfg.grid_size, grid_features=cfg.grid_features,
                     hidden=cfg.n_hidden_size, num_layers=cfg.n_layers,
                     drop_type=cfg.drop_type, drop_momentum=cfg.drop_momentum,
                     drop_threshold=cfg.drop_threshold,
                     interp_backend=cfg.interp_backend)
    ph = make_phase_spec(cfg, spec, meta, phase=1)
    params, aux = init_model(jax.random.key(0), spec)
    state = init_train_state(params, None, aux, cfg.lr, cfg.lr,
                             jax.random.key(1), cfg.lambda_drop_loss)

    steps = 100
    run = make_chunk_runner(ph, None, steps)

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        _sync(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    def _sync(out):
        leaves = jax.tree_util.tree_leaves(out)
        for l in leaves[::-1]:
            if hasattr(l, 'dtype'):
                np.asarray(jax.device_get(l.ravel()[0] if l.ndim else l))
                return

    full = timeit(run, state, volume) / steps
    print(f"full step: {full*1e3:.3f} ms  ({2048*16/full/1e6:.1f} Msamples/s)")

    N = ph.batch_n
    res = np.asarray(meta.resolution, np.int32)
    max_idx = (res - 1).astype(np.float32)
    scales = max_idx / max_idx.max()

    # --- isolated pieces, scan-amortized -------------------------------------
    def piece(fn):
        @jax.jit
        def chunk(key, volume):
            def body(k, _):
                k, sub = jax.random.split(k)
                out = fn(sub, volume)
                s = jnp.sum(out) * 1e-20
                k = jax.random.fold_in(k, (s == 1234.5).astype(jnp.int32))
                return k, None
            k, _ = jax.lax.scan(body, key, None, length=steps)
            return jax.random.key_data(k)
        return chunk

    def sample_only(k, volume):
        pos = jax.random.randint(k, (N, 3), 0, res[None, :])
        return pos.astype(jnp.float32)

    def sample_gt(k, volume):
        pos = jax.random.randint(k, (N, 3), 0, res[None, :])
        return gather_volume(volume, pos)

    def fwd_only(k, volume):
        pos = jax.random.randint(k, (N, 3), 0, res[None, :])
        norm = (pos.astype(jnp.float32) / max_idx[None]) * 2.0 - 1.0
        norm = norm * scales[None]
        return apply_model(spec, params, norm, train=True, train_gates=True,
                           rng=k)

    def fwd_bwd(k, volume):
        pos = jax.random.randint(k, (N, 3), 0, res[None, :])
        norm = (pos.astype(jnp.float32) / max_idx[None]) * 2.0 - 1.0
        norm = norm * scales[None]
        gt = gather_volume(volume, pos)

        def loss_fn(p):
            pred = apply_model(spec, p, norm, train=True, train_gates=True,
                               rng=k)[:, 0]
            return jnp.mean((pred - gt) ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        flat, _ = jax.flatten_util.ravel_pytree(g)
        return flat

    key = jax.random.key(7)
    for name, fn in [('sample only', sample_only),
                     ('sample+GT gather', sample_gt),
                     ('sample+forward', fwd_only),
                     ('sample+GT+fwd+bwd', fwd_bwd)]:
        t = timeit(piece(fn), key, volume) / steps
        print(f"{name:22s}: {t*1e3:.3f} ms")


if __name__ == '__main__':
    main()
