"""TrainState checkpoint/resume: bit-exact continuation."""

import numpy as np
import jax
import jax.numpy as jnp

from latent_feature_grid_compression_tpu.config import TrainConfig
from latent_feature_grid_compression_tpu.data.volume import VolumeMeta
from latent_feature_grid_compression_tpu.models import make_spec, init_model
from latent_feature_grid_compression_tpu.train.trainer import (
    make_phase_spec, init_train_state, make_chunk_runner)
from latent_feature_grid_compression_tpu.io.train_state_io import (
    save_train_state, load_train_state)


def test_resume_is_bit_exact(tmp_path):
    n = 16
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = jnp.asarray((np.sin(3 * x) * np.cos(2 * y)).astype(np.float32))
    meta = VolumeMeta((n, n, n))
    cfg = TrainConfig(drop_type='smallify', max_pass=50, batch_size=64,
                      sample_size=8, grid_size=8, grid_features=4,
                      n_hidden_size=16, n_layers=2, lr=0.01)
    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2,
                     drop_type='smallify')
    ph = make_phase_spec(cfg, spec, meta, phase=1)
    params, aux = init_model(jax.random.key(0), spec)
    state = init_train_state(params, None, aux, cfg.lr, cfg.lr,
                             jax.random.key(1), 1e-8)

    run = make_chunk_runner(ph, None, 20)
    state, _ = run(state, vol)

    path = str(tmp_path / 'trainstate.npz')
    save_train_state(path, state)

    # continue directly
    cont_a, ma = run(state, vol)

    # reload and continue
    template = init_train_state(params, None, aux, cfg.lr, cfg.lr,
                                jax.random.key(1), 1e-8)
    restored = load_train_state(path, template)
    assert int(restored.step) == int(state.step)
    cont_b, mb = run(restored, vol)

    for a, b in zip(jax.tree.leaves(cont_a.params), jax.tree.leaves(cont_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ma['loss']), np.asarray(mb['loss']))
