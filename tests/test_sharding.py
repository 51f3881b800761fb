"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates: mesh construction, replicated-state consistency, and — the key
property — that the data-parallel/space-sharded step optimizes the same
objective as the single-device step (losses decrease, updates stay in sync).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from latent_feature_grid_compression_tpu.config import TrainConfig
from latent_feature_grid_compression_tpu.data.volume import VolumeMeta
from latent_feature_grid_compression_tpu.models import make_spec, init_model
from latent_feature_grid_compression_tpu.train.trainer import (
    make_phase_spec, init_train_state)
from latent_feature_grid_compression_tpu.parallel import (
    make_mesh, solve_phase_sharded, make_sharded_chunk_runner, replicate,
    shard_volume)


def synthetic_volume(n=16):
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    return (np.sin(3 * x) * np.cos(2 * y) * np.sin(2 * z)).astype(np.float32)


def setup(n=16, drop_type='', **cfg_kw):
    vol = synthetic_volume(n)
    meta = VolumeMeta(vol.shape)
    cfg = TrainConfig(drop_type=drop_type, max_pass=4, batch_size=64,
                      sample_size=8, grid_size=8, grid_features=4,
                      n_hidden_size=16, n_layers=2, lr=0.01, **cfg_kw)
    spec = make_spec(grid_size=cfg.grid_size, grid_features=cfg.grid_features,
                     hidden=cfg.n_hidden_size, num_layers=cfg.n_layers,
                     drop_type=drop_type)
    ph = make_phase_spec(cfg, spec, meta, phase=1)
    params, aux = init_model(jax.random.key(0), spec)
    state = init_train_state(params, None, aux, cfg.lr, cfg.lr,
                             jax.random.key(1), cfg.lambda_drop_loss)
    return vol, ph, state


def test_mesh_shapes():
    mesh = make_mesh(data=4, space=2)
    assert mesh.shape == {'data': 4, 'space': 2}
    mesh2 = make_mesh(space=2)  # data inferred: 8 devices / 2
    assert mesh2.shape == {'data': 4, 'space': 2}


@pytest.mark.parametrize('data,space', [(8, 1), (4, 2), (2, 4)])
def test_sharded_training_decreases_loss(data, space):
    vol, ph, state = setup()
    mesh = make_mesh(data=data, space=space)
    run = make_sharded_chunk_runner(mesh, ph, None, 60)
    state = replicate(mesh, state)
    v = shard_volume(mesh, jnp.asarray(vol))
    state, metrics = run(state, v)
    losses = np.asarray(metrics['loss'])
    assert losses[-1] < losses[0] * 0.7, losses[[0, -1]]
    assert np.isfinite(losses).all()


def test_sharded_step_matches_single_device_objective():
    """Same key, same init: the DP step (space=1) computes the global batch in
    shards; gradients are pmean'd, so parameters after K steps track the
    single-device run closely (not bitwise: different position draws)."""
    vol, ph, state = setup()
    mesh = make_mesh(data=8, space=1)
    run = make_sharded_chunk_runner(mesh, ph, None, 40, use_space=False)
    s_sharded, m_sharded = run(replicate(mesh, state),
                               shard_volume(mesh, jnp.asarray(vol), False))

    from latent_feature_grid_compression_tpu.train.trainer import make_chunk_runner
    _, _, state2 = setup()   # fresh state (same seeds); the first was donated
    run1 = make_chunk_runner(ph, None, 40)
    s_single, m_single = run1(state2, jnp.asarray(vol))

    # both converge to comparable losses on the same objective
    l_sh = float(np.mean(np.asarray(m_sharded['loss'])[-5:]))
    l_si = float(np.mean(np.asarray(m_single['loss'])[-5:]))
    assert abs(l_sh - l_si) / max(l_si, 1e-9) < 0.5, (l_sh, l_si)


@pytest.mark.parametrize('drop_type', ['', 'smallify'])
def test_dp_step_exactly_matches_single_device(drop_type):
    """EXACT data-parallel equivalence (VERDICT r3 #6): feed the identical
    global position stream to the sharded (data=8) and single-device step
    runners.  pmean of per-shard mean-gradients == the global mean gradient,
    so parameters must agree to f32 reduction-order noise — a wrong pmean or
    data_scale cannot pass this."""
    from latent_feature_grid_compression_tpu.train.trainer import (
        _make_step_parts)
    from latent_feature_grid_compression_tpu.parallel.mesh import make_shard_ctx
    from jax.flatten_util import ravel_pytree

    kw = dict(lambda_drop_loss=1e-5) if drop_type else {}
    vol, ph, state = setup(drop_type=drop_type, **kw)
    volume = jnp.asarray(vol)
    K = 40
    res = np.asarray(ph.resolution, np.int32)
    pos_all = jax.random.randint(jax.random.key(7), (K, ph.batch_n, 3), 0,
                                 res[None, None, :])
    gate_keys = jax.random.split(jax.random.key(8), K)

    # --- single device ----------------------------------------------------
    _, step_fn, _ = _make_step_parts(ph, None, None)

    @jax.jit
    def run_single(s):
        def body(s, xs):
            pos, kg = xs
            return step_fn(s, volume, pos, kg)
        return jax.lax.scan(body, s, (pos_all, gate_keys))

    s_single, m_single = run_single(state)

    # --- sharded: the SAME stream, N axis split over 'data' ---------------
    mesh = make_mesh(data=8, space=1)
    sc = make_shard_ctx(mesh, use_space=False)
    _, step_fn_sh, _ = _make_step_parts(ph, None, sc)

    def chunk(s, v, pos, kg):
        def body(s, xs):
            p, k = xs
            return step_fn_sh(s, v, p, k)
        return jax.lax.scan(body, s, (pos, kg))

    from jax import shard_map
    sharded = jax.jit(jax.shard_map(
        chunk, mesh=mesh,
        in_specs=(P(), P(), P(None, 'data', None), P()),
        out_specs=(P(), P()),
        check_vma=False))
    _, _, state2 = setup(drop_type=drop_type, **kw)
    s_sh, m_sh = sharded(replicate(mesh, state2),
                         shard_volume(mesh, volume, False),
                         pos_all, gate_keys)

    # step-1 loss: exact up to f32 reduction order
    np.testing.assert_allclose(np.asarray(m_sh['loss'])[0],
                               np.asarray(m_single['loss'])[0],
                               rtol=1e-6, atol=1e-7)
    # parameters after K steps: tight agreement (divergence only from f32
    # non-associativity of the 8-shard mean vs the global mean)
    f_single, _ = ravel_pytree((s_single.params, s_single.var_params))
    f_sh, _ = ravel_pytree((s_sh.params, s_sh.var_params))
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_single),
                               rtol=2e-4, atol=2e-5)
    if drop_type == 'smallify':
        np.testing.assert_allclose(
            np.asarray(jax.device_get(s_sh.gate_aux.ema_var[0])),
            np.asarray(jax.device_get(s_single.gate_aux.ema_var[0])),
            rtol=1e-4, atol=1e-6)


def test_sharded_smallify_gate_state_in_sync():
    vol, ph, state = setup(drop_type='smallify', lambda_drop_loss=1e-6)
    mesh = make_mesh(data=4, space=2)
    run = make_sharded_chunk_runner(mesh, ph, None, 30)
    state, _ = run(replicate(mesh, state), shard_volume(mesh, jnp.asarray(vol)))
    # replicated aux state must be identical on every device
    ema0 = state.gate_aux.ema_var[0]
    shards = [np.asarray(s.data) for s in ema0.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    assert float(jnp.max(ema0)) > 0.0  # tracker actually moved


class TestZeroShardedModelState:
    """Grid-tile/ZeRO sharding of model+optimizer state over 'space'
    (VERDICT r4 #3, SURVEY §2.3/§7 north star)."""

    def test_state_is_actually_sharded(self):
        from latent_feature_grid_compression_tpu.parallel import (
            shard_train_state)
        vol, ph, state = setup()
        mesh = make_mesh(data=4, space=2)
        zstate, zc = shard_train_state(mesh, state)
        n_pad = -(-zc.n_params // 2) * 2
        assert zstate.params.shape == (n_pad,)
        # each device holds only its 1/space slice of params and moments
        for arr in (zstate.params, zstate.m, zstate.v):
            for s in arr.addressable_shards:
                assert s.data.shape == (n_pad // 2,)

    def test_roundtrip_is_identity(self):
        from latent_feature_grid_compression_tpu.parallel import (
            shard_train_state, unshard_train_state)
        from jax.flatten_util import ravel_pytree
        vol, ph, state = setup(drop_type='smallify')
        mesh = make_mesh(data=2, space=4)
        zstate, zc = shard_train_state(mesh, state)
        back = unshard_train_state(zstate, zc)
        f0, _ = ravel_pytree((state.params, state.var_params))
        f1, _ = ravel_pytree((back.params, back.var_params))
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))

    @pytest.mark.parametrize('drop_type', ['', 'smallify'])
    def test_exactly_matches_replicated_path(self, drop_type):
        """Same global position/gate stream through the replicated-state and
        ZeRO-sharded-state steps: final params must agree to f32
        reduction-order noise (all_gather+reduce_scatter == all-reduce).
        Mirrors test_dp_step_exactly_matches_single_device."""
        from latent_feature_grid_compression_tpu.train.trainer import (
            _make_step_parts)
        from latent_feature_grid_compression_tpu.parallel import (
            shard_train_state, unshard_train_state)
        from latent_feature_grid_compression_tpu.parallel.mesh import (
            make_shard_ctx)
        from jax.flatten_util import ravel_pytree

        kw = dict(lambda_drop_loss=1e-5) if drop_type else {}
        vol, ph, state = setup(drop_type=drop_type, **kw)
        volume = jnp.asarray(vol)
        K = 40
        res = np.asarray(ph.resolution, np.int32)
        pos_all = jax.random.randint(jax.random.key(7), (K, ph.batch_n, 3), 0,
                                     res[None, None, :])
        gate_keys = jax.random.split(jax.random.key(8), K)
        mesh = make_mesh(data=4, space=2)
        sc = make_shard_ctx(mesh, use_space=False)

        def make_runner(zc):
            _, step_fn, _ = _make_step_parts(ph, None, sc, zc)

            def chunk(s, v, pos, kg):
                def body(s, xs):
                    p, k = xs
                    return step_fn(s, v, p, k)
                return jax.lax.scan(body, s, (pos, kg))

            # per-leaf spec: flat params/m/v sharded, the rest replicated
            if zc:
                sspec = type(state)(
                    params=P(zc.axis), var_params=P(), m=P(zc.axis),
                    v=P(zc.axis), step=P(), lr=P(), shadow_lr=P(),
                    last_loss=P(), no_gain=P(), stop=P(), weight_dkl=P(),
                    gate_aux=P(), key=P())
            else:
                sspec = P()
            return jax.jit(jax.shard_map(
                chunk, mesh=mesh,
                in_specs=(sspec, P(), P(None, ('data', 'space'), None), P()),
                out_specs=(sspec, P()),
                check_vma=False))

        # replicated-state reference
        s_rep, m_rep = make_runner(None)(
            replicate(mesh, state), shard_volume(mesh, volume, False),
            pos_all, gate_keys)

        # ZeRO-sharded state, identical stream
        _, _, state2 = setup(drop_type=drop_type, **kw)
        zstate, zc = shard_train_state(mesh, state2)
        zs, m_z = make_runner(zc)(zstate, shard_volume(mesh, volume, False),
                                  pos_all, gate_keys)
        s_zero = unshard_train_state(zs, zc)

        np.testing.assert_allclose(np.asarray(m_z['loss']),
                                   np.asarray(m_rep['loss']),
                                   rtol=1e-5, atol=1e-6)
        f_rep, _ = ravel_pytree((s_rep.params, s_rep.var_params))
        f_zero, _ = ravel_pytree((s_zero.params, s_zero.var_params))
        np.testing.assert_allclose(np.asarray(f_zero), np.asarray(f_rep),
                                   rtol=2e-4, atol=2e-5)
        if drop_type == 'smallify':
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(zs.gate_aux.ema_var[0])),
                np.asarray(jax.device_get(s_rep.gate_aux.ema_var[0])))

    def test_full_product_path_with_sharded_state(self):
        """training() end-to-end with mesh_shard_params=1 (both phases, bake,
        prune, eval) on the virtual mesh."""
        import tempfile, os
        from latent_feature_grid_compression_tpu.config import TrainConfig
        from latent_feature_grid_compression_tpu.train import training
        vol = synthetic_volume(16)
        with tempfile.TemporaryDirectory() as tmp:
            cwd = os.getcwd()
            os.chdir(tmp)
            try:
                cfg = TrainConfig(expname='zero', drop_type='smallify',
                                  max_pass=3, batch_size=64, sample_size=8,
                                  grid_size=8, grid_features=4,
                                  n_hidden_size=16, n_layers=2, lr=0.01,
                                  steps_per_chunk=8, mesh_data=4,
                                  mesh_space=2, mesh_shard_params=1)
                info = training(cfg, verbose=False, volume_np=vol,
                                write_vols=False)
            finally:
                os.chdir(cwd)
        assert np.isfinite(info['psnr'])
        assert info['psnr'] > 10.0, info


def test_variational_sharded_runs():
    vol, ph, state = setup(drop_type='static_variational',
                           variational_sigma=-3.2)
    mesh = make_mesh(data=2, space=4)
    run = make_sharded_chunk_runner(mesh, ph, None, 20)
    state, metrics = run(replicate(mesh, state),
                         shard_volume(mesh, jnp.asarray(vol)))
    assert np.isfinite(np.asarray(metrics['loss'])).all()
    assert float(state.weight_dkl) > 0.0


class TestLocalDecode:
    """Grid-tile-local decode (mesh_local_decode): each device decodes only
    the grid x-window covering its volume slab + interpolation halo, via a
    column slice of the final-level synthesis operator."""

    def test_apply_model_window_matches_full(self):
        """apply_model(x_window) == apply_model(full) for coords whose
        interpolation support lies inside the window."""
        from latent_feature_grid_compression_tpu.models import (
            make_spec, init_model)
        from latent_feature_grid_compression_tpu.models.feature_grid import (
            apply_model)
        spec = make_spec(grid_size=15, grid_features=8, hidden=16,
                         num_layers=2, interp_backend='xla')
        params, _ = init_model(jax.random.key(0), spec)
        # coords with x in the left half of [-1, 1] -> pixel x in [~-0.5, 7]
        rng = np.random.default_rng(0)
        c = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
        c[:, 0] = rng.uniform(-1.0, 0.0, 512)
        c = jnp.asarray(c)
        full = apply_model(spec, params, c, train=True)
        win = apply_model(spec, params, c, train=True, x_window=(0, 9))
        np.testing.assert_allclose(np.asarray(win), np.asarray(full),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize('shard_params', [False, True])
    def test_sharded_training_with_local_decode_matches(self, shard_params):
        """Space-sharded training with local_decode on/off: identical RNG
        streams -> loss trajectories must agree to f32 noise (the windowed
        decode computes the same math)."""
        from latent_feature_grid_compression_tpu.parallel import (
            make_sharded_chunk_runner, make_zero_sharded_chunk_runner,
            shard_train_state)
        vol, ph, state = setup(n=16)
        mesh = make_mesh(data=4, space=2)
        v = shard_volume(mesh, jnp.asarray(vol))

        def run_with(local_decode, st):
            if shard_params:
                zst, zc = shard_train_state(mesh, st)
                run = make_zero_sharded_chunk_runner(
                    mesh, ph, None, 30, zc, True, local_decode)
                return run(zst, v)
            run = make_sharded_chunk_runner(mesh, ph, None, 30, True,
                                            local_decode)
            return run(replicate(mesh, st), v)

        _, m_full = run_with(False, state)
        _, _, state2 = setup(n=16)
        _, m_loc = run_with(True, state2)
        np.testing.assert_allclose(np.asarray(m_loc['loss']),
                                   np.asarray(m_full['loss']),
                                   rtol=5e-4, atol=1e-6)


def test_comm_volume_accounting():
    """ZeRO mode must not exceed replicated-mode traffic at equal mesh, and
    pure-space ZeRO must equal the replicated all-reduce volume exactly
    (all_gather + reduce_scatter == all-reduce)."""
    from latent_feature_grid_compression_tpu.parallel.mesh import (
        comm_volume_per_step)
    P = 113521
    rep = comm_volume_per_step(P, data=1, space=8)
    zero = comm_volume_per_step(P, data=1, space=8, shard_params=True)
    assert zero['total_per_device'] == pytest.approx(rep['total_per_device'])
    rep2 = comm_volume_per_step(P, data=4, space=2)
    zero2 = comm_volume_per_step(P, data=4, space=2, shard_params=True)
    assert zero2['total_per_device'] <= rep2['total_per_device'] * 1.01
    assert comm_volume_per_step(P, 1, 1)['total_per_device'] == 0.0
