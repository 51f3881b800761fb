"""Gate semantics vs torch oracles of the reference dropout layers."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from latent_feature_grid_compression_tpu.models import gates as G


def test_smallify_forward_and_l1():
    shapes = [(4, 3, 3, 3), (4, 7, 3, 3, 3)]
    gp, aux = G.init_gates(jax.random.key(0), 'smallify', shapes, 0.025)
    rng = np.random.default_rng(0)
    for lvl, s in enumerate(shapes):
        coeff = rng.standard_normal(s).astype(np.float32)
        out = G.apply_gate('smallify', gp, lvl, jnp.asarray(coeff), None, 0.75)
        expected = coeff * np.asarray(gp.betas[lvl])[None]
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)
    l1 = G.l1_penalty('smallify', gp)
    expected_l1 = sum(np.abs(np.asarray(b)).sum() for b in gp.betas)
    np.testing.assert_allclose(float(l1), expected_l1, rtol=1e-6)


def test_smallify_tracker_matches_torch_oracle():
    """EMA/EMAVar update vs the reference tracker (Smallify_Dropout.py:94-112)."""
    size = (5, 5, 5)
    gp, aux = G.init_gates(jax.random.key(1), 'smallify', [(2, *size)], 0.025)
    momentum = 0.025

    betas_t = torch.from_numpy(np.asarray(gp.betas[0]))
    ema_t = torch.sign(betas_t)
    var_t = torch.zeros(size)

    for step in range(20):
        # our update
        aux = G.smallify_update_tracker(aux, gp, momentum)
        # torch oracle update
        phi = torch.sign(betas_t) - ema_t
        ema_t = ema_t + momentum * phi
        var_t = (torch.ones(size) - momentum) * (var_t + momentum * phi ** 2)
        # flip some betas to exercise the variance
        flip = torch.from_numpy(
            np.random.default_rng(step).uniform(size=size) < 0.1)
        betas_t[flip] *= -1.0
        gp = gp.replace(betas=(jnp.asarray(betas_t.numpy()),))

    np.testing.assert_allclose(np.asarray(aux.ema[0]), ema_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux.ema_var[0]), var_t.numpy(), atol=1e-6)
    # pruning mask: EMAVar < threshold
    mask = G.pruning_masks('smallify', gp, aux, [0.05])[0]
    np.testing.assert_array_equal(np.asarray(mask),
                                  (var_t.numpy() < 0.05).astype(np.float32))


def test_masked_st_forward_matches_torch():
    """(x*(m>=t) - x*m).detach() + x*m (Straight_Through_Dropout.py:53-61)."""
    size = (3, 4, 4, 4)
    gp, _ = G.init_gates(jax.random.key(2), 'masked_straight_through',
                         [size], 0.5)
    mv = np.random.default_rng(4).standard_normal(size[1:]).astype(np.float32)
    gp = gp.replace(mask_values=(jnp.asarray(mv),))
    coeff = np.random.default_rng(5).standard_normal(size).astype(np.float32)
    thr = 0.5

    out = G.apply_gate('masked_straight_through', gp, 0, jnp.asarray(coeff),
                       None, thr)
    x = torch.from_numpy(coeff)
    m = torch.sigmoid(torch.from_numpy(mv)).unsqueeze(0)
    expected = (x * (m >= thr) - x * m).detach() + x * m
    np.testing.assert_allclose(np.asarray(out), expected.numpy(), atol=1e-6)

    # gradient wrt mask_values flows through the soft path only
    def f(mvj):
        g = gp.replace(mask_values=(mvj,))
        return jnp.sum(G.apply_gate('masked_straight_through', g, 0,
                                    jnp.asarray(coeff), None, thr))
    grad = jax.grad(f)(jnp.asarray(mv))
    mt = torch.from_numpy(mv).requires_grad_(True)
    m2 = torch.sigmoid(mt).unsqueeze(0)
    ((x * (m2 >= thr) - x * m2).detach() + x * m2).sum().backward()
    np.testing.assert_allclose(np.asarray(grad), mt.grad.numpy(), atol=1e-5)


def test_variational_forward_stats_and_dkl():
    size = (2, 6, 6, 6)
    init_p = 0.025
    gp, _ = G.init_gates(jax.random.key(3), 'static_variational', [size], init_p)
    # log_var init = log(p/(1-p)) (Variational_Dropout_Layer.py:83-85)
    expected_lv = np.log(init_p / (1 - init_p))
    np.testing.assert_allclose(np.asarray(gp.log_var[0]),
                               np.full(size[1:], expected_lv), atol=1e-6)

    # DKL vs torch oracle
    lt = np.random.default_rng(6).standard_normal(size[1:]).astype(np.float32) * 0.1
    lv = np.random.default_rng(7).standard_normal(size[1:]).astype(np.float32) * 0.1
    gp = gp.replace(log_thetas=(jnp.asarray(lt),), log_var=(jnp.asarray(lv),))
    k1, k2, k3 = 0.63576, 1.87320, 1.48695
    la = torch.from_numpy(lv) - 2.0 * torch.from_numpy(lt)
    dkl_t = (-k1 * torch.sigmoid(k2 + k3 * la)
             + 0.5 * torch.nn.functional.softplus(-la) + k1).sum()
    np.testing.assert_allclose(float(G.variational_dkl(gp)), float(dkl_t),
                               rtol=1e-5)

    # forward: mean == x*theta, std == x*sigma over noise draws
    coeff = np.ones(size, dtype=np.float32)
    outs = np.stack([np.asarray(G.apply_gate('static_variational', gp, 0,
                                             jnp.asarray(coeff),
                                             jax.random.key(i), 0.9))
                     for i in range(1000)])
    # noise model: mean x*theta, std x*sigma; compare in aggregate
    # (per-element max is max over ~432 sample means, too noisy to bound tightly)
    assert np.abs(outs.mean(0) - np.exp(lt)[None]).mean() < 0.05
    assert np.abs(outs.std(0) - np.exp(lv / 2)[None]).mean() < 0.05


def test_variational_pruning_keeps_one_element():
    size = (1, 2, 2, 2)
    gp, _ = G.init_gates(jax.random.key(4), 'static_variational', [size], 0.5)
    # force all dropout rates above threshold -> everything pruned
    gp = gp.replace(log_thetas=(jnp.full(size[1:], -10.0),),
                    log_var=(jnp.full(size[1:], 5.0),))
    mask = G.pruning_masks('static_variational', gp, None, [0.9])[0]
    assert int(np.asarray(mask).sum()) == 1  # >= 1 kept (VD layer:142-143)


def test_bake_values_smallify():
    size = (2, 3, 3, 3)
    gp, aux = G.init_gates(jax.random.key(5), 'smallify', [size], 0.025)
    # high variance in half the entries -> pruned there
    var = np.zeros(size[1:], dtype=np.float32)
    var[:2] = 10.0
    aux = aux.replace(ema_var=(jnp.asarray(var),))
    coeff = np.random.default_rng(8).standard_normal(size).astype(np.float32)
    baked = G.bake_values('smallify', gp, aux, [jnp.asarray(coeff)], [0.75])[0]
    mask = (var < 0.75).astype(np.float32)
    expected = coeff * (mask * np.asarray(gp.betas[0]))[None]
    np.testing.assert_allclose(np.asarray(baked), expected, rtol=1e-5)
    assert np.count_nonzero(np.asarray(baked)) == np.count_nonzero(expected)


def test_gate_size_all_types():
    shapes = [(4, 3, 3, 3), (4, 7, 3, 3, 3)]
    n = 27 + 7 * 27
    for dt in ['smallify', 'straight_through', 'masked_straight_through',
               'static_variational']:
        gp, _ = G.init_gates(jax.random.key(0), dt, shapes, 0.1)
        assert G.gate_size(dt, gp) == n
