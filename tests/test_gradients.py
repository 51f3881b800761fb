"""Gradient parity vs torch autograd on the mirrored reference model.

BASELINE.json requires "reconstruction matches the reference's predicted
volume and voxel gradients to allclose".  Stochastic elements (position
sampling, gate noise) cannot match across RNGs, so gradients are compared on
fixed inputs with externally-injected noise — the strategy SURVEY.md §7
prescribes.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from latent_feature_grid_compression_tpu.models import (
    make_spec, init_model, apply_model)
from latent_feature_grid_compression_tpu.train.losses import (
    smallify_family_loss, grid_l2)
from tests.test_dwt import TorchOracle3d


def build_torch_model(spec, params):
    """Differentiable torch mirror with leaf tensors for every parameter."""
    coeffs = [torch.from_numpy(np.asarray(c)).clone().requires_grad_(True)
              for c in params.coeffs]
    ws = [torch.from_numpy(np.asarray(w)).clone().requires_grad_(True)
          for w in params.mlp_w]
    bs = [torch.from_numpy(np.asarray(b)).clone().requires_grad_(True)
          for b in params.mlp_b]
    betas = None
    if params.gates is not None:
        betas = [torch.from_numpy(np.asarray(b)).clone().requires_grad_(True)
                 for b in params.gates.betas]

    oracle = TorchOracle3d(spec.wavelet)

    def forward(coords):
        gated = coeffs
        if betas is not None:
            gated = [c * b.unsqueeze(0) for c, b in zip(coeffs, betas)]
        restored = gated[0].unsqueeze(0)
        for high, shape in zip(gated[1:], spec.level_shapes):
            data = torch.cat([restored.unsqueeze(2), high.unsqueeze(0)], dim=2)
            restored = oracle.decode(data, np.asarray(shape))
        grid = restored[0]
        inp = torch.from_numpy(coords)
        g = inp.view(1, 1, 1, -1, 3)
        feats = torch.nn.functional.grid_sample(
            grid.unsqueeze(0), g, mode='bilinear',
            align_corners=False).squeeze().transpose(0, 1)
        freq = (2.0 ** torch.linspace(0., spec.n_freqs - 1, spec.n_freqs)) * 2 * np.pi
        parts = []
        for fq in freq:
            parts.append(torch.sin(inp * fq))
            parts.append(torch.cos(inp * fq))
        x = torch.cat([inp, torch.cat(parts, -1), feats], -1)
        for w, b in zip(ws[:-1], bs[:-1]):
            x = x @ w + b
            x = 0.5 * x + torch.sin(x) ** 2
        return x @ ws[-1] + bs[-1]

    return forward, coeffs, ws, bs, betas


def test_dense_mse_gradients_match():
    spec = make_spec(grid_size=15, grid_features=4, hidden=16, num_layers=2)
    params, _ = init_model(jax.random.key(0), spec)
    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    gt = rng.standard_normal(128).astype(np.float32)

    def loss_jax(p):
        pred = apply_model(spec, p, jnp.asarray(coords), train=True)[:, 0]
        return jnp.mean((pred - jnp.asarray(gt)) ** 2)

    grads = jax.grad(loss_jax)(params)

    fwd, coeffs, ws, bs, _ = build_torch_model(spec, params)
    pred = fwd(coords)[:, 0]
    loss = torch.mean((pred - torch.from_numpy(gt)) ** 2)
    loss.backward()

    for gc, tc in zip(grads.coeffs, coeffs):
        np.testing.assert_allclose(np.asarray(gc), tc.grad.numpy(), atol=2e-5)
    for gw, tw in zip(grads.mlp_w, ws):
        np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=2e-5)
    for gb, tb in zip(grads.mlp_b, bs):
        np.testing.assert_allclose(np.asarray(gb), tb.grad.numpy(), atol=2e-5)


def test_smallify_loss_gradients_match():
    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2,
                     drop_type='smallify')
    params, _ = init_model(jax.random.key(1), spec)
    rng = np.random.default_rng(1)
    coords = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    gt = rng.standard_normal(64).astype(np.float32)
    w_l1, w_l2 = 1e-4, 1e-5

    def loss_jax(p):
        pred = apply_model(spec, p, jnp.asarray(coords), train=True,
                           train_gates=True)[:, 0]
        mse = jnp.mean((pred - jnp.asarray(gt)) ** 2)
        return mse + smallify_family_loss('smallify', p, w_l1, w_l2)

    grads = jax.grad(loss_jax)(params)

    fwd, coeffs, ws, bs, betas = build_torch_model(spec, params)
    pred = fwd(coords)[:, 0]
    loss = torch.mean((pred - torch.from_numpy(gt)) ** 2)
    loss = loss + w_l1 * sum(torch.abs(b).sum() for b in betas)
    loss = loss + w_l2 * sum(torch.sum(torch.abs(c) ** 2) for c in coeffs)
    loss.backward()

    for gb, tb in zip(grads.gates.betas, betas):
        np.testing.assert_allclose(np.asarray(gb), tb.grad.numpy(), atol=2e-5)
    for gc, tc in zip(grads.coeffs, coeffs):
        np.testing.assert_allclose(np.asarray(gc), tc.grad.numpy(), atol=2e-5)


def test_variational_noise_injected_gradients_match():
    """VD gate gradients with externally fixed noise xi."""
    from latent_feature_grid_compression_tpu.models import gates as G
    size = (3, 5, 5, 5)
    gp, _ = G.init_gates(jax.random.key(2), 'static_variational', [size], 0.025)
    rng = np.random.default_rng(2)
    coeff = rng.standard_normal(size).astype(np.float32)
    xi = rng.standard_normal(size[1:]).astype(np.float32)

    def out_jax(lt, lv):
        thetas = jnp.exp(lt)
        sigma = jnp.exp(lv / 2.0)
        w = thetas + sigma * jnp.asarray(xi)
        return jnp.sum((jnp.asarray(coeff) * w[None]) ** 2)

    lt0 = np.asarray(gp.log_thetas[0])
    lv0 = np.asarray(gp.log_var[0])
    g_lt, g_lv = jax.grad(out_jax, argnums=(0, 1))(jnp.asarray(lt0),
                                                   jnp.asarray(lv0))

    lt_t = torch.from_numpy(lt0).clone().requires_grad_(True)
    lv_t = torch.from_numpy(lv0).clone().requires_grad_(True)
    w_t = torch.exp(lt_t) + torch.exp(lv_t / 2.0) * torch.from_numpy(xi)
    (torch.sum((torch.from_numpy(coeff) * w_t.unsqueeze(0)) ** 2)).backward()

    np.testing.assert_allclose(np.asarray(g_lt), lt_t.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_lv), lv_t.grad.numpy(), atol=1e-4)
