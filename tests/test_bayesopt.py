"""GP + expected-hypervolume-improvement generation (nas/bayesopt.py)."""

import math

import numpy as np
import pytest

from latent_feature_grid_compression_tpu.nas.bayesopt import (
    GP, GPEHVIGenerator, SpaceNormalizer, _front_mask, _hv2, mc_ehvi)
from latent_feature_grid_compression_tpu.nas.search import (
    SMALLIFY_SPACE, MultiObjectiveSearch, Trial)


def test_normalizer_roundtrip():
    norm = SpaceNormalizer(SMALLIFY_SPACE)
    params = {'lambda_drop_loss': 1e-5, 'lambda_weight_loss': 1e-8,
              'drop_threshold': 0.8, 'drop_momentum': 0.02,
              'n_hidden_size': 16, 'grid_size': 24, 'grid_features': 12}
    x = norm.encode(params)
    assert (x >= 0).all() and (x <= 1).all()
    back = norm.decode(x)
    for k, v in params.items():
        assert back[k] == pytest.approx(v, rel=1e-6)


def test_gp_interpolates_smooth_function():
    rng = np.random.default_rng(0)
    X = rng.random((20, 2))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2
    gp = GP(X, y)
    mu, var = gp.posterior(X)
    assert np.abs(mu - y).max() < 0.2
    # away from data the variance grows
    far = np.array([[5.0, 5.0]])
    _, var_far = gp.posterior(far)
    assert var_far[0] > var.mean()


def test_hv2_and_front_mask():
    pts = np.array([[2.0, 3.0], [3.0, 1.0], [1.0, 1.0]])
    assert _hv2(pts, np.array([0.0, 0.0])) == pytest.approx(7.0)
    mask = _front_mask(pts)
    assert mask.tolist() == [True, True, False]


def test_ehvi_prefers_gap_filling_candidate():
    front = np.array([[1.0, 4.0], [4.0, 1.0]])
    ref = np.array([0.0, 0.0])
    # candidate A fills the (ratio, psnr) gap; B is dominated
    mu = np.array([[3.0, 3.0], [0.5, 0.5]])
    var = np.full((2, 2), 1e-6)
    rng = np.random.default_rng(0)
    scores = mc_ehvi(mu, var, front, ref, rng, n_samples=16)
    assert scores[0] > scores[1]
    assert scores[0] == pytest.approx(4.0, rel=0.05)  # exact HVI of (3,3)


def _synthetic_objective(params):
    """Smooth 2-objective tradeoff: higher drop lambda -> more compression,
    less psnr; grid size helps psnr, hurts compression."""
    lam = math.log10(params['lambda_drop_loss'])   # [-10, -2]
    g = params['grid_size']                        # [4, 32]
    ratio = 10 ** (2.0 + (lam + 10) / 8.0 - g / 64.0)          # ~1e2..1e3
    psnr = 30.0 + g / 4.0 - (lam + 10) * 1.2 + 8.0
    return (ratio, psnr)


def test_generator_suggests_in_bounds_and_improves():
    gen = GPEHVIGenerator(SMALLIFY_SPACE, seed=0)
    rng = np.random.default_rng(1)
    observed = []
    import random as _random
    r = _random.Random(2)
    for _ in range(8):
        p = {s.name: s.sample(r) for s in SMALLIFY_SPACE}
        observed.append((p, _synthetic_objective(p)))
    for _ in range(6):
        p = gen.suggest(observed)
        for s in SMALLIFY_SPACE:
            assert s.low <= p[s.name] <= s.high
            if s.integer:
                assert float(p[s.name]) == int(p[s.name])
        observed.append((p, _synthetic_objective(p)))
    # hypervolume after BO steps >= after random-only start
    def hv(obs):
        Y = np.array([[math.log(o[0]), o[1]] for _, o in obs])
        return _hv2(Y, Y.min(0) - 1.0)
    assert hv(observed) >= hv(observed[:8])


def test_search_uses_gp_after_exploration():
    s = MultiObjectiveSearch(SMALLIFY_SPACE, total_trials=8, seed=3,
                             generation_strategy='gp_ehvi')
    assert s._gen is not None
    # feed completed trials so the exploit branch runs the GP path
    import random as _random
    r = _random.Random(4)
    for i in range(6):
        p = {spec.name: spec.sample(r) for spec in SMALLIFY_SPACE}
        t = Trial(i, p, expname=f't{i}')
        t.metrics = dict(zip(('compression_ratio', 'psnr'),
                             _synthetic_objective(p)))
        s.report(t)
    p = s.suggest(7)
    for spec in SMALLIFY_SPACE:
        assert spec.low <= p[spec.name] <= spec.high


def test_search_rejects_unknown_strategy():
    with pytest.raises(ValueError):
        MultiObjectiveSearch(SMALLIFY_SPACE, generation_strategy='nope')
