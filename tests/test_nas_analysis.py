"""NAS search loop, Pareto tooling, curve fitting, quantization study, plots."""

import os

import numpy as np
import pytest
import jax

from latent_feature_grid_compression_tpu.nas import (
    run_search, pareto_front, hypervolume_2d, MultiObjectiveSearch,
    SMALLIFY_SPACE)
from latent_feature_grid_compression_tpu.config import write_dict
from latent_feature_grid_compression_tpu.utils.analysis import (
    pareto_frontier, fit_log_linear, param_for_target_ratio,
    targets_from_frontier, collect_experiments)


def test_pareto_front_maximization():
    pts = [(1, 5), (2, 4), (3, 3), (2.5, 4.5), (0.5, 6)]
    front = pareto_front(pts)
    sel = sorted(pts[i] for i in front)
    assert sel == [(0.5, 6), (1, 5), (2.5, 4.5), (3, 3)]  # (2,4) dominated


def test_hypervolume():
    assert hypervolume_2d([(2, 3)]) == pytest.approx(6.0)
    assert hypervolume_2d([(2, 3), (3, 1)]) == pytest.approx(6.0 + 1.0)
    assert hypervolume_2d([(2, 3), (1, 1)]) == pytest.approx(6.0)


def test_search_suggest_respects_bounds():
    s = MultiObjectiveSearch(SMALLIFY_SPACE, total_trials=10, seed=1)
    for i in range(10):
        p = s.suggest(i)
        for spec in SMALLIFY_SPACE:
            assert spec.low <= p[spec.name] <= spec.high
            if spec.integer:
                assert p[spec.name] == int(p[spec.name])


def test_run_search_dry(tmp_path, monkeypatch):
    """Full NAS loop with a fake trainer writing plausible info.txt files."""
    monkeypatch.chdir(tmp_path)
    cfg_file = tmp_path / 'base.txt'
    write_dict({'data': 'x.npy', 'max_pass': 5}, 'base.txt', str(tmp_path))

    rng = np.random.default_rng(0)

    def fake_trainer(cmd, expdir):
        os.makedirs(expdir, exist_ok=True)
        # compression driven by lambda_drop_loss (plausible monotone response)
        lam = float(cmd[cmd.index('--lambda_drop_loss') + 1])
        ratio = 10.0 * (lam / 1e-8) ** 0.25 * rng.uniform(0.8, 1.2)
        psnr = 45.0 - 3.0 * np.log10(max(ratio, 1.0)) + rng.uniform(-1, 1)
        write_dict({'compression_ratio': ratio, 'psnr': psnr,
                    'rmse': 10 ** (-psnr / 20)}, 'info.txt', expdir)

    trials = run_search(str(cfg_file), drop_type='smallify', total_trials=8,
                        parallelism=3, basedir='/nas_out/', seed=0,
                        dry_run_cmd=fake_trainer)
    done = [t for t in trials if t.metrics]
    assert len(done) == 8
    assert all('compression_ratio' in t.metrics for t in done)


def test_curve_fitting_and_targets(tmp_path):
    # synthesize runs obeying ratio = exp(0.5*log(lam) + 12)
    for i, lam in enumerate([1e-8, 1e-7, 1e-6, 1e-5]):
        d = tmp_path / f'run_{i}'
        d.mkdir()
        ratio = np.exp(0.5 * np.log(lam) + 12)
        write_dict({'lambda_drop_loss': lam}, 'config.txt', str(d))
        write_dict({'compression_ratio': float(ratio), 'psnr': 40.0},
                   'info.txt', str(d))
    runs = collect_experiments(str(tmp_path))
    assert len(runs) == 4
    a, b = fit_log_linear([float(r['config']['lambda_drop_loss']) for r in runs],
                          [float(r['info']['compression_ratio']) for r in runs])
    assert a == pytest.approx(0.5, abs=1e-6)
    targets = targets_from_frontier(runs, target_ratios=(100.0,))
    lam100 = targets[100.0]
    assert np.exp(0.5 * np.log(lam100) + 12) == pytest.approx(100.0, rel=1e-6)


def test_pareto_frontier_util():
    xs = [1, 2, 3, 4]
    ys = [10, 8, 9, 2]
    fx, fy = pareto_frontier(xs, ys)
    assert set(zip(fx, fy)) == {(4, 2), (3, 9), (1, 10)}


def test_mock_quantization_study():
    from latent_feature_grid_compression_tpu.models import make_spec, init_model
    from latent_feature_grid_compression_tpu.ops.quantization import (
        mock_quantization_study, quantize_affine, dequantize_affine)
    import jax.numpy as jnp

    # affine quantize semantics
    x = jnp.asarray([0.0, 0.02, -0.02, 0.011, 10.0])
    q = quantize_affine(x, 0.02)
    np.testing.assert_array_equal(np.asarray(q), [0, 1, -1, 1, 127])
    back = dequantize_affine(q, 0.02)
    np.testing.assert_allclose(np.asarray(back)[:4], [0, .02, -.02, .02],
                               atol=1e-7)

    n = 16
    xg, yg, zg = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = (np.sin(3 * xg) * np.cos(2 * yg)).astype(np.float32)
    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2)
    params, _ = init_model(jax.random.key(0), spec)
    out = mock_quantization_study(spec, params, vol)
    assert out['compression_ratio_quant'] > out['compression_ratio']
    assert np.isfinite(out['psnr_quant'])


def test_plots(tmp_path):
    from latent_feature_grid_compression_tpu.utils.plots import (
        plot_pareto_comparison, plot_weight_histograms)
    from latent_feature_grid_compression_tpu.models import make_spec, init_model

    for i, (ratio, psnr) in enumerate([(50, 45), (100, 40), (200, 38)]):
        d = tmp_path / 'm1' / f'r{i}'
        d.mkdir(parents=True)
        write_dict({'compression_ratio': ratio, 'psnr': psnr}, 'info.txt', str(d))
        write_dict({'lr': 0.008}, 'config.txt', str(d))
    p = plot_pareto_comparison({'m1': str(tmp_path / 'm1')},
                               str(tmp_path / 'cmp.png'))
    assert os.path.exists(p)

    spec = make_spec(grid_size=8, grid_features=4, hidden=16, num_layers=2)
    params, _ = init_model(jax.random.key(0), spec)
    p2 = plot_weight_histograms(params, str(tmp_path / 'hist.png'))
    assert os.path.exists(p2)


def test_plot_pareto_with_variance(tmp_path):
    from latent_feature_grid_compression_tpu.utils.plots import (
        plot_pareto_with_variance)
    rng = np.random.default_rng(3)
    repeats = []
    for rep in range(3):
        base = tmp_path / f'search_{rep}'
        for i in range(6):
            d = base / f'r{i}'
            d.mkdir(parents=True)
            ratio = float(rng.uniform(40, 400))
            psnr = 50 - 4 * np.log10(ratio) + rng.uniform(-1, 1)
            write_dict({'compression_ratio': ratio, 'psnr': float(psnr)},
                       'info.txt', str(d))
            write_dict({'lr': 0.008}, 'config.txt', str(d))
        repeats.append(str(base))
    p = plot_pareto_with_variance({'smallify': repeats},
                                  str(tmp_path / 'var.png'))
    assert os.path.exists(p)


def test_plot_quality_control(tmp_path):
    from latent_feature_grid_compression_tpu.utils.plots import (
        plot_quality_control)
    for i, lam in enumerate([1e-9, 1e-8, 1e-7, 1e-6]):
        d = tmp_path / f'run_{i}'
        d.mkdir()
        write_dict({'lambda_drop_loss': lam}, 'config.txt', str(d))
        write_dict({'compression_ratio': float(np.exp(0.4 * np.log(lam) + 12)),
                    'psnr': 40.0}, 'info.txt', str(d))
    p = plot_quality_control(str(tmp_path), 'lambda_drop_loss',
                             str(tmp_path / 'qc.png'))
    assert os.path.exists(p)


def test_plot_pruned_ratio_comparison(tmp_path):
    from latent_feature_grid_compression_tpu.utils.plots import (
        plot_pruned_ratio_comparison)
    for label in ('with_wavelet', 'without_wavelet'):
        for i, ratio in enumerate([80, 150, 300, 700]):  # 700 > upper_limit
            d = tmp_path / label / f'r{i}'
            d.mkdir(parents=True)
            write_dict({'compression_ratio': float(ratio),
                        'num_zeros': 1000.0 * (i + 1),
                        'num_parameters': 113521, 'psnr': 40.0},
                       'info.txt', str(d))
            write_dict({'lr': 0.008}, 'config.txt', str(d))
    p = plot_pruned_ratio_comparison(
        {'with wavelet': str(tmp_path / 'with_wavelet'),
         'without wavelet': str(tmp_path / 'without_wavelet')},
        str(tmp_path / 'pruned.png'))
    assert os.path.exists(p)


def test_read_trial_metrics_tb_roundtrip(tmp_path):
    """NAS metrics come from TensorBoard event curves like the reference's
    MyTensorboardMetric (Multi_Objective_NAS.py:154-189): the final curve
    point wins, info.txt is only a fallback."""
    from latent_feature_grid_compression_tpu.nas.search import (
        read_trial_metrics, read_trial_metrics_tb)
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        from torch.utils.tensorboard import SummaryWriter
    log_dir = str(tmp_path / 'runs' / 'trial0')
    w = SummaryWriter(log_dir)
    for step, val in enumerate([10.0, 20.0, 150.0]):
        w.add_scalar('compression_ratio', val, step)
    w.add_scalar('psnr', 33.5)
    w.close()

    tb = read_trial_metrics_tb(log_dir)
    assert tb is not None
    assert tb['compression_ratio'] == 150.0      # last curve point
    assert tb['psnr'] == 33.5

    # preferred over info.txt when both exist
    exp = tmp_path / 'exp'
    exp.mkdir()
    write_dict({'compression_ratio': 1.0, 'psnr': 1.0}, 'info.txt', str(exp))
    m = read_trial_metrics(str(exp), log_dir)
    assert m['compression_ratio'] == 150.0

    # fallback path: no TB dir -> info.txt
    m2 = read_trial_metrics(str(exp), str(tmp_path / 'nope'))
    assert m2['compression_ratio'] == 1.0

    # neither -> failed trial
    assert read_trial_metrics(str(tmp_path / 'missing'),
                              str(tmp_path / 'nope')) is None


def test_save_pgf(tmp_path):
    import shutil
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import pytest
    from latent_feature_grid_compression_tpu.utils.plots import save_pgf
    fig, ax = plt.subplots()
    ax.plot([1, 2], [3, 4])
    if any(shutil.which(t) for t in ('xelatex', 'lualatex', 'pdflatex')):
        out = save_pgf(fig, str(tmp_path / 'fig'))
        assert open(out).read()
    else:
        with pytest.raises(RuntimeError, match='TeX engine'):
            save_pgf(fig, str(tmp_path / 'fig'))


def test_mlflow_best_run_guarded():
    import pytest
    from latent_feature_grid_compression_tpu.utils.plots import mlflow_best_run
    try:
        import mlflow  # noqa: F401
        pytest.skip('mlflow installed; guarded-path test not applicable')
    except ImportError:
        pass
    with pytest.raises(ImportError, match='mlflow'):
        mlflow_best_run('psnr', 'exp')
