"""Config parsing: reference config files load unchanged."""

import os

import pytest

from latent_feature_grid_compression_tpu.config import (
    TrainConfig, load_config, dict_from_file, write_dict, config_from_args)

REF_CONFIGS = '/root/reference/experiment-config-files'


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason='no reference configs')
def test_reference_config_files_parse():
    cfg = load_config(os.path.join(REF_CONFIGS, 'test_impl_test.txt'))
    assert cfg.expname == 'testvol_'
    assert cfg.data == 'datasets/test_vol.npy'
    assert cfg.grid_size == 15 and cfg.grid_features == 16
    assert cfg.drop_type == 'smallify'
    assert cfg.lr == 0.008 and cfg.max_pass == 50
    assert cfg.lambda_drop_loss == 1e-8
    assert cfg.batch_size == 1024 and cfg.sample_size == 16

    cfg2 = load_config(os.path.join(REF_CONFIGS, 'mhd_p_smallify.txt'))
    assert cfg2.batch_size == 2048 and cfg2.grid_size == 15
    assert cfg2.smallify_decay == 0


def test_write_and_reparse_roundtrip(tmp_path):
    cfg = TrainConfig(expname='abc', lr=0.004, grid_size=17,
                      drop_type='masked_straight_through')
    write_dict(cfg.to_dict(), 'config.txt', str(tmp_path))
    d = dict_from_file(str(tmp_path / 'config.txt'))
    assert d['expname'] == 'abc'
    assert d['lr'] == 0.004
    assert d['grid_size'] == 17
    assert d['drop_type'] == 'masked_straight_through'

    cfg2 = load_config(str(tmp_path / 'config.txt'))
    assert cfg2.lr == cfg.lr and cfg2.grid_size == cfg.grid_size


def test_cli_overrides_config(tmp_path):
    write_dict({'expname': 'x', 'lr': 0.1, 'grid_size': 10}, 'c.txt', str(tmp_path))
    cfg = config_from_args(['--config', str(tmp_path / 'c.txt'),
                            '--lr', '0.5', '--drop_type', ''])
    assert cfg.lr == 0.5          # CLI wins
    assert cfg.grid_size == 10    # from file
    assert cfg.drop_type == ''


def test_threshold_list_parsing(tmp_path):
    write_dict({'pruning_threshold_list': [0.6, 0.7, 0.8]}, 'c.txt', str(tmp_path))
    d = dict_from_file(str(tmp_path / 'c.txt'))
    assert d['pruning_threshold_list'] == [0.6, 0.7, 0.8]


def test_all_shipped_configs_parse_and_build_specs():
    """Every experiment-config-files/*.txt (mirrors of the reference's
    shipped configs) must load and produce a valid ModelSpec — including
    'variational_dynamic' (reference mhd_p_HyperparamSearch.txt word order)
    and per-level pruning_threshold_list."""
    import os
    from latent_feature_grid_compression_tpu.models import make_spec

    cfg_dir = os.path.join(os.path.dirname(__file__), '..',
                           'experiment-config-files')
    files = sorted(f for f in os.listdir(cfg_dir) if f.endswith('.txt'))
    assert len(files) >= 9, files
    for f in files:
        cfg = load_config(os.path.join(cfg_dir, f))
        spec = make_spec(grid_size=cfg.grid_size,
                         grid_features=cfg.grid_features,
                         hidden=cfg.n_hidden_size, num_layers=cfg.n_layers,
                         drop_type=cfg.drop_type,
                         pruning_threshold_list=cfg.pruning_threshold_list,
                         compute_dtype=cfg.compute_dtype)
        assert spec.num_levels >= 1, f
        if f == 'mhd_p_HyperparamSearch.txt':
            assert spec.thresholds == (0.1, 0.8, 0.9)
            from latent_feature_grid_compression_tpu.models import gates as G
            assert G.is_variational(cfg.drop_type)
            assert 'dynamic' in cfg.drop_type


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason='no reference configs')
def test_shipped_variational_configs_match_reference_hparams():
    """The shipped flagship variational configs must carry the reference's
    loss hyperparameters (a 1e-8 placeholder lambda silently disables DKL
    pruning entirely — caught live in round 3)."""
    pairs = [('mhd_p_static_variational.txt', 'mhd_p_static_variational.txt'),
             ('mhd_p_dynamic_variational.txt', 'mhd_p_dynamic_variational.txt')]
    ours_dir = os.path.join(os.path.dirname(__file__), '..',
                            'experiment-config-files')
    for ours, ref in pairs:
        a = dict_from_file(os.path.join(ours_dir, ours))
        b = dict_from_file(os.path.join(REF_CONFIGS, ref))
        for k in ('lambda_drop_loss', 'lambda_weight_loss', 'drop_momentum',
                  'weight_dkl_multiplier', 'variational_sigma', 'drop_threshold',
                  'lr', 'lr_decay', 'max_pass', 'pass_decay', 'grid_features',
                  'grid_size', 'batch_size', 'sample_size'):
            assert a[k] == b[k], (ours, k, a[k], b[k])
