"""Quality-control experiment re-runner.

Re-design of visualization/trigger_experiments.py: re-train configurations
from a finished NAS frontier with modified settings, or sweep a
hyperparameter (via the fitted param->ratio law) to hit target compression
ratios.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Dict, List, Optional, Sequence

from .analysis import collect_experiments, targets_from_frontier


def rerun_frontier_configs(frontier_dirs: Sequence[str],
                           overrides: Optional[Dict] = None,
                           basedir: str = '/experiments/QualityControl/',
                           train_script: str = 'train.py',
                           dry_run: bool = False) -> List[List[str]]:
    """Re-launch the config of each frontier experiment with overrides
    (e.g. {'wavelet_filter': '', ...}); mirrors
    neurcompRunsDiffComprRatesFromFrontier (trigger_experiments.py:7-39)."""
    cmds = []
    for i, d in enumerate(frontier_dirs):
        cfg_file = os.path.join(d, 'config.txt')
        cmd = [sys.executable, train_script, '--config', cfg_file,
               '--expname', f'qc_rerun_{i}', '--basedir', basedir]
        for k, v in (overrides or {}).items():
            cmd += [f'--{k}', str(v)]
        cmds.append(cmd)
        if not dry_run:
            subprocess.run(cmd, check=False)
    return cmds


def runs_at_target_ratios(base_dir: str, config_path: str,
                          param_key: str = 'lambda_drop_loss',
                          target_ratios: Sequence[float] = (100, 200, 300,
                                                            400, 500, 600),
                          basedir: str = '/experiments/QualityControl/',
                          train_script: str = 'train.py',
                          dry_run: bool = False) -> List[List[str]]:
    """Fit the param->compression-ratio law over finished runs in base_dir and
    launch one run per target ratio (fvRunsDiffComprRates,
    trigger_experiments.py:42-86)."""
    runs = collect_experiments(base_dir)
    targets = targets_from_frontier(runs, param_key, target_ratios)
    cmds = []
    for ratio, value in targets.items():
        cmd = [sys.executable, train_script, '--config', config_path,
               '--expname', f'qc_target_{int(ratio)}', '--basedir', basedir,
               f'--{param_key}', repr(value)]
        cmds.append(cmd)
        if not dry_run:
            subprocess.run(cmd, check=False)
    return cmds
