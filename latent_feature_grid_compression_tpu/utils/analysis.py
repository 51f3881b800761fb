"""Experiment analysis utilities.

Re-implements the reference's side-car analysis layer
(visualization/pltUtils.py, tests/CurveFitting.py):

* experiment-folder readers (info.txt / config.txt via config.dict_from_file)
* Pareto-frontier extraction (pltUtils.py:117-163)
* hyperparameter <-> compression-ratio curve fitting, used by the
  quality-control runner to hit target compression rates
  (tests/CurveFitting.py:89-245, visualization/trigger_experiments.py:42-86)
"""

from __future__ import annotations

import glob
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import dict_from_file


def load_experiment(experiment_path: str) -> Dict[str, dict]:
    """Read {info, config} dicts of one experiment folder."""
    out = {}
    for name in ('info', 'config'):
        p = os.path.join(experiment_path, f'{name}.txt')
        out[name] = dict_from_file(p) if os.path.exists(p) else {}
    return out


def collect_experiments(base_dir: str, pattern: str = '*') -> List[Dict[str, dict]]:
    """Load all experiment folders under base_dir matching pattern."""
    runs = []
    for d in sorted(glob.glob(os.path.join(base_dir, pattern))):
        if os.path.isdir(d):
            e = load_experiment(d)
            if e['info']:
                e['path'] = d
                runs.append(e)
    return runs


def pareto_frontier(xs: Sequence[float], ys: Sequence[float],
                    max_x: bool = True, max_y: bool = True
                    ) -> Tuple[List[float], List[float]]:
    """Pareto frontier of (x, y) points (pltUtils.plot_pareto_frontier)."""
    pts = sorted(zip(xs, ys), reverse=max_x)
    front = [pts[0]]
    for x, y in pts[1:]:
        if (y >= front[-1][1]) == max_y and y != front[-1][1]:
            front.append((x, y))
    fx, fy = zip(*front)
    return list(fx), list(fy)


# ---------------------------------------------------------------------------
# Curve fitting: hyperparameter -> compression ratio laws
# (tests/CurveFitting.py fits log-linear/power models with scipy.curve_fit)
# ---------------------------------------------------------------------------

def fit_log_linear(param_values: Sequence[float],
                   ratios: Sequence[float]) -> Tuple[float, float]:
    """Fit ratio = exp(a * log(param) + b); returns (a, b)."""
    lx = np.log(np.asarray(param_values, dtype=np.float64))
    ly = np.log(np.asarray(ratios, dtype=np.float64))
    a, b = np.polyfit(lx, ly, 1)
    return float(a), float(b)


def param_for_target_ratio(a: float, b: float, target_ratio: float) -> float:
    """Invert the fitted law: param achieving the target compression ratio."""
    return float(math.exp((math.log(target_ratio) - b) / a))


def targets_from_frontier(runs: List[Dict[str, dict]],
                          param_key: str = 'lambda_drop_loss',
                          target_ratios: Sequence[float] = (100, 200, 300,
                                                            400, 500, 600)
                          ) -> Dict[float, float]:
    """Fit the param->ratio law over completed runs and solve for each target
    ratio (the quality-control recipe of trigger_experiments.py:42-86)."""
    xs = [float(r['config'][param_key]) for r in runs
          if param_key in r['config'] and 'compression_ratio' in r['info']]
    ys = [float(r['info']['compression_ratio']) for r in runs
          if param_key in r['config'] and 'compression_ratio' in r['info']]
    if len(xs) < 2:
        raise ValueError('need >= 2 completed runs to fit the curve')
    a, b = fit_log_linear(xs, ys)
    return {t: param_for_target_ratio(a, b, t) for t in target_ratios}
