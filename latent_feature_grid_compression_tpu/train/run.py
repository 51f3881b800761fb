"""Top-level training entry (reference: training/training.py:184-243).

training(cfg) -> info dict:
  load + normalize volume -> build model -> phase 1 (gates + drop loss,
  2/3*max_pass) -> bake gate values into the grid -> phase 2 (finetune at
  lr/10 with frozen masks, 1/3*max_pass) -> hard prune -> full-volume eval,
  compression accounting, checkpoint + packed binary + info/config artifacts.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig, write_dict, dict_from_file
from ..data.volume import load_volume, VolumeMeta
from ..models.feature_grid import (make_spec, init_model,
                                   save_dropvalues_on_grid, remove_drop_layers,
                                   num_net_params)
from ..models import gates as G
from ..models.variance import init_variance_model
from ..eval.reconstruct import tiled_net_out
from ..io.checkpoint import save_checkpoint, load_checkpoint
from ..io.container import store_model_parameters
from ..io.train_state_io import load_train_state
from ..utils.profiling import StepTimer
from .trainer import (make_phase_spec, init_train_state, solve_phase)


def _make_writer(cfg: TrainConfig):
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError:
            return None
    if cfg.Tensorboard_log_dir:
        writer = SummaryWriter(cfg.Tensorboard_log_dir)
        write_dict(cfg.to_dict(), 'config.txt', cfg.Tensorboard_log_dir)
    else:
        writer = SummaryWriter('runs/' + cfg.expname)
    return writer


def evaluate_model_training(spec, params, meta, volume_np, zeros, cfg,
                            writer=None, verbose=True, write_vols=True,
                            volume_dev=None):
    """Final evaluation + artifact dump (training/training.py:19-68)."""
    experiment_path = os.path.abspath(os.getcwd()) + cfg.basedir + cfg.expname + '/'
    os.makedirs(experiment_path, exist_ok=True)

    psnr, l1_diff, mse, rmse = tiled_net_out(
        spec, params, meta, gt_vol=volume_np, evaluate=True,
        write_vols=write_vols,
        filename=os.path.join(experiment_path, 'vol') if write_vols else 'vol',
        gt_dev=volume_dev)

    n_params = num_net_params(params)
    compression_ratio = meta.n_voxels / (n_params - zeros)
    compr_rmse = compression_ratio / rmse if rmse > 0 else float('inf')

    if verbose:
        print("Trained Model:", n_params, "parameters;", zeros,
              "of them Zero;", compression_ratio, "compression ratio")

    info = {
        'volume_size': list(meta.resolution),
        'volume_num_voxels': meta.n_voxels,
        'num_parameters': n_params,
        'num_zeros': zeros,
        'compression_ratio': compression_ratio,
        'psnr': psnr,
        'l1_diff': l1_diff,
        'mse': mse,
        'rmse': rmse,
        'compr_rmse': compr_rmse,
    }

    if writer is not None:
        writer.add_scalar('compression_ratio', compression_ratio)
        writer.add_scalar('zeroes', zeros)
        writer.add_scalar('psnr', psnr)
        writer.add_scalar('mse', mse)
        writer.add_scalar('rmse', rmse)
        writer.add_scalar('compr_rmse', compr_rmse)

    ckpt_path = os.path.join(experiment_path, 'model.npz')
    save_checkpoint(ckpt_path, params)
    cfg.checkpoint_path = ckpt_path

    bin_path = os.path.join(experiment_path, 'binary_model_file')
    store_model_parameters(spec, params, bin_path)
    cfg.binary_checkpoint_path = bin_path

    write_dict(info, 'info.txt', experiment_path)
    write_dict(cfg.to_dict(), 'config.txt', experiment_path)
    return info


def _build_mesh(cfg: TrainConfig, meta: VolumeMeta, verbose: bool):
    """Build the ('data','space') device mesh when multi-chip is requested.

    Returns (mesh, use_space).  Green-field multi-chip design (the reference
    is single-device, training/training.py:15; SURVEY.md §2.3): positions are
    data-parallel, the GT volume is x-slab-sharded over 'space' when its
    leading dim divides the axis, replicated otherwise.
    """
    from ..parallel.distributed import initialize_distributed
    initialize_distributed()
    if cfg.mesh_data * cfg.mesh_space <= 1:
        return None, False
    from ..parallel.mesh import make_mesh
    mesh = make_mesh(data=cfg.mesh_data, space=cfg.mesh_space)
    use_space = cfg.mesh_space > 1 and meta.resolution[0] % cfg.mesh_space == 0
    if verbose:
        placement = ('x-slab sharded' if use_space else 'replicated')
        print(f"Multi-chip mesh: data={cfg.mesh_data} x space={cfg.mesh_space}"
              f" ({len(mesh.devices.flat)} devices), volume {placement}")
    return mesh, use_space


def training(cfg: TrainConfig, verbose: bool = True,
             volume_np: Optional[np.ndarray] = None,
             write_vols: bool = True) -> dict:
    """Full two-phase training run; returns the info dict."""
    if volume_np is None:
        volume_np = load_volume(cfg.data)
    meta = VolumeMeta(tuple(volume_np.shape))
    volume = jnp.asarray(volume_np)

    mesh, use_space = _build_mesh(cfg, meta, verbose)

    spec = make_spec(d_in=cfg.d_in, hidden=cfg.n_hidden_size, d_out=cfg.d_out,
                     num_layers=cfg.n_layers, n_freqs=cfg.n_embedding_freq,
                     grid_features=cfg.grid_features, grid_size=cfg.grid_size,
                     wavelet=cfg.wavelet_filter, drop_type=cfg.drop_type,
                     drop_momentum=cfg.drop_momentum,
                     drop_threshold=cfg.drop_threshold,
                     pruning_threshold_list=cfg.pruning_threshold_list,
                     interp_backend=cfg.interp_backend,
                     compute_dtype=cfg.compute_dtype,
                     mlp_backend=cfg.mlp_backend)

    # rbg: XLA RngBitGenerator for the per-step (N, 3) position draws — the
    # threefry lowering costs a measurable slice of the fused step on TPU.
    key = jax.random.key(cfg.seed, impl=cfg.rng_impl)
    k_model, k_var, k_train = jax.random.split(key, 3)
    params, gate_aux = init_model(k_model, spec)
    if cfg.checkpoint_path:
        params, gate_aux = load_checkpoint(cfg.checkpoint_path, params, gate_aux)

    var_params = None
    if G.is_variational(cfg.drop_type) and 'dynamic' in cfg.drop_type:
        var_params = init_variance_model(k_var, cfg.d_in, 1, 4, 32)

    writer = _make_writer(cfg)
    timer = StepTimer(cfg.batch_size * cfg.sample_size)

    # experiment dir doubles as the mid-training resume location
    experiment_path = os.path.abspath(os.getcwd()) + cfg.basedir + cfg.expname + '/'
    os.makedirs(experiment_path, exist_ok=True)
    resume_phase, resume_dir = 0, ''
    if cfg.resume:
        resume_dir = cfg.resume if os.path.isdir(cfg.resume) else \
            os.path.dirname(cfg.resume)
        meta_path = os.path.join(resume_dir, 'resume_meta.txt')
        phase_val = dict_from_file(meta_path)['phase']
        if phase_val == 'done':
            raise ValueError(
                f"{resume_dir} finished training (resume_meta phase=done); "
                f"use --checkpoint_path for a warm start instead")
        resume_phase = int(phase_val)
        if verbose:
            print(f"Resuming phase {resume_phase} from {resume_dir}")

    solve_kw = dict(writer=writer, verbose=verbose, mesh=mesh,
                    use_space=use_space, timer=timer,
                    shard_params=bool(cfg.mesh_shard_params) and mesh is not None,
                    local_decode=bool(cfg.mesh_local_decode))

    # --- phase 1: gated training (training/training.py:221-226) ------------
    ph1 = make_phase_spec(cfg, spec, meta, phase=1)
    state = init_train_state(params, var_params, gate_aux, lr=cfg.lr,
                             shadow_lr=cfg.lr, key=k_train,
                             weight_dkl=cfg.lambda_drop_loss)
    if resume_phase == 1:
        state = load_train_state(
            os.path.join(resume_dir, 'train_state_phase1.npz'), state)
    if resume_phase < 2:
        write_dict({'phase': 1}, 'resume_meta.txt', experiment_path)
        state = solve_phase(
            ph1, state, volume, cfg.steps_per_chunk,
            profile_dir=cfg.profile_dir,
            state_save_path=os.path.join(experiment_path,
                                         'train_state_phase1.npz'),
            **solve_kw)
        params, gate_aux = state.params, state.gate_aux

        # --- bake gates into the grid (Feature_Grid_Model.py:110-128) ------
        params, masks, zeros = save_dropvalues_on_grid(spec, params, gate_aux)
        _save_bake(experiment_path, masks, zeros)
    else:
        masks, zeros = _load_bake(resume_dir)

    # --- phase 2: finetune at lr/10 with frozen masks ----------------------
    ph2 = make_phase_spec(cfg, spec, meta, phase=2)
    state2 = init_train_state(params, state.var_params, gate_aux,
                              lr=cfg.lr / 10.0,
                              shadow_lr=float(state.shadow_lr),
                              key=jax.random.fold_in(k_train, 1),
                              weight_dkl=float(state.weight_dkl))
    state2 = init_train_state_carryover(state2, state)
    if resume_phase == 2:
        state2 = init_train_state(params, state.var_params, gate_aux,
                                  lr=cfg.lr / 10.0, shadow_lr=cfg.lr,
                                  key=jax.random.fold_in(k_train, 1),
                                  weight_dkl=cfg.lambda_drop_loss)
        state2 = load_train_state(
            os.path.join(resume_dir, 'train_state_phase2.npz'), state2)
    write_dict({'phase': 2}, 'resume_meta.txt', experiment_path)
    state2 = solve_phase(
        ph2, state2, volume, cfg.steps_per_chunk, masks=masks,
        state_save_path=os.path.join(experiment_path,
                                     'train_state_phase2.npz'),
        **solve_kw)
    params = state2.params

    # --- hard prune + evaluate ---------------------------------------------
    params = remove_drop_layers(spec, params, masks)
    info = evaluate_model_training(spec, params, meta, volume_np, zeros, cfg,
                                   writer=writer, verbose=verbose,
                                   write_vols=write_vols, volume_dev=volume)
    info.update({'train_' + k: v for k, v in timer.stats().items()})
    write_dict(info, 'info.txt', experiment_path)
    write_dict({'phase': 'done'}, 'resume_meta.txt', experiment_path)
    if writer is not None:
        writer.close()
    return info


def _save_bake(experiment_path: str, masks, zeros: float) -> None:
    arrs = {} if masks is None else \
        {f'mask_{i}': np.asarray(m) for i, m in enumerate(masks)}
    np.savez(os.path.join(experiment_path, 'bake.npz'),
             zeros=np.float64(zeros), **arrs)


def _load_bake(resume_dir: str):
    with np.load(os.path.join(resume_dir, 'bake.npz')) as z:
        zeros = float(z['zeros'])
        n = sum(1 for k in z.files if k.startswith('mask_'))
        masks = tuple(jnp.asarray(z[f'mask_{i}']) for i in range(n)) \
            if n else None
    return masks, zeros


def init_train_state_carryover(state2, state1):
    """Carry the SmallifyDecayStrategy plateau state across phases (the
    reference reuses the same strategy object, learning_rate_decay.py:35-57)."""
    return state2.replace(last_loss=state1.last_loss, no_gain=state1.no_gain)
