"""Two-phase training loop, fully on-device.

TPU-native re-design of reference training/training.py:

* No DataLoader: positions are sampled on-device inside the jitted step
  (uniform IID voxel indices, the distribution of IndexDataset.__getitem__,
  data/IndexDataset.py:90-96).
* The whole inner loop — sampling, gated decode, forward, GT gather, loss,
  Adam, Smallify EMA tracking, lr-decay strategy, dkl ramp — is one jitted
  ``lax.scan`` over `steps_per_chunk` steps, so there is exactly one host
  dispatch per chunk instead of per batch.
* Epoch ("volume pass") accounting is reproduced exactly: each step covers
  batch_size*sample_size voxels; the strategy triggers on integer pass
  boundaries (training/training.py:112-114, learning_rate_decay.py).
* Phase structure matches training/training.py:221-239: phase 1 =
  2/3*max_pass with gates + drop loss; bake gate values into the grid; phase
  2 = 1/3*max_pass at lr/10 with frozen binary masks; hard prune.
  Reference quirk preserved: the lr-decay strategy object in phase 2 still
  points at the *phase-1* optimizer, so its decays never reach the live
  optimizer — phase 2 trains at constant lr/10 while the strategy's plateau
  stop logic (SmallifyDecayStrategy) keeps working on a shadow lr.
* Adam is hand-rolled with torch semantics (bias-corrected moments,
  eps=1e-8 outside the sqrt) so lr can live in the scan carry.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.flatten_util import ravel_pytree

from ..config import TrainConfig
from ..data.volume import VolumeMeta
from ..models import gates as G
from ..models.feature_grid import (ModelSpec, ModelParams, apply_model)
from ..models.variance import apply_variance_model
from ..ops.interpolation import gather_rows
from . import losses as L


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------

@struct.dataclass
class TrainState:
    params: ModelParams
    var_params: Any                   # variance-model pytree or None
    m: Any                            # Adam first moment (flat vector)
    v: Any                            # Adam second moment (flat vector)
    step: jax.Array                   # int32, Adam t and voxel accounting
    lr: jax.Array                     # applied learning rate
    shadow_lr: jax.Array              # lr as seen by the decay strategy
    last_loss: jax.Array              # SmallifyDecayStrategy state
    no_gain: jax.Array                # int32
    stop: jax.Array                   # bool
    weight_dkl: jax.Array             # variational ramp state
    gate_aux: Any                     # SmallifyAux or None
    key: jax.Array


@dataclasses.dataclass(frozen=True)
class PhaseSpec:
    """Static per-phase configuration (hashable; closed over by the jit)."""
    spec: ModelSpec
    drop_type: str                    # '' in the finetune phase
    batch_n: int                      # batch_size * sample_size
    n_voxels: int
    resolution: Tuple[int, int, int]
    max_pass: float                   # fractional phase budget
    # steps per DataLoader epoch in the reference (ceil(n_voxels/batch_size)):
    # its outer `while int(vp) + 1 < max_pass` check only runs when the
    # loader is exhausted (training/training.py:88-89), i.e. every
    # loader_len batches; the per-step check is `int(vp) >= max_pass`
    # (training/training.py:178-179)
    loader_len: int
    # loss weights
    lambda_drop_loss: float
    lambda_weight_loss: float
    weight_dkl_multiplier: float
    variational_sigma: float
    # lr strategy
    use_smallify_decay: bool
    pass_decay: int
    lr_decay: float
    lr_stop: float
    decay_applies_to_lr: bool         # False in phase 2 (reference quirk)
    use_masks: bool                   # phase-2 frozen-mask multiply

    @property
    def variational(self) -> bool:
        return G.is_variational(self.drop_type)

    @property
    def dynamic_variational(self) -> bool:
        return self.variational and 'dynamic' in self.drop_type


def init_adam_like(tree):
    """Adam moments are kept as ONE flat vector, not a mirrored pytree.

    The trainables pytree has ~40 small tensors (wavelet coeff levels, gate
    params, MLP layers); a per-tensor tree-mapped update emits ~3 fusions per
    tensor and the per-kernel overhead dominates the actual math (~0.5 ms of
    a 2.4 ms step measured on v5e).  Flat moments + one fused update kernel
    make the optimizer nearly free; params are unraveled back at the end
    (slices fuse into the consumers)."""
    flat, _ = ravel_pytree(tree)
    return jnp.zeros_like(flat)


def _adam_update_flat(p_flat, g_flat, m, v, t, lr,
                      b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam step (training/training.py:199), bias-corrected
    moments and eps outside the sqrt, computed on flattened vectors."""
    m = b1 * m + (1 - b1) * g_flat
    v = b2 * v + (1 - b2) * g_flat * g_flat
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    p_flat = p_flat - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    return p_flat, m, v


def _adam_update(params, grads, m, v, t, lr, **kw):
    """Pytree convenience wrapper around :func:`_adam_update_flat`."""
    p_flat, unravel = ravel_pytree(params)
    g_flat, _ = ravel_pytree(grads)
    p_flat, m, v = _adam_update_flat(p_flat, g_flat, m, v, t, lr, **kw)
    return unravel(p_flat), m, v


# ---------------------------------------------------------------------------
# One training step
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ZeroCtx:
    """Model-state sharding context (ZeRO-style grid-tile sharding).

    Green-field design (SURVEY.md §2.3 north star — the reference has no
    distributed state of any kind): the FLAT trainable vector (wavelet
    coefficient pyramid + gate params + MLP + variance model, the same layout
    ravel_pytree produces) and both Adam moment vectors are sharded over the
    mesh axis ``axis``; every other TrainState leaf stays replicated.  Each
    step the params are materialized with ONE tiled ``all_gather`` over ICI
    (the decode math couples every coefficient to its neighbourhood, so the
    gather is what the math requires), the gradient comes back via
    ``psum_scatter`` (reduce-scatter — each device only ever reduces the
    slice it owns, replacing the replicated path's all-reduce at identical
    communication volume but 1/axis_size the optimizer/parameter memory),
    and Adam updates only the local shard.

    unravel: host closure mapping the UNPADDED flat vector back to the
      (ModelParams, var_params) pytree pair.
    n_params: unpadded flat length; entries beyond it are zero padding so the
      vector divides the axis (their grads/moments stay exactly 0).
    """
    axis: str
    unravel: Any
    n_params: int


@dataclasses.dataclass(frozen=True)
class ShardCtx:
    """Multi-chip sharding context for the train step (used under shard_map).

    axis_names: mesh axes the batch is split over (e.g. ('data', 'space')).
    space_axis: the mesh axis the GT volume's leading spatial dim is sharded
      over, or None if the volume is replicated.  With a space axis, each
      device samples positions only inside its x-slab (stratified sampling —
      same marginal distribution as global IID when slabs are equal).
    n_devices: total devices across axis_names.
    space_size: size of the space axis (1 if None).
    """
    axis_names: Tuple[str, ...] = ()
    space_axis: Optional[str] = None
    n_devices: int = 1
    space_size: int = 1
    # decode only the grid x-tile covering this device's volume slab
    # (+1-cell interpolation halo) instead of the full grid — grid-tile-local
    # decode via a column slice of the final-level synthesis operator
    # (ops/dwt.decode_pyramid last_window); XLA interp backend only
    local_decode: bool = False


def _make_step_parts(ph: PhaseSpec, masks,
                     shard_ctx: Optional[ShardCtx] = None,
                     zero_ctx: Optional[ZeroCtx] = None):
    """Build (sample_chunk, step_fn, idle_fn) for the scanned train loop.

    ``masks`` (tuple of arrays or None) is closed over; they are constants
    during a phase.

    RNG hoisting: per-step position draws and gate keys are generated for a
    WHOLE chunk in one call before the scan (``sample_chunk``) and fed in as
    scan xs.  A per-step (N, 3) randint costs ~0.15 ms on v5e — almost all
    fixed per-call overhead — while one (steps, N, 3) draw amortizes it to
    ~1 us/step.  The sampling distribution is unchanged (IID uniform voxels,
    reference data/IndexDataset.py:90-96); only the PRNG stream layout
    differs, which was never bit-pinned across implementations.

    With ``shard_ctx`` the functions must run inside shard_map: positions
    are sampled per-device (key folded with the device's linear mesh index),
    gradients and metrics are psum-averaged over the mesh axes, and the
    parameter update is computed identically on every device.

    With ``zero_ctx`` (requires shard_ctx) the step additionally runs in
    sharded-model-state mode: state.params is the LOCAL shard of the padded
    flat trainable vector (var_params folded in, see :class:`ZeroCtx`),
    state.m/state.v are the matching local moment shards."""
    spec = ph.spec
    zc = zero_ctx
    assert zc is None or shard_ctx is not None, \
        "zero_ctx requires running under shard_map (shard_ctx)"
    res = np.asarray(ph.resolution, dtype=np.int32)
    max_idx = (res - 1).astype(np.float32)
    scales = max_idx / max_idx.max()
    sc = shard_ctx
    N = ph.batch_n if sc is None else ph.batch_n // sc.n_devices
    inv_voxels = 1.0 / float(ph.n_voxels)
    batch_scale = float(ph.n_voxels) / float(ph.batch_n)
    train_gates = bool(ph.drop_type)
    if sc is not None:
        assert ph.batch_n % sc.n_devices == 0, \
            "batch_size*sample_size must divide the device count"
        assert ph.resolution[0] % sc.space_size == 0, \
            "volume X must divide the space axis"
    local_x = ph.resolution[0] // (sc.space_size if sc else 1)

    # static per-device grid-tile windows for local decode (see ShardCtx)
    use_xwin = bool(sc is not None and sc.space_axis and sc.local_decode
                    and spec.interp_backend == 'xla')
    if use_xwin:
        import math as _math
        W = spec.grid_size
        sx = float(scales[0])
        los, his = [], []
        for d in range(sc.space_size):
            pix = [(( (x / float(max_idx[0])) * 2.0 - 1.0) * sx + 1.0)
                   * W / 2.0 - 0.5
                   for x in (d * local_x, (d + 1) * local_x - 1)]
            los.append(max(0, _math.floor(pix[0])))
            his.append(min(W - 1, _math.floor(pix[1]) + 1))
        xwin_len = max(h - l + 1 for l, h in zip(los, his))
        xwin_los = np.asarray([min(l, W - xwin_len) for l in los], np.int32)

    def _device_index():
        idx = 0
        for ax in sc.axis_names:
            idx = idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
        return idx

    def _pmean(x):
        return jax.lax.pmean(x, sc.axis_names) if sc else x

    def sample_chunk(k_pos: jax.Array, steps: int) -> jax.Array:
        """(steps, N, 3) IID voxel draws in ONE RNG call (IndexDataset
        semantics); local indices when the volume is space-sharded."""
        if sc is not None:
            k_pos = jax.random.fold_in(k_pos, _device_index())
            local_res = jnp.asarray([local_x, res[1], res[2]], jnp.int32)
            return jax.random.randint(k_pos, (steps, N, 3), 0,
                                      local_res[None, None, :])
        return jax.random.randint(k_pos, (steps, N, 3), 0,
                                  res[None, None, :])

    def step_fn(state: TrainState, volume: jax.Array, pos: jax.Array,
                k_gate: jax.Array):
        key = state.key

        # --- positions pre-drawn by sample_chunk (local when sharded) ------
        if sc is not None and sc.space_axis:
            x_off = jax.lax.axis_index(sc.space_axis) * local_x
            gpos = pos.at[:, 0].add(x_off)
        else:
            gpos = pos
        norm = (gpos.astype(jnp.float32) / max_idx[None]) * 2.0 - 1.0
        norm = norm * scales[None]

        # Exact GT fetch.  The in-step (X,Y,Z)->(X*Y,Z) reshape looks like a
        # hoistable 89 us/step copy, but it is load-bearing: r5 full-step A/B
        # measured reshape-in-step 1.370 ms/step vs reshape-hoisted-
        # out-of-scan 1.478 (the gather from the loop-invariant HBM buffer
        # costs 308 us vs 91 from the fresh S(1) copy) and direct-3D
        # indexing 1.536.  Keep the copy; see BENCH_NOTES r5.
        v3 = (volume if volume.ndim == 3
              else volume.reshape(tuple(int(r) for r in res)))
        gt = gather_rows(v3.reshape(-1, v3.shape[-1]), int(res[1]), pos)

        weight_dkl = state.weight_dkl
        if ph.variational and train_gates:
            # ramp happens at the top of the loss call
            # (Variational_Dropout_Layer.py:56-58)
            weight_dkl = L.ramp_weight_dkl(weight_dkl, ph.weight_dkl_multiplier)

        x_window = None
        if use_xwin:
            x_window = (jnp.asarray(xwin_los)[
                jax.lax.axis_index(sc.space_axis)], xwin_len)

        def loss_fn(flat):
            # Differentiate wrt the FLAT parameter vector: AD then produces
            # the gradient as one vector (no 40-leaf pytree transposition),
            # Adam needs no ravel, and under shard_map the gradient pmean is
            # a single all-reduce instead of ~40 small ones.  The unravel
            # slices fuse into their consumers.
            params, var_params = unflatten(flat)
            pred = apply_model(spec, params, norm, train=True,
                               train_gates=train_gates, rng=k_gate,
                               masks=masks if ph.use_masks else None,
                               x_window=x_window)
            pred = pred[:, 0]
            if ph.variational and train_gates:
                if ph.dynamic_variational:
                    log_sigma = apply_variance_model(var_params, norm)[:, 0]
                else:
                    log_sigma = jnp.full_like(pred, ph.variational_sigma)
                loss, ll, mse, dkl, wsum = L.variational_loss(
                    params, pred, gt, log_sigma, weight_dkl,
                    ph.lambda_weight_loss, batch_scale,
                    data_scale=float(ph.n_voxels) / float(N))
                aux = {'loss': loss, 'volume_loss': mse, 'Log_Likelyhood_loss': ll,
                       'DKL_loss': dkl, 'Weight_loss': wsum, 'drop_loss': dkl}
            else:
                vol_loss = jnp.mean((pred - gt) ** 2)
                if train_gates:
                    d_loss = L.smallify_family_loss(
                        ph.drop_type, params, ph.lambda_drop_loss,
                        ph.lambda_weight_loss)
                else:
                    d_loss = jnp.zeros_like(vol_loss)
                loss = vol_loss + d_loss
                aux = {'loss': loss, 'volume_loss': vol_loss, 'drop_loss': d_loss,
                       'Log_Likelyhood_loss': jnp.zeros_like(loss),
                       'DKL_loss': jnp.zeros_like(loss),
                       'Weight_loss': jnp.zeros_like(loss)}
            return loss, aux

        if zc is None:
            flat0, _unravel = ravel_pytree((state.params, state.var_params))
            unflatten = _unravel
        else:
            # ZeRO mode: materialize the full padded flat vector from the
            # per-device shards with one tiled all_gather over the shard axis
            flat0 = jax.lax.all_gather(state.params, zc.axis, tiled=True)
            unflatten = lambda flat: zc.unravel(flat[:zc.n_params])  # noqa: E731

        (loss, aux), g_flat = jax.value_and_grad(loss_fn, has_aux=True)(flat0)
        if sc is not None:
            loss = _pmean(loss)
            aux = _pmean(aux)

        t = state.step + 1
        if zc is not None:
            # reduce-scatter instead of all-reduce: psum_scatter over the
            # shard axis FIRST (each device then holds only its slice), and
            # only then mean over the pure-data axes on the 1/space-sized
            # shard — the reductions commute, and this order makes the total
            # traffic exactly equal the replicated all-reduce volume
            # (scatter-last would pmean the FULL vector over 'data' first:
            # +43% bytes at data=4/space=2; see comm_volume_per_step)
            data_axes = tuple(a for a in sc.axis_names if a != zc.axis)
            g_local = (jax.lax.psum_scatter(g_flat, zc.axis, tiled=True)
                       / jax.lax.axis_size(zc.axis))
            if data_axes:
                g_local = jax.lax.pmean(g_local, data_axes)
            flat_new, m, v = _adam_update_flat(
                state.params, g_local, state.m, state.v,
                t.astype(jnp.float32), state.lr)
            params, var_params = flat_new, state.var_params
        else:
            if sc is not None:
                # average over the mesh: every device then applies the
                # identical global update (replicated params stay in sync)
                g_flat = _pmean(g_flat)
            flat_new, m, v = _adam_update_flat(flat0, g_flat, state.m, state.v,
                                               t.astype(jnp.float32), state.lr)
            params, var_params = unflatten(flat_new)

        # --- Smallify EMA sign-variance tracking (on-device) --------------
        gate_aux = state.gate_aux
        if ph.drop_type == 'smallify' and train_gates:
            old_gates = (state.params.gates if zc is None
                         else unflatten(flat0)[0].gates)
            gate_aux = G.smallify_update_tracker(
                gate_aux, old_gates, spec.drop_momentum)

        # --- volume-pass accounting + lr strategy --------------------------
        # NOTE: uses the *global* batch (ph.batch_n): under shard_map each
        # device processes N=batch_n/n_devices samples, but collectively one
        # step still covers batch_n voxels.
        prior_passes = jnp.floor(state.step.astype(jnp.float32)
                                 * ph.batch_n * inv_voxels)
        vp = t.astype(jnp.float32) * ph.batch_n * inv_voxels
        cur_int = jnp.floor(vp)
        boundary = prior_passes != cur_int

        lr, shadow_lr = state.lr, state.shadow_lr
        last_loss, no_gain, stop = state.last_loss, state.no_gain, state.stop
        if ph.use_smallify_decay:
            # learning_rate_decay.py:42-57
            improved = loss < last_loss       # init sentinel inf == "unset"
            new_last = jnp.where(improved, loss, last_loss)
            new_no_gain = jnp.where(improved, 0, no_gain + 1)
            plateau = new_no_gain == ph.pass_decay
            can_decay = shadow_lr > ph.lr_stop
            decay_now = plateau & can_decay
            stop_now = plateau & (~can_decay)
            shadow_lr2 = jnp.where(decay_now, shadow_lr * ph.lr_decay, shadow_lr)
            lr2 = jnp.where(decay_now & ph.decay_applies_to_lr,
                            lr * ph.lr_decay, lr)
            new_no_gain = jnp.where(plateau, 0, new_no_gain)
            last_loss = jnp.where(boundary, new_last, last_loss)
            no_gain = jnp.where(boundary, new_no_gain, no_gain)
            lr = jnp.where(boundary, lr2, lr)
            shadow_lr = jnp.where(boundary, shadow_lr2, shadow_lr)
            stop = stop | (boundary & stop_now)
        else:
            # NeurcompDecayStrategy (learning_rate_decay.py:26-31)
            decay_now = boundary & (jnp.mod(cur_int + 1, ph.pass_decay) == 0)
            factor = jnp.where(decay_now, ph.lr_decay, 1.0)
            shadow_lr = shadow_lr * factor
            lr = lr * jnp.where(ph.decay_applies_to_lr, factor, 1.0)

        # per-step break once the phase budget is reached
        # (training/training.py:178-179)
        stop = stop | (cur_int >= ph.max_pass)
        # reference outer-while epoch check: when the DataLoader would be
        # exhausted, stop if int(vp) + 1 >= max_pass (training/training.py:88)
        epoch_end = jnp.mod(t, ph.loader_len) == 0
        stop = stop | (epoch_end & (cur_int + 1.0 >= ph.max_pass))

        new_state = TrainState(
            params=params, var_params=var_params, m=m, v=v, step=t,
            lr=lr, shadow_lr=shadow_lr, last_loss=last_loss, no_gain=no_gain,
            stop=stop, weight_dkl=weight_dkl, gate_aux=gate_aux, key=key)

        metrics = dict(aux)
        metrics['lr'] = state.lr
        metrics['volume_passes'] = vp
        return new_state, metrics

    def idle(s, _volume, _pos, _k_gate):
        zero = {k: jnp.zeros(()) for k in
                ['loss', 'volume_loss', 'drop_loss', 'Log_Likelyhood_loss',
                 'DKL_loss', 'Weight_loss', 'lr', 'volume_passes']}
        return s, zero

    return sample_chunk, step_fn, idle


def _select_key(pred, on_true, on_false):
    """where(pred, on_true, on_false) for typed PRNG keys."""
    raw = jnp.where(pred, jax.random.key_data(on_true),
                    jax.random.key_data(on_false))
    return jax.random.wrap_key_data(raw, impl=jax.random.key_impl(on_true))


def make_train_step(ph: PhaseSpec, masks,
                    shard_ctx: Optional[ShardCtx] = None):
    """Single-step convenience wrapper: draws this step's positions and gate
    key from state.key, then runs one guarded train step.  The scanned chunk
    runners use :func:`_make_step_parts` directly so RNG is hoisted."""
    sample_chunk, step_fn, idle = _make_step_parts(ph, masks, shard_ctx)

    def guarded_step(state: TrainState, volume: jax.Array):
        key, k_pos, k_gate = jax.random.split(state.key, 3)
        pos = sample_chunk(k_pos, 1)[0]
        # stopped steps must NOT consume RNG: the number of post-stop
        # dispatches depends on host pipeline timing, so advancing the key
        # there would make the final checkpointed key nondeterministic
        # (ADVICE r3).  Keep the old key on the idle branch.
        state = state.replace(key=_select_key(state.stop, state.key, key))
        return jax.lax.cond(state.stop, idle, step_fn,
                            state, volume, pos, k_gate)

    return guarded_step


def _scan_chunk(ph: PhaseSpec, masks, shard_ctx, steps_per_chunk: int,
                state: TrainState, volume: jax.Array, *, unroll: int = 1,
                zero_ctx: Optional[ZeroCtx] = None):
    """Hoist RNG for a whole chunk, then scan the guarded step over it."""
    sample_chunk, step_fn, idle = _make_step_parts(ph, masks, shard_ctx,
                                                   zero_ctx)
    key, k_pos, k_gate = jax.random.split(state.key, 3)
    pos_all = sample_chunk(k_pos, steps_per_chunk)
    gate_keys = jax.random.split(k_gate, steps_per_chunk)
    # idle (stopped) chunks keep the old key — see guarded_step
    state = state.replace(key=_select_key(state.stop, state.key, key))

    def body(s, xs):
        pos, kg = xs
        return jax.lax.cond(s.stop, idle, step_fn, s, volume, pos, kg)

    return jax.lax.scan(body, state, (pos_all, gate_keys),
                        length=steps_per_chunk, unroll=unroll)


def make_chunk_runner(ph: PhaseSpec, masks, steps_per_chunk: int,
                      unroll: int = 1):
    @jax.jit
    def run_chunk(state: TrainState, volume: jax.Array):
        state, metrics = _scan_chunk(ph, masks, None, steps_per_chunk,
                                     state, volume, unroll=unroll)
        # final stop flag / step count ride along so the host loop needs ONE
        # device fetch per chunk (each fetch is a full round trip on
        # remote-TPU links)
        metrics = dict(metrics)
        metrics['_stop'] = state.stop
        metrics['_step'] = state.step
        return state, metrics

    return run_chunk


# ---------------------------------------------------------------------------
# Phase orchestration (host level)
# ---------------------------------------------------------------------------

def make_phase_spec(cfg: TrainConfig, spec: ModelSpec, meta: VolumeMeta, *,
                    phase: int) -> PhaseSpec:
    two_thirds = cfg.max_pass * (2.0 / 3.0)
    one_third = cfg.max_pass * (1.0 / 3.0)
    return PhaseSpec(
        spec=spec,
        drop_type=cfg.drop_type if phase == 1 else '',
        batch_n=cfg.batch_size * cfg.sample_size,
        n_voxels=meta.n_voxels,
        resolution=tuple(meta.resolution),
        max_pass=two_thirds if phase == 1 else one_third,
        loader_len=-(-meta.n_voxels // cfg.batch_size),
        lambda_drop_loss=cfg.lambda_drop_loss,
        lambda_weight_loss=cfg.lambda_weight_loss,
        weight_dkl_multiplier=cfg.weight_dkl_multiplier,
        variational_sigma=cfg.variational_sigma,
        use_smallify_decay=cfg.smallify_decay != 0,
        pass_decay=cfg.smallify_decay if cfg.smallify_decay != 0 else cfg.pass_decay,
        # both strategies take args['lr_decay'] (learning_rate_decay.py:16,18)
        lr_decay=cfg.lr_decay,
        lr_stop=1e-7,
        decay_applies_to_lr=(phase == 1),
        use_masks=(phase == 2 and bool(cfg.drop_type)),
    )


def init_train_state(params: ModelParams, var_params, gate_aux, lr: float,
                     shadow_lr: float, key: jax.Array,
                     weight_dkl: float) -> TrainState:
    trainables = (params, var_params)
    return TrainState(
        params=params, var_params=var_params,
        m=init_adam_like(trainables), v=init_adam_like(trainables),
        step=jnp.zeros((), jnp.int32),
        lr=jnp.asarray(lr, jnp.float32),
        shadow_lr=jnp.asarray(shadow_lr, jnp.float32),
        # inf == "no loss seen yet" (reference inits last_loss=None,
        # learning_rate_decay.py:40; inf keeps the same semantics and, unlike
        # nan, survives jax's multihost device_put equality check)
        last_loss=jnp.asarray(jnp.inf, jnp.float32),
        no_gain=jnp.zeros((), jnp.int32),
        stop=jnp.zeros((), bool),
        weight_dkl=jnp.asarray(weight_dkl, jnp.float32),
        gate_aux=gate_aux, key=key)


def solve_phase(ph: PhaseSpec, state: TrainState, volume: jax.Array,
                steps_per_chunk: int, masks=None, writer=None,
                metric_cb=None, verbose: bool = True, mesh=None,
                use_space: bool = True, profile_dir: str = '',
                timer=None, state_save_path: str = '',
                shard_params: bool = False,
                local_decode: bool = False) -> TrainState:
    """Run one phase until its pass budget is exhausted or early stop.

    mesh:            run under shard_map over a ('data','space') Mesh —
                     volume x-slab-sharded over 'space' (green-field
                     multi-chip design; SURVEY.md §2.3).
    shard_params:    with a mesh, additionally shard the model/optimizer
                     state over 'space' (ZeRO-style grid-tile sharding, see
                     parallel.mesh.shard_train_state); the returned state is
                     gathered back to the usual replicated pytree.
    profile_dir:     capture a jax.profiler trace of the second (post-
                     compile) chunk dispatch.
    timer:           utils.profiling.StepTimer recording chunk wall-clock.
    state_save_path: mid-phase TrainState checkpoint, rewritten after every
                     chunk (atomic replace) so a killed run can --resume.
    """
    zc = None
    if mesh is not None:
        from ..parallel.mesh import (make_sharded_chunk_runner,
                                     make_zero_sharded_chunk_runner,
                                     replicate, shard_train_state,
                                     shard_volume)
        if shard_params:
            state, zc = shard_train_state(mesh, state)
            run_chunk = make_zero_sharded_chunk_runner(
                mesh, ph, masks, steps_per_chunk, zc, use_space,
                local_decode)
        else:
            run_chunk = make_sharded_chunk_runner(mesh, ph, masks,
                                                  steps_per_chunk, use_space,
                                                  local_decode)
            state = replicate(mesh, state)
        volume = shard_volume(mesh, volume, use_space)
    else:
        run_chunk = make_chunk_runner(ph, masks, steps_per_chunk)
    N, V = ph.batch_n, ph.n_voxels
    # steps needed until floor(t*N/V) >= max_pass (deterministic upper bound)
    import math as _math
    t_max = _math.ceil((_math.floor(ph.max_pass) + 1) * V / N) + 1
    variational = ph.variational and bool(ph.drop_type)
    import contextlib
    import time as _time
    last_save = _time.monotonic()
    last_hist = -float('inf')

    def _restore(st):
        """Zero-sharded states go back to the replicated pytree layout for
        host-side consumers (checkpointing, histograms, the caller)."""
        if zc is None:
            return st
        from ..parallel.mesh import unshard_train_state
        return unshard_train_state(st, zc)

    def _process(entry):
        """Fetch + handle one finished chunk's results (ONE device fetch)."""
        nonlocal last_save, last_hist
        s0, st, ms = entry
        ms = jax.device_get(ms)
        stop_now = bool(ms.pop('_stop'))
        true_step = int(ms.pop('_step'))
        # checkpoint at most every ~60 s — a per-chunk device->host state
        # fetch would dominate short chunks on remote-TPU links
        if state_save_path and (stop_now
                                or _time.monotonic() - last_save > 60.0):
            _atomic_save_state(state_save_path, _restore(st))
            last_save = _time.monotonic()
        if writer is not None or metric_cb is not None or verbose:
            _emit_metrics(ms, s0, variational, writer, metric_cb, verbose, ph)
        # histograms pull gate tensors to the host: throttle like the saves
        if variational and writer is not None and (
                stop_now or _time.monotonic() - last_hist > 30.0):
            _emit_droprate_histograms(writer, ph, _restore(st), true_step)
            last_hist = _time.monotonic()
        return stop_now

    # Software pipeline: chunk k's host-side processing (metrics fetch, TB
    # scalar emission, throttled state saves) runs on a worker thread while
    # chunk k+1 executes on the device.  This matters twice on remote-TPU
    # links: the metrics fetch is a full round trip, and the per-step TB
    # writes are hundreds of ms of host Python per chunk — serialized, they
    # were ~half the product step time (5.2 ms/step vs the 2.4 ms bare step).
    # Cost: the stop flag is observed up to two chunks late — extra chunks
    # run guarded_step's idle branch (state.step does not advance), so budget
    # accounting and resume are unaffected.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    chunk_idx = 0
    dispatched = int(state.step)     # single entry sync
    stopped = False
    futures = deque()
    with ThreadPoolExecutor(max_workers=1) as ex:
        while dispatched < t_max and not stopped:
            prof = contextlib.nullcontext()
            sync_in_trace = False
            if profile_dir and chunk_idx == 1:   # skip the compile chunk
                from ..utils.profiling import trace
                prof = trace(profile_dir)
                sync_in_trace = True             # trace must span execution
            tchunk = (timer.chunk(steps_per_chunk, compile=(chunk_idx == 0))
                      if timer is not None else contextlib.nullcontext())
            with prof, tchunk:
                state, metrics = run_chunk(state, volume)
                if sync_in_trace:
                    _ = jax.device_get(metrics['loss'])
                futures.append(ex.submit(_process, (dispatched, state,
                                                    metrics)))
                # backpressure: dispatch is async on some PJRT backends, so
                # blocking on the oldest in-flight chunk here both bounds the
                # pipeline depth and makes the timed chunk wall reflect the
                # true sustained rate
                while futures and (futures[0].done() or len(futures) > 1):
                    stopped = futures.popleft().result() or stopped
            dispatched += steps_per_chunk
            chunk_idx += 1
        while futures:
            stopped = futures.popleft().result() or stopped
    state = _restore(state)
    if state_save_path:   # final state always lands on disk
        _atomic_save_state(state_save_path, state)
    return state


def _atomic_save_state(path: str, state: TrainState) -> None:
    import os
    from ..io.train_state_io import save_train_state
    tmp = path + '.tmp.npz'
    save_train_state(tmp, state)
    os.replace(tmp, path)


def _emit_droprate_histograms(writer, ph, state, step):
    """Per-level variational droprate histograms (training/training.py:163-172)."""
    from ..models import gates as G
    import numpy as _np
    if state.params.gates is None:
        return
    for lvl in range(len(state.params.coeffs)):
        rates = _np.asarray(G.variational_dropout_rates(state.params.gates, lvl))
        writer.add_histogram(f'droprates_layer_{lvl}', rates.ravel(), step)


def _emit_metrics(metrics, start_step, variational, writer, metric_cb,
                  verbose, ph):
    n = len(metrics['loss'])
    mask = metrics['lr'] > 0  # idle steps have lr==0
    for i in range(n):
        if not mask[i]:
            continue
        it = start_step + i + 1
        if writer is not None:
            writer.add_scalar('loss', float(metrics['loss'][i]), it)
            writer.add_scalar('volume_loss', float(metrics['volume_loss'][i]), it)
            if variational:
                writer.add_scalar('Log_Likelyhood_loss',
                                  float(metrics['Log_Likelyhood_loss'][i]), it)
                writer.add_scalar('DKL_loss', float(metrics['DKL_loss'][i]), it)
                writer.add_scalar('Weight_loss', float(metrics['Weight_loss'][i]), it)
            else:
                writer.add_scalar('drop_loss', float(metrics['drop_loss'][i]), it)
    if metric_cb is not None:
        metric_cb(metrics)
    if verbose and n and mask.any():   # all-idle chunks print nothing
        last = n - 1
        while last > 0 and not mask[last]:
            last -= 1
        print(f"Pass [{metrics['volume_passes'][last]:.4f} / "
              f"{ph.max_pass:.1f}]: volume loss: {metrics['volume_loss'][last]:.4f}, "
              f"complete_loss: {metrics['loss'][last]:.4f}")
