"""Multi-chip training: mesh construction + shard_map'd train step.

Green-field parallelism design (the reference is strictly single-device,
training/training.py:15; see SURVEY.md §2.3):

* Mesh axes ('data', 'space'):
    - 'data'  : pure data parallelism over sampled positions.
    - 'space' : the GT volume is sharded into x-slabs; each device samples
      positions inside its slab (stratified — identical marginal statistics
      to global IID sampling when slabs are equal).  This is the
      sequence-parallel analogue for this point-sampled workload and keeps
      per-device volume memory at X/space * Y * Z.
* Model/optimizer state: replicated by default — gradients are pmean'd over
  both axes inside the step (lowered by XLA to an ICI all-reduce; whether it
  overlaps the backward is XLA's scheduling choice and has not been timed on
  real multi-chip hardware — single-chip image) — or ZeRO-sharded over
  'space' via :func:`shard_train_state` (all_gather params /
  reduce_scatter grads; same per-step communication volume, 1/space the
  state memory).
* Multi-host: build the mesh over jax.devices() after jax.distributed
  initialization; the per-device PRNG fold_in is by linear mesh index, so
  sampling statistics are invariant to host count.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax.flatten_util import ravel_pytree

from ..train.trainer import (PhaseSpec, TrainState, ShardCtx, ZeroCtx,
                             _scan_chunk)


def make_mesh(data: int = 0, space: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'space') mesh; data=0 -> use all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == 0:
        assert n % space == 0, (n, space)
        data = n // space
    assert data * space <= n, f"need {data * space} devices, have {n}"
    arr = np.asarray(devices[: data * space]).reshape(data, space)
    return Mesh(arr, ('data', 'space'))


def _put_global(value, sharding: NamedSharding):
    """device_put that also works on a multi-process mesh.

    jax.device_put rejects shardings that span non-addressable devices; in
    multi-process mode every process passes the same host value and each
    builds its addressable shards via make_array_from_callback.  Typed PRNG
    keys are rebuilt through key_data/wrap_key_data (extended dtypes are not
    supported by the callback path).
    """
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    if jnp.issubdtype(getattr(value, 'dtype', None), jax.dtypes.prng_key):
        raw = _put_global(jax.random.key_data(value), sharding)
        return jax.random.wrap_key_data(raw, impl=jax.random.key_impl(value))
    host = np.asarray(value)
    return jax.make_array_from_callback(host.shape, sharding,
                                        lambda idx: host[idx])


def shard_volume(mesh: Mesh, volume: jax.Array, use_space: bool = True):
    """Place the GT volume: x-slabs over 'space', replicated over 'data'."""
    pspec = P('space') if use_space and mesh.shape['space'] > 1 else P()
    return _put_global(volume, NamedSharding(mesh, pspec))


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(lambda a: _put_global(a, sharding), tree)


def make_shard_ctx(mesh: Mesh, use_space: bool = True,
                   local_decode: bool = False) -> ShardCtx:
    space = mesh.shape['space']
    return ShardCtx(
        axis_names=('data', 'space'),
        space_axis='space' if (use_space and space > 1) else None,
        n_devices=mesh.shape['data'] * space,
        space_size=space if use_space else 1,
        local_decode=local_decode,
    )


def make_sharded_chunk_runner(mesh: Mesh, ph: PhaseSpec, masks,
                              steps_per_chunk: int, use_space: bool = True,
                              local_decode: bool = False):
    """jit(shard_map(scan(step))) over the mesh.

    Returns run(state, volume) -> (state, metrics); state must be replicated
    (see :func:`replicate`) and volume placed via :func:`shard_volume`.
    """
    sc = make_shard_ctx(mesh, use_space, local_decode)

    vol_spec = P('space') if sc.space_axis else P()

    def chunk_body(state: TrainState, volume: jax.Array):
        # RNG hoisted per chunk (see trainer._make_step_parts); the per-device
        # fold_in happens inside sample_chunk, so every device draws its own
        # position stream from the replicated carry key.
        return _scan_chunk(ph, masks, sc, steps_per_chunk, state, volume)

    sharded = jax.shard_map(
        chunk_body, mesh=mesh,
        in_specs=(P(), vol_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    # NOTE: no donate_argnums — replicate() aliases arrays that already carry
    # the target sharding, so donating the state would delete buffers the
    # caller still holds (e.g. the PRNG key reused to seed phase 2).
    def run(state: TrainState, volume: jax.Array):
        st, metrics = sharded(state, volume)
        # one-fetch protocol of trainer.make_chunk_runner (see there)
        metrics = dict(metrics)
        metrics['_stop'] = st.stop
        metrics['_step'] = st.step
        return st, metrics

    return jax.jit(run)


# ---------------------------------------------------------------------------
# ZeRO-style sharding of MODEL STATE over 'space' (SURVEY §2.3/§7 north star)
# ---------------------------------------------------------------------------

def shard_train_state(mesh: Mesh, state: TrainState,
                      axis: str = 'space') -> Tuple[TrainState, ZeroCtx]:
    """Shard the trainable state over a mesh axis (grid-tile/ZeRO sharding).

    The flat trainable vector — wavelet coefficient pyramid, gate params, MLP
    and (if present) the variance model, in ravel_pytree order — plus both
    Adam moment vectors are zero-padded to a multiple of the axis size and
    placed with ``PartitionSpec(axis)``; every other leaf stays replicated.
    Per-device parameter+optimizer memory drops to ~3P/axis_size floats (vs
    3P replicated); the reference has no analogue (single device,
    training/training.py:15).

    Returns the sharded state (params := padded flat vector, var_params
    folded in / None) and the :class:`ZeroCtx` needed to run and unshard it.
    """
    n_shards = mesh.shape[axis]
    flat, unravel = ravel_pytree((state.params, state.var_params))
    n = flat.shape[0]
    padded = -(-n // n_shards) * n_shards
    pad = padded - n

    def _pad(vec):
        return jnp.pad(vec, (0, pad)) if pad else vec

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    zstate = state.replace(
        params=_put_global(_pad(flat), shard),
        var_params=None,
        m=_put_global(_pad(state.m), shard),
        v=_put_global(_pad(state.v), shard),
    )
    zstate = zstate.replace(
        step=_put_global(zstate.step, repl), lr=_put_global(zstate.lr, repl),
        shadow_lr=_put_global(zstate.shadow_lr, repl),
        last_loss=_put_global(zstate.last_loss, repl),
        no_gain=_put_global(zstate.no_gain, repl),
        stop=_put_global(zstate.stop, repl),
        weight_dkl=_put_global(zstate.weight_dkl, repl),
        gate_aux=jax.tree.map(lambda a: _put_global(a, repl), zstate.gate_aux),
        key=_put_global(zstate.key, repl))
    return zstate, ZeroCtx(axis=axis, unravel=unravel, n_params=n)


def unshard_train_state(zstate: TrainState, zc: ZeroCtx) -> TrainState:
    """Inverse of :func:`shard_train_state`: back to a replicated pytree state.

    The sharded leaves are global arrays, so this is just an unravel of the
    first n_params entries (one gather per leaf on fetch)."""
    flat = jnp.asarray(zstate.params)[:zc.n_params]
    params, var_params = zc.unravel(flat)
    return zstate.replace(params=params, var_params=var_params,
                          m=zstate.m[:zc.n_params], v=zstate.v[:zc.n_params])


def make_zero_sharded_chunk_runner(mesh: Mesh, ph: PhaseSpec, masks,
                                   steps_per_chunk: int, zc: ZeroCtx,
                                   use_space: bool = True,
                                   local_decode: bool = False):
    """jit(shard_map(scan(step))) with MODEL STATE sharded over 'space'.

    Same data path as :func:`make_sharded_chunk_runner` (positions
    data-parallel, GT volume x-slab-sharded), but state.params/m/v enter as
    per-device shards; the step all_gathers params once over ICI and
    reduce-scatters the gradient (see trainer.ZeroCtx).  State must come from
    :func:`shard_train_state`.
    """
    sc = make_shard_ctx(mesh, use_space, local_decode)
    vol_spec = P('space') if sc.space_axis else P()

    def chunk_body(state: TrainState, volume: jax.Array):
        return _scan_chunk(ph, masks, sc, steps_per_chunk, state, volume,
                           zero_ctx=zc)

    state_spec = TrainState(
        params=P(zc.axis), var_params=P(), m=P(zc.axis), v=P(zc.axis),
        step=P(), lr=P(), shadow_lr=P(), last_loss=P(), no_gain=P(),
        stop=P(), weight_dkl=P(), gate_aux=P(), key=P())
    sharded = jax.shard_map(
        chunk_body, mesh=mesh,
        in_specs=(state_spec, vol_spec),
        out_specs=(state_spec, P()),
        check_vma=False,
    )

    def run(state: TrainState, volume: jax.Array):
        st, metrics = sharded(state, volume)
        metrics = dict(metrics)
        metrics['_stop'] = st.stop
        metrics['_step'] = st.step
        return st, metrics

    return jax.jit(run)


def comm_volume_per_step(n_params: int, data: int, space: int,
                         shard_params: bool = False,
                         bytes_per_el: int = 4) -> dict:
    """Analytic per-step inter-chip communication volume (bytes).

    Single-chip image: real multi-chip wall-clock cannot be measured here,
    but the collective traffic is fully determined by the design, so this
    bounds scaling cost (SURVEY §2.3).  Ring-collective cost model: an
    all-reduce of B bytes over an n-device ring moves 2*B*(n-1)/n per
    device; all_gather / reduce_scatter move B*(n-1)/n each.

    Replicated mode: ONE fused all-reduce of the flat gradient over all
    devices (the loss/aux scalar pmeans are noise).  ZeRO mode: params
    all_gather over 'space' + psum_scatter over 'space' FIRST, then a
    pmean over 'data' of the 1/space-sized local shard (the trainer orders
    it this way on purpose — scatter-last would all-reduce the full vector
    over 'data': +2P(data-1)/data vs +2(P/space)(data-1)/data bytes).
    With that order ZeRO traffic equals the replicated all-reduce volume
    at data=1 and is strictly below it otherwise, while storing 1/space of
    the state.
    """
    n = data * space
    P = n_params * bytes_per_el
    if not shard_params:
        per_dev = 2.0 * P * (n - 1) / n if n > 1 else 0.0
        return {'allreduce_grad': per_dev, 'total_per_device': per_dev}
    ag = P * (space - 1) / space if space > 1 else 0.0
    rs = P * (space - 1) / space if space > 1 else 0.0
    ar_data = (2.0 * (P / space) * (data - 1) / data) if data > 1 else 0.0
    total = ag + rs + ar_data
    return {'allgather_params': ag, 'reduce_scatter_grad': rs,
            'allreduce_local_grad_data': ar_data, 'total_per_device': total}


def solve_phase_sharded(mesh: Mesh, ph: PhaseSpec, state: TrainState,
                        volume: jax.Array, steps_per_chunk: int, masks=None,
                        use_space: bool = True, writer=None, verbose=True,
                        shard_params: bool = False,
                        local_decode: bool = False):
    """Sharded analogue of trainer.solve_phase (thin delegate)."""
    from ..train.trainer import solve_phase
    return solve_phase(ph, state, volume, steps_per_chunk, masks=masks,
                       writer=writer, verbose=verbose, mesh=mesh,
                       use_space=use_space, shard_params=shard_params,
                       local_decode=local_decode)
