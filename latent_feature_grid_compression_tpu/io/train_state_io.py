"""Mid-training checkpoint/resume of the full TrainState.

The reference can only warm-start model weights (no optimizer/step state,
SURVEY.md §5.4); here the complete training state — params, Adam moments,
step counters, lr/strategy scalars, gate aux, PRNG key — round-trips, so a
run resumes exactly where it stopped.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_state(state) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree.flatten(state)
    keys = set()
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, 'dtype') and jnp.issubdtype(leaf.dtype,
                                                     jax.dtypes.prng_key):
            leaves[i] = jax.random.key_data(leaf)
            keys.add(i)
    # ONE batched device_get: per-leaf np.asarray would pay a full host
    # round-trip per leaf (~60 leaves), which dominates on remote-TPU setups
    leaves = jax.device_get(leaves)
    return {f'leaf_{i}__key' if i in keys else f'leaf_{i}': np.asarray(leaf)
            for i, leaf in enumerate(leaves)}


def save_train_state(path: str, state) -> None:
    np.savez(path, **_flatten_state(state))


def load_train_state(path: str, template):
    """Load into the pytree structure of ``template`` (same phase/config)."""
    leaves, treedef = jax.tree.flatten(template)
    with np.load(path) as z:
        new_leaves = []
        for i, leaf in enumerate(leaves):
            if f'leaf_{i}__key' in z:
                # wrap with the template's PRNG impl (rbg keys carry 4 words,
                # threefry 2 — wrap_key_data defaults to threefry otherwise)
                impl = jax.random.key_impl(leaf)
                new_leaves.append(jax.random.wrap_key_data(
                    jnp.asarray(z[f'leaf_{i}__key']), impl=impl))
            else:
                arr = jnp.asarray(z[f'leaf_{i}'])
                assert arr.shape == jnp.shape(leaf), (i, arr.shape, jnp.shape(leaf))
                new_leaves.append(arr.astype(leaf.dtype))
    return jax.tree.unflatten(treedef, new_leaves)
