"""Multi-host initialization + host-invariant training entry.

Green-field (the reference is single-process; SURVEY.md §5.8).  On a multi-
host TPU slice:

  * jax.distributed.initialize() per host (coordinator from env/flags)
  * one global ('data', 'space') mesh over all devices
  * model/optimizer state replicated; positions per-device (PRNG folded by
    linear mesh index, so sampling statistics are invariant to host count)
  * gradient pmean over ICI within the jitted step

Use :func:`initialize_distributed` once at process start, then build the mesh
with parallel.make_mesh(devices=jax.devices()) — jax.devices() returns the
global device list after initialization.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed if a multi-host environment is detected.

    Explicit args override env (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID).  Returns True if distributed mode was initialized.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        'JAX_COORDINATOR_ADDRESS')
    if num_processes is None and 'NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['NUM_PROCESSES'])
    if process_id is None and 'PROCESS_ID' in os.environ:
        process_id = int(os.environ['PROCESS_ID'])

    if coordinator_address is None and num_processes in (None, 1):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def host_local_batch(global_batch: int) -> int:
    """Per-host share of the global batch (must divide evenly)."""
    import jax
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
