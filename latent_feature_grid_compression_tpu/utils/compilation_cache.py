"""Persistent XLA compilation cache for the CLIs and benchmarks.

The fused scanned train step is expensive to compile (the remote-TPU
platform in particular pays minutes on first compile); enabling JAX's
persistent compilation cache makes every repeat invocation of train.py /
infer.py / bench.py with the same shapes start in seconds instead.

Call :func:`enable_compilation_cache` before the first jit dispatch.  Safe
to call multiple times; a no-op if the cache dir cannot be created.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    '.jax_cache')


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Point JAX at an on-disk compilation cache; returns True on success."""
    cache_dir = cache_dir or os.environ.get('LFGC_JAX_CACHE_DIR',
                                            DEFAULT_CACHE_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
        return True
    except Exception:
        return False
