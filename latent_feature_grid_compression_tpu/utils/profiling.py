"""Profiling / tracing helpers (the reference has none — SURVEY.md §5.1).

Wraps jax.profiler for TPU trace capture plus a simple wall-clock step timer
whose results land in TensorBoard and the info artifacts.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) if
    log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Wall-clock timing of chunk dispatches -> samples/sec statistics."""

    def __init__(self, samples_per_step: int):
        self.samples_per_step = samples_per_step
        self._chunks: List[tuple] = []   # (n_steps, seconds)

    @contextlib.contextmanager
    def chunk(self, n_steps: int):
        t0 = time.perf_counter()
        yield
        self._chunks.append((n_steps, time.perf_counter() - t0))

    def stats(self) -> Dict[str, float]:
        if not self._chunks:
            return {}
        # skip the first chunk (compile)
        body = self._chunks[1:] if len(self._chunks) > 1 else self._chunks
        steps = sum(n for n, _ in body)
        secs = sum(s for _, s in body)
        return {
            'steps_per_sec': steps / secs if secs else 0.0,
            'samples_per_sec': steps * self.samples_per_step / secs if secs else 0.0,
            'ms_per_step': secs / steps * 1e3 if steps else 0.0,
            'compile_plus_first_chunk_sec': self._chunks[0][1],
        }
