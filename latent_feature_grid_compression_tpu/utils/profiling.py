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
        self._chunks: List[tuple] = []   # (n_steps, seconds, is_compile)

    @contextlib.contextmanager
    def chunk(self, n_steps: int, compile: bool = False):
        """Time one chunk dispatch; compile=True marks chunks whose wall time
        includes a jit compile (each phase's first dispatch) — they are
        reported separately, not mixed into the steady-state rate."""
        t0 = time.perf_counter()
        yield
        self._chunks.append((n_steps, time.perf_counter() - t0, compile))

    def stats(self) -> Dict[str, float]:
        if not self._chunks:
            return {}
        body = [c for c in self._chunks if not c[2]] or self._chunks
        steps = sum(n for n, _, _ in body)
        secs = sum(s for _, s, _ in body)
        return {
            'steps_per_sec': steps / secs if secs else 0.0,
            'samples_per_sec': steps * self.samples_per_step / secs if secs else 0.0,
            'ms_per_step': secs / steps * 1e3 if steps else 0.0,
            'compile_chunks_sec': sum(s for _, s, c in self._chunks if c),
        }
