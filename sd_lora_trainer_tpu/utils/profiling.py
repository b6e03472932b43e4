"""Profiling / tracing hooks (SURVEY.md §5: the reference has only wall-clock
counters — main.py:228 prints avg imgs/sec; we add real device traces).

Usage:
    with trace_steps(output_dir, enabled=config.debug):
        state, metrics = step_fn(state, batch, frozen)

Traces open in Perfetto / TensorBoard's profile plugin and show per-op TPU
time, HBM traffic, and fusion boundaries — the profile-and-iterate loop the
scaling playbook prescribes.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator


@contextlib.contextmanager
def trace_steps(output_dir: str, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace around a block of steps."""
    if not enabled:
        yield
        return
    import jax

    trace_dir = os.path.join(output_dir, "profile")
    os.makedirs(trace_dir, exist_ok=True)
    try:
        with jax.profiler.trace(trace_dir):
            yield
    except Exception as e:  # profiling is best-effort on experimental backends
        print(f"[profiling] trace failed: {e}")
        yield


class ThroughputMeter:
    """imgs/sec tracker (the reference's headline counter, main.py:228)."""

    def __init__(self):
        self.start = time.time()
        self.images = 0

    def update(self, n_images: int) -> None:
        self.images += n_images

    @property
    def imgs_per_sec(self) -> float:
        dt = time.time() - self.start
        return self.images / dt if dt > 0 else 0.0
