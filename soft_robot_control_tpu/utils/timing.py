"""Timing / profiling utilities.

The reference instruments with ad-hoc time.time() deltas and per-solve
OSQP solve_time accumulation (SURVEY.md §5). Here:
- `Timer`: accumulating wall-clock timer with min/mean/max stats, the
  structured replacement for the controllers' solve_times lists;
- `trace(path)`: context manager around jax.profiler for real device
  traces (viewable in TensorBoard / Perfetto);
- `block_time(fn, *args)`: wall-clock of one call including device sync.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import jax


class Timer:
    def __init__(self):
        self.samples = defaultdict(list)
        self._start = {}

    def start(self, name: str):
        self._start[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._start.pop(name)
        self.samples[name].append(dt)
        return dt

    @contextlib.contextmanager
    def section(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def stats(self, name: Optional[str] = None) -> dict:
        names = [name] if name else list(self.samples)
        out = {}
        for n in names:
            s = self.samples[n]
            if not s:
                continue
            out[n] = {"min": min(s), "mean": sum(s) / len(s), "max": max(s),
                      "count": len(s), "total": sum(s)}
        return out[name] if name else out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_time(fn, *args, **kwargs) -> float:
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return time.perf_counter() - t0
