"""Tracing / profiling hooks (SURVEY §5.1).

The reference has no profiler; its nearest analogs are the sparkline and
entropy diagnostics. Here profiling is a first-class subsystem:

* ``trace(dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace.
* ``StepTimer`` — lightweight wall-clock step timing with percentile
  summaries, designed for the axon tunnel where ``block_until_ready`` is
  unreliable (synchronization via forced host transfer is the caller's
  job; the timer just aggregates).

The training driver enables these when ``MMG_PROFILE_DIR`` is set (trace)
and always keeps a StepTimer whose summary is logged at the end of every
epoch.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace into ``log_dir`` (or
    ``$MMG_PROFILE_DIR``); no-op when neither is set."""
    log_dir = log_dir or os.environ.get("MMG_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Accumulates per-step wall times and reports summaries."""

    def __init__(self):
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self._times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    @property
    def count(self) -> int:
        return len(self._times)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        import numpy as np
        a = np.asarray(self._times)
        return {
            "steps": int(a.size),
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p95_ms": float(np.percentile(a, 95) * 1e3),
            "steps_per_sec": float(1.0 / a.mean()),
        }

    def reset(self) -> None:
        self._times.clear()
