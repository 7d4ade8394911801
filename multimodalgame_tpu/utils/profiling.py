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
    """Accumulates wall times and reports per-step summaries.

    Each ``start``/``stop`` pair records one timed span covering ``steps``
    optimizer updates (default 1) — the chunked driver (game/driver.py)
    times a whole device-side chunk per span, so throughput is reported
    per *step*, not per dispatch."""

    def __init__(self):
        self._times: List[tuple] = []  # (seconds, steps)
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, steps: int = 1) -> None:
        if self._t0 is not None:
            self._times.append((time.perf_counter() - self._t0, steps))
            self._t0 = None

    def cancel(self) -> None:
        """Discard the currently running span without recording it."""
        self._t0 = None

    @property
    def running(self) -> bool:
        return self._t0 is not None

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
        secs = np.asarray([t for t, _ in self._times])
        steps = np.asarray([n for _, n in self._times])
        per_step = secs / np.maximum(steps, 1)
        total = float(secs.sum())
        n = int(steps.sum())
        return {
            "steps": n,
            "mean_ms": float(total / max(n, 1) * 1e3),
            "p50_ms": float(np.percentile(per_step, 50) * 1e3),
            "p95_ms": float(np.percentile(per_step, 95) * 1e3),
            "steps_per_sec": float(n / total) if total > 0 else 0.0,
        }

    def reset(self) -> None:
        self._times.clear()
