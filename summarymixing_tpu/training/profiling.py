"""Profiling and observability utilities (SURVEY.md §5: the reference has
none in-repo; this build ships jax.profiler traces + step-time stats).

- trace(): context manager around jax.profiler.trace for device traces
  (view in TensorBoard / xprof).
- StepTimer: rolling wall-time stats for the training loop, robust to the
  async dispatch (measures time between synchronisation points).
- device_memory_stats(): live HBM usage per device where the backend
  exposes it.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace("/tmp/trace"): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    window: int = 100
    _times: List[float] = field(default_factory=list)
    _last: Optional[float] = None

    def tick(self) -> Optional[float]:
        """Call once per step (after blocking on step outputs). Returns the
        last step duration in seconds."""
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)
        n = len(ts)
        return {
            "steps_per_sec": 1.0 / (sum(ts) / n),
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(n - 1, int(n * 0.9))],
            "max_s": ts[-1],
        }


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = dict(d.memory_stats() or {})
        except Exception:
            out[str(d)] = {}
    return out
