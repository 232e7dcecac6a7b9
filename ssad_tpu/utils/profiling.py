"""Profiling and runtime introspection.

The reference explicitly disables profiling (tools.py:218-219) and has
no runtime introspection beyond tqdm bars (SURVEY.md §5.1).  Here:

* `trace(logdir)` — context manager around jax.profiler (XPlane traces
  readable with TensorBoard / xprof);
* `StepTimer` — wall-clock per-step stats with device sync, reporting
  mean/p50/p95 and throughput;
* `device_memory_stats()` — live per-device HBM usage.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with profiling.trace('/tmp/tb'): step()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times (with an optional sync object)."""

    def __init__(self, items_per_step: int = 1):
        self.items_per_step = items_per_step
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        assert self._t0 is not None, "start() before stop()"
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @contextlib.contextmanager
    def step(self, sync_fn=None):
        self.start()
        box = {}
        yield box
        self.stop(box.get("sync"))

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "steps": len(self.times),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
            "items_per_sec": float(self.items_per_step / t.mean()),
        }


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory usage in MiB (empty when the backend does not
    expose memory_stats, e.g. CPU)."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use_mib": stats.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_in_use_mib": stats.get("peak_bytes_in_use", 0) / 2**20,
            }
    return out
