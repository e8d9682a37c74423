"""Tracing and profiling — first-class harness features.

The reference ships none (SURVEY.md §5: no profiler, no timers anywhere).
Here:

  * :class:`StepTimer` — wall-clock per-step timing with percentile
    summaries and a throughput readout.  IMPORTANT: on asynchronous
    backends, ``mark_step`` must be given a device scalar to read back —
    dispatch returns immediately and only a host transfer is a true sync
    point (this environment's tunneled TPU even returns early from
    ``block_until_ready``; see bench.py).
  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable XPlane trace directory.
  * :func:`annotate` — named trace spans (``jax.profiler.TraceAnnotation``)
    for host-side phases (data loading vs step vs eval).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import numpy as np


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._last: float | None = None
        self._seen = 0

    def mark_step(self, sync_value: Any = None) -> float | None:
        """Call once per step; returns the latest step time (seconds).

        ``sync_value``: a device scalar (e.g. the loss) — it is read back
        to the host so the timestamp reflects completed execution."""
        if sync_value is not None:
            float(sync_value)
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            self._seen += 1
            if self._seen > self.warmup:
                dt = now - self._last
                self.times.append(dt)
        self._last = now
        return dt

    def summary(self, items_per_step: int | None = None) -> dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        out = {
            "step_ms_p50": float(np.percentile(arr, 50) * 1e3),
            "step_ms_p90": float(np.percentile(arr, 90) * 1e3),
            "step_ms_mean": float(arr.mean() * 1e3),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
        if items_per_step:
            out["items_per_sec"] = float(items_per_step / arr.mean())
        return out

    def reset(self) -> None:
        self.times.clear()
        self._last = None
        self._seen = 0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device+host profile into ``log_dir`` (XPlane format,
    loadable in TensorBoard's profile plugin / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict[str, int]:
    """Per-device live-bytes snapshot (empty when the backend lacks it)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[str(d)] = int(stats.get("bytes_in_use", 0))
    return out
