"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference).

* ``trace(logdir)`` — context manager around ``jax.profiler`` device traces
  (view in TensorBoard / Perfetto).
* ``StepTimer`` — lightweight per-step wall-clock stats with warmup skip.
* ``annotate`` — named TraceAnnotation for profile readability.
* ``MetricsLogger`` — structured JSONL metrics stream (SURVEY.md §5.5):
  one JSON object per event, flushed per write (atomic-append durability).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, List, Optional


@contextlib.contextmanager
def trace(logdir: str, with_memory: bool = True):
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step statistics, skipping compile/warmup steps."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self._times: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.skip_first:
            self._times.append(dt)

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        ts = sorted(self._times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(int(n * 0.9), n - 1)],
            "min_s": ts[0],
            "max_s": ts[-1],
        }


class MetricsLogger:
    """Append-only JSONL metric stream + stdout echo."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, event: str, **fields: Any):
        rec = {"event": event, "time": time.time(), **fields}
        line = json.dumps(rec, default=float)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.echo:
            print(line, flush=True)
