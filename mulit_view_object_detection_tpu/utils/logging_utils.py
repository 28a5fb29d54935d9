"""Observability: metrics logging + profiling.

The reference's observability is TensorBoard scalars + debug prints
(SURVEY.md §5). Here: a JSONL metrics writer (tooling-agnostic), named
scopes around pipeline stages, and jax.profiler trace capture for TPU
performance work.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class MetricsLogger:
    """Append-only JSONL metrics log: one {step, time, **metrics} per line."""

    def __init__(self, log_dir, filename="metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._f = open(self.path, "a", buffering=1)

    def log(self, step, **metrics):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()


@contextlib.contextmanager
def profile_trace(log_dir):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"{name}: {time.perf_counter() - t0:.3f}s")
