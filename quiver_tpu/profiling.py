"""Tracing / profiling utilities.

The reference wraps every kernel phase in compile-time ``TRACE_SCOPE``
macros (trace.hpp:6-14, enabled via QUIVER_ENABLE_TRACE) plus ad-hoc
wall-clock timers (timer.hpp); serving keeps avg/p99 accounting
(serving.py:307-323). The TPU equivalents:

  * ``trace_scope`` — ``jax.profiler.TraceAnnotation`` + wall-clock, so
    phases show up both in XLA profiler traces and in the in-process
    timing table;
  * ``Timings`` — the scoped-timer aggregate (count/total/avg per name);
  * ``start_server`` — the jax.profiler HTTP server for tensorboard.

Serving-side p99/throughput accounting lives in
``quiver_tpu.serving.ServerMetrics``.
"""
from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

__all__ = ["Timings", "trace_scope", "timings", "start_server"]


class Timings:
    """Thread-safe named wall-clock aggregates (reference timer.hpp)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._acc = defaultdict(lambda: [0, 0.0])  # name -> [count, total_s]

    def add(self, name: str, seconds: float):
        with self._lock:
            slot = self._acc[name]
            slot[0] += 1
            slot[1] += seconds

    def summary(self) -> dict:
        with self._lock:
            return {name: {"count": c, "total_s": t, "avg_ms": t / c * 1e3}
                    for name, (c, t) in self._acc.items()}

    def reset(self):
        with self._lock:
            self._acc.clear()


timings = Timings()  # process-global default, like the reference's tracer


@contextlib.contextmanager
def trace_scope(name: str, sink: Timings = None):
    """Annotate a phase for the XLA profiler AND record wall time."""
    import jax

    sink = sink or timings
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    sink.add(name, time.perf_counter() - t0)


def start_server(port: int = 9999):
    """Start the jax.profiler server (connect with TensorBoard)."""
    import jax

    return jax.profiler.start_server(port)
