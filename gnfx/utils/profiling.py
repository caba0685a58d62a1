"""Tracing / profiling (SURVEY.md §5).

The reference had at most TensorBoard summaries; here:
  * `trace_context(dir)` — `jax.profiler.trace` wrapper emitting
    TensorBoard/Perfetto traces of device execution;
  * `jax.named_scope` annotations live in the compute path (flow/GNN);
  * `StepTimer` — host-side steps/s/chip + graphs/s counters, the
    BASELINE.json north-star metrics, with batched device syncs.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_context(log_dir: str, *, enabled: bool = True):
    """Profile everything inside the context into `log_dir` (TensorBoard
    trace viewer / Perfetto). No-op when disabled."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def start_profiler_server(port: int = 9999):
    """On-demand profiling: connect TensorBoard's profile tab to this port."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Throughput counter: call `tick()` once per step (no device sync);
    `rate(sync_on=x)` blocks on `x` (one batched sync) and returns steps/s
    since the last rate() call."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    def rate(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        now = time.perf_counter()
        dt = now - self._t0
        r = self._steps / dt if dt > 0 else 0.0
        self._t0 = now
        self._steps = 0
        return r
