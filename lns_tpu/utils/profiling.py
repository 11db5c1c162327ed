"""Profiling & timing helpers (SURVEY.md section 5: the reference has no
tracing/profiling at all — these are the TPU-native equivalents).

- `trace(logdir)`: context manager around jax.profiler (Perfetto/XPlane
  traces viewable in TensorBoard or ui.perfetto.dev).
- `Timer`: per-step wall-clock accounting with correct device sync.
- `time_fn`: robust kernel timing that works through the axon tunnel
  (block_until_ready is unreliable there): chains N executions inside one
  jitted fori_loop with a data-dependent carry, fetches a scalar, and
  subtracts host RTT — the same protocol bench.py uses.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulates per-section wall times; call `sync()` on a device value
    before stopping a section when timing device work."""

    def __init__(self):
        self.totals = {}
        self._starts = {}

    def start(self, name: str):
        self._starts[name] = time.perf_counter()

    def stop(self, name: str, sync_value=None):
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - self._starts[name]

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.3f}s" for k, v in sorted(self.totals.items()))


def measure_host_rtt(reps: int = 5) -> float:
    @jax.jit
    def triv(x):
        return x + 1.0

    x = jnp.zeros(())
    np.asarray(triv(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(triv(x))
    return (time.perf_counter() - t0) / reps


def time_fn(fn: Callable, carry, n: int = 10, rtt: Optional[float] = None) -> float:
    """Seconds per invocation of `fn` (carry -> carry, same pytree type),
    measured by chaining n invocations inside one jitted loop."""
    chained = jax.jit(lambda c, k: jax.lax.fori_loop(0, k, lambda i, c: fn(c), c))
    if rtt is None:
        rtt = measure_host_rtt()
    np.asarray(jax.tree.leaves(chained(carry, 1))[0]).ravel()[:1]  # compile
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(chained(carry, n))[0]).ravel()[:1]
    dt = time.perf_counter() - t0 - rtt
    return max(dt, 0.0) / n
