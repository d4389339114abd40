"""Profiling and timing harness.

The reference has no tracing/profiling subsystem (SURVEY.md §5: ad-hoc
``time.time()`` prints).  Here: a ``jax.profiler`` trace context for device
timelines (view in TensorBoard/Perfetto), a steady-state timer that
separates compile from run, and a tiny named-section registry for
per-component accounting like the one used to drive the rasterizer
optimization work.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def device_trace(logdir: str | Path):
    """``jax.profiler`` trace context: captures XLA device timelines."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn, *args, iters: int = 10, warmup: int = 1,
                name: str | None = None, log=print):
    """Compile-then-time a jittable callable.

    Returns (mean_seconds, result_of_last_call).  Blocks on device
    completion, so numbers are wall-clock per call including dispatch.
    """
    jf = jax.jit(fn) if not hasattr(fn, "lower") else fn
    t0 = time.perf_counter()
    out = jf(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        out = jf(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    jax.block_until_ready(out)
    mean_s = (time.perf_counter() - t0) / iters
    if name and log:
        log(f"{name}: {mean_s * 1e3:.2f} ms/call (first call {compile_s:.1f}s)")
    return mean_s, out


class Timer:
    """Named-section wall-clock accumulator (host-side, blocking)."""

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            k: {"total_s": v, "calls": self.counts[k],
                "mean_ms": 1e3 * v / self.counts[k]}
            for k, v in sorted(self.totals.items(),
                               key=lambda kv: -kv[1])
        }

    def report(self, log=print):
        for k, v in self.summary().items():
            log(f"{k:32s} {v['mean_ms']:9.2f} ms × {v['calls']}")

    def dump(self, path: str | Path):
        Path(path).write_text(json.dumps(self.summary(), indent=2))
