"""Tracing/profiling utilities (new surface — the reference has a single
wall-clock timer, ``main.cpp:72-78``; SURVEY.md §5 calls for JAX profiler
traces + per-stage timers in the rebuild).

Stage timers live in ``pipeline.RunStats.stage_seconds``; this module adds
JAX profiler trace capture and a simple device-step timing harness.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(outdir: str | None):
    """Capture a JAX profiler trace (view with TensorBoard / xprof).

    Usage: ``with profiling.trace("/tmp/raft_trace"): run_pipeline(...)``
    No-op when outdir is falsy.
    """
    if not outdir:
        yield
        return
    import jax
    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jit(fn, *args, iters: int = 10, warmup: int = 2, **kw):
    """Best-of timing for a jitted callable (blocks on all outputs)."""
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best
