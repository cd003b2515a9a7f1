"""Tracing/profiling helpers (the reference has only wall-clock prints —
SURVEY §5; here: jax.profiler traces + stage timers with the same elapsed-time
UX on top)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def stage_timer(name: str, *, out: list | None = None):
    """Coarse stage timing with the reference's elapsed-time print UX."""
    ts = time.time()
    yield
    te = time.time()
    print("Elasped time: {0:f}s".format(te - ts))  # reference spelling
    if out is not None:
        out.append((name, te - ts))


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace around a block; view with tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
