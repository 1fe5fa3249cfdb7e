"""Tracing / profiling helpers.

Upgrades the reference's minimal tracing (reference: utils/time_decorator.py:4-15,
a wall-clock decorator, unused by the main path) with the same decorator surface
plus first-class JAX profiler integration (SURVEY.md §5.1).
"""
from __future__ import annotations

import contextlib
import time
from functools import wraps
from typing import Callable, Optional


def time_this(fn: Optional[Callable] = None, *, log: Optional[dict] = None):
    """Wall-clock timing decorator (reference time_decorator semantics).

    Blocks on jax arrays in the result so async dispatch doesn't fake the number.
    With ``log`` given, appends durations under the function's name.
    """
    def deco(f):
        @wraps(f)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = f(*args, **kwargs)
            try:
                import jax
                jax.block_until_ready(out)
            except Exception:
                pass
            dt = time.perf_counter() - t0
            if log is not None:
                log.setdefault(f.__name__, []).append(dt)
            else:
                print(f"{f.__name__}: {dt:.4f}s")
            return out
        return wrapper
    return deco(fn) if fn is not None else deco


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces (TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
