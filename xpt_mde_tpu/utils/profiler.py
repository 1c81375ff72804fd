"""Profiling & tracing utilities.

The reference's observability was bespoke prints (shape_check decorator,
DurationTime, quantile dumps -- SURVEY.md §5). TPU-native replacements:

- ``trace(dir)``: jax.profiler trace context around a training window;
  view with TensorBoard/XProf;
- ``profiler_server(port)``: live on-demand capture endpoint;
- ``annotate(name)``: TraceAnnotation for named regions inside steps;
- ``shape_check``: opt-in decorator printing arg/return shapes (the
  reference's utils/decorators.py:5-51), free of tracing side effects --
  shapes are static under jit so this prints once per trace.
"""

from __future__ import annotations

import functools
import os
from contextlib import contextmanager

import jax

ENABLE_SHAPE_DECOR = os.environ.get("XPT_SHAPE_DECOR", "0") == "1"


@contextmanager
def trace(log_dir: str):
    """Capture a device trace into ``log_dir`` (open with xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profiler_server(port: int = 9999):
    """Start the live profiler endpoint; returns the server object."""
    return jax.profiler.start_server(port)


def annotate(name: str):
    """Named region visible in device traces."""
    return jax.profiler.TraceAnnotation(name)


def _shape_of(x):
    return getattr(x, "shape", None)


def shape_check(func):
    """Print tensor arg/return shapes when XPT_SHAPE_DECOR=1
    (utils/decorators.py role). Identity otherwise."""
    if not ENABLE_SHAPE_DECOR:
        return func

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        shapes = [s for s in (_shape_of(a) for a in args) if s is not None]
        out = func(*args, **kwargs)
        out_shapes = [_shape_of(o) for o in
                      (out if isinstance(out, (tuple, list)) else [out])]
        print(f"[shape_check] {func.__qualname__}: in={shapes} "
              f"out={out_shapes}")
        return out

    return wrapper
