"""Hierarchical operator wall-time accumulator.

TPU analog of the reference's CUDA-event timer (svg/timer.py:6-74): labels
accumulate across calls; enable with env TIME_BENCH (1 = accumulate,
2 = print+clear on report()). Since jitted regions fuse, label boundaries
here are host-visible boundaries (per denoise step / per module call) —
fence with a tiny readback so async dispatch doesn't lie. For intra-program
profiles use jax.profiler traces instead.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager

import numpy as np

_LOG = defaultdict(float)
_COUNT = defaultdict(int)


def enabled() -> bool:
    return os.environ.get("TIME_BENCH", "0") != "0"


def _fence(x):
    if x is None:
        return
    import jax

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
            break


@contextmanager
def time_logging(label: str, fence_on=None):
    """Context manager; also usable as decorator via time_logging_decorator."""
    if not enabled():
        yield
        return
    t0 = time.perf_counter()
    yield
    _fence(fence_on)
    _LOG[label] += time.perf_counter() - t0
    _COUNT[label] += 1


def time_logging_decorator(label: str):
    def deco(fn):
        def wrapped(*a, **k):
            if not enabled():
                return fn(*a, **k)
            t0 = time.perf_counter()
            out = fn(*a, **k)
            _fence(out)
            _LOG[label] += time.perf_counter() - t0
            _COUNT[label] += 1
            return out

        return wrapped

    return deco


def print_operator_log_data(clear: bool | None = None):
    """Print accumulated label times (svg/timer.py:43-74 analog)."""
    if clear is None:
        clear = os.environ.get("TIME_BENCH", "0") == "2"
    for label in sorted(_LOG):
        print(f"{label}: {_LOG[label]*1e3:10.2f} ms  (x{_COUNT[label]})")
    if clear:
        _LOG.clear()
        _COUNT.clear()


def get_log():
    return dict(_LOG), dict(_COUNT)


@contextmanager
def profiler_trace(logdir: str = "/tmp/svt_trace", *, host: bool = False):
    """Capture a jax.profiler device trace (TensorBoard/XProf format).

    The intra-program companion to the label timer above (SURVEY section 5:
    the reference's CUDA-event hierarchy maps to jax.profiler traces +
    jax.named_scope on TPU — kernel-level times live in the trace, not in
    host wall-clock labels)."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=False, create_perfetto_trace=host)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotation scope visible in profiler traces (jax.named_scope)."""
    import jax

    return jax.named_scope(name)
