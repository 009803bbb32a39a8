"""Reliable device timing.

In this environment the TPU is reached through a tunnel whose
block_until_ready can return before execution finishes, so every
measurement is fenced with a tiny host readback (np.asarray of one
element), which cannot complete until all producing work has run.
"""

from __future__ import annotations

import time

import numpy as np


def _fence(x):
    leaves = [l for l in __import__("jax").tree_util.tree_leaves(x) if hasattr(l, "shape")]
    for l in leaves[-1:]:
        np.asarray(l.ravel()[:1] if l.ndim else l)


def measure(fn, *, iters: int = 10, warmup: int = 2) -> float:
    """Median-of-one batched timing: run `iters` calls then fence once.

    Returns seconds per call (includes one readback RTT amortized over
    iters; pick iters so op_time * iters >> RTT).
    """
    for _ in range(warmup):
        _fence(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    _fence(out)
    return (time.perf_counter() - t0) / iters


def measure_fenced(fn, *, iters: int = 5, warmup: int = 2) -> float:
    """Per-call fenced timing (upper bound; includes readback RTT)."""
    for _ in range(warmup):
        _fence(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))
