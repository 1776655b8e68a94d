"""Profiling & timing utilities (SURVEY.md §5: the reference had none;
the rebuild makes tracing + honest device timing first-class).

Two tools:
  * :func:`trace` — context manager around ``jax.profiler`` producing an
    XProf/TensorBoard trace directory.
  * :class:`DeviceTimer` — throughput measurement that is correct on
    backends where ``block_until_ready`` does not synchronize (the remote-
    TPU tunnel used here): it queues executions over distinct inputs and
    fences with a single scalar host readback (device queues are FIFO).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Sequence

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fence(result) -> None:
    """Force completion: host readback of the LAST pytree leaf (callers
    put their small scalar there — see DeviceTimer's docstring)."""
    leaf = jax.tree_util.tree_leaves(result)[-1]
    np.asarray(leaf).ravel()[:1]


class DeviceTimer:
    """Measure sustained time/throughput of a jitted callable.

    ``argsets`` must be a list of distinct pre-staged (on-device) argument
    tuples so no caching layer can elide work.  The callable should return
    something whose last pytree leaf is small (ideally a scalar) — that leaf
    is the only host readback.
    """

    def __init__(self, fn: Callable, argsets: Sequence[tuple],
                 warmup: int = 2):
        self.fn = fn
        self.argsets = list(argsets)
        for i in range(warmup):
            _fence(fn(*self.argsets[i % len(self.argsets)]))

    def measure(self, iters: int = 10) -> float:
        """Mean seconds per call."""
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = self.fn(*self.argsets[i % len(self.argsets)])
        _fence(out)
        return (time.perf_counter() - t0) / iters
