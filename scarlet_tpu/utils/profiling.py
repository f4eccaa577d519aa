"""Profiling and timing helpers (SURVEY §5.1: the reference has only coarse
``time.time()`` wall-clock timing in its regression harness,
scarlet/testing/deblend.py:36-59; the TPU rebuild wires the JAX profiler
plus device-synchronized timing instead).

The ``sync``/``timeit`` helpers fetch a scalar value from the result rather
than calling ``block_until_ready``: on tunneled TPU backends (axon) the
latter can return before remote execution completes, producing bogus
timings.
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["trace", "annotate", "sync", "timeit"]


@contextlib.contextmanager
def trace(logdir):
    """Capture a JAX/XLA profiler trace into ``logdir`` (viewable with
    TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region that shows up on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def sync(tree):
    """Force completion of all arrays in ``tree`` and return it.

    Fetches one element per leaf, which round-trips through the device
    queue — reliable on backends where ``block_until_ready`` is advisory.
    """
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel"):
            float(jnp.asarray(leaf).ravel()[0])
    return tree


def timeit(fn, *args, iters=5, warmup=1, **kwargs):
    """Median seconds per call of ``fn(*args, **kwargs)``, device-synced.

    The warmup calls absorb compilation; each timed call ends with a value
    fetch so queued device work is included.
    """
    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
