"""Profiling hooks (SURVEY.md §5: the reference has no timing/profiling
instrumentation at all; the TPU equivalent is ``jax.profiler`` traces).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ost_profile"):
    """Capture a ``jax.profiler`` trace of the enclosed solves (view in
    TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer(result: dict, key: str = "seconds", fence=None):
    """Wall-clock a block; pass ``fence`` (an array or pytree) to force a
    device->host readback before stopping the clock — the only reliable
    execution fence on relayed device backends."""
    import numpy as np

    t0 = time.perf_counter()
    yield
    if fence is not None:
        jax.tree.map(lambda a: np.asarray(a), fence)
    result[key] = time.perf_counter() - t0
