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


def op_profile(fn, *args, top: int = 20, trace_dir: str = "/tmp/ost_opprof"):
    """Run ``fn(*args)`` under a profiler trace and return the op-level
    self-time table as a list of dicts, most expensive first.

    This is the workhorse behind every hot-loop optimization in this repo:
    piece-wise wall timings through a relayed backend are dominated by the
    ~30 ms dispatch floor and subtractive ablations are confounded by
    data-dependent trip counts — the xprof op table is the only reliable
    attribution (it parses the raw xplane protobufs from
    ``jax.profiler.trace``; no TensorBoard needed).  Requires the ``xprof``
    package (present in this environment; gated import).

    Example::

        rows = op_profile(jax.jit(solve), x0)
        for r in rows[:10]:
            print(r["self_us"], r["occurrences"], r["name"])
    """
    import glob
    import json as _json
    import os
    import shutil

    import numpy as np

    try:
        from xprof.convert import raw_to_tool_data
    except ImportError as exc:  # pragma: no cover - xprof is installed here
        raise ImportError(
            "op_profile needs the `xprof` package (pip install xprof)"
        ) from exc

    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        # device->host readback: the only reliable fence through a relay
        jax.tree.map(lambda a: np.asarray(a), out)
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "framework_op_stats", {"tqx": "out:json;"})
    table = _json.loads(data if isinstance(data, str) else data.decode())[0]
    cols = [c["label"] for c in table["cols"]]
    idx = {label: i for i, label in enumerate(cols)}

    def cell(row, label):
        return row["c"][idx[label]].get("v")

    rows = []
    for r in table["rows"]:
        rows.append({
            "host_or_device": cell(r, "Host/device"),
            "type": cell(r, "Operation Type"),
            "name": cell(r, "Operation Name"),
            "occurrences": int(cell(r, "#Occurrences") or 0),
            "total_us": float(cell(r, "Total time (us)") or 0.0),
            "self_us": float(cell(r, "Total self-time (us)") or 0.0),
            "bound_by": cell(r, "Bound by"),
        })
    rows.sort(key=lambda d: -d["self_us"])
    return rows[:top]


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
