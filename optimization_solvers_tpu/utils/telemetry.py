"""Observability: structured logging + device-side solve telemetry.

Re-design of the reference L5 layer (``/root/reference/src/tracer.rs``):
the Rust crate installs a ``tracing`` subscriber (stdout layer in
Normal/Json/Pretty format on a non-blocking worker thread, env-filtered via
``RUST_LOG``).  The Python-side equivalent configures the stdlib ``logging``
stack with the same three formats and an ``OST_LOG`` env filter.

Unlike the reference, the solvers themselves run jitted on device, so
per-iteration events can't be log statements on the host path.  Device-side
telemetry instead flows through two mechanisms:

  * the driver's ``callback`` hook (``jax.debug.callback``, mirroring the
    reference's per-iteration callback, ``ls_solver.rs:105-107``) — see
    :func:`log_progress` for a ready-made one;
  * :func:`summarize` — batch-level convergence statistics computed on
    device (converged counts, iteration quantiles, objective quantiles)
    in one reduction, for the host to log after a solve.
"""

from __future__ import annotations

import enum
import json
import logging
import os
import sys
from typing import Optional

import jax.numpy as jnp

from optimization_solvers_tpu.core.types import SolveResult, Status

LOGGER_NAME = "optimization_solvers_tpu"


class LogFormat(enum.Enum):
    """Mirrors the reference ``LogFormat`` (``tracer.rs:7-15``)."""

    NORMAL = "normal"
    JSON = "json"
    PRETTY = "pretty"


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "timestamp": self.formatTime(record),
            "level": record.levelname,
            "target": record.name,
            "fields": {"message": record.getMessage()},
        }
        return json.dumps(payload)


_FORMATS = {
    LogFormat.NORMAL: "%(asctime)s %(levelname)s %(name)s: %(message)s",
    LogFormat.PRETTY: (
        "%(asctime)s %(levelname)s %(name)s\n    at %(pathname)s:%(lineno)d\n"
        "    %(message)s"
    ),
}


class Tracer:
    """Builder-style logging config (``tracer.rs:18-64``).

    >>> Tracer().with_stdout_layer(LogFormat.NORMAL).build()

    The env var ``OST_LOG`` (analogue of ``RUST_LOG``) sets the level:
    ``debug``, ``info`` (default), ``warning``, ``error``, ``trace``.
    """

    def __init__(self):
        self._handlers: list[logging.Handler] = []

    def with_stdout_layer(self, fmt: Optional[LogFormat] = None) -> "Tracer":
        fmt = fmt or LogFormat.NORMAL
        handler = logging.StreamHandler(sys.stdout)
        if fmt is LogFormat.JSON:
            handler.setFormatter(_JsonFormatter())
        else:
            handler.setFormatter(logging.Formatter(_FORMATS[fmt]))
        self._handlers.append(handler)
        return self

    def with_normal_stdout_layer(self) -> "Tracer":
        return self.with_stdout_layer(LogFormat.NORMAL)

    def with_file_layer(self, path: str, fmt: Optional[LogFormat] = None) -> "Tracer":
        """File sink — declared but never wired in the reference
        (``tracer.rs:20-21``); functional here."""
        fmt = fmt or LogFormat.NORMAL
        handler = logging.FileHandler(path)
        if fmt is LogFormat.JSON:
            handler.setFormatter(_JsonFormatter())
        else:
            handler.setFormatter(logging.Formatter(_FORMATS[fmt]))
        self._handlers.append(handler)
        return self

    def build(self) -> logging.Logger:
        logger = logging.getLogger(LOGGER_NAME)
        level_name = os.environ.get("OST_LOG", "info").upper()
        trace_alias = {"TRACE": "DEBUG"}
        logger.setLevel(getattr(logging, trace_alias.get(level_name, level_name),
                                logging.INFO))
        # build() REPLACES the logging config (the reference installs a fresh
        # subscriber per Tracer); appending would double-log on rebuild.
        for h in list(logger.handlers):
            logger.removeHandler(h)
            h.close()
        for h in self._handlers:
            logger.addHandler(h)
        return logger


def get_logger(target: str = "") -> logging.Logger:
    name = f"{LOGGER_NAME}.{target}" if target else LOGGER_NAME
    return logging.getLogger(name)


def debug_enabled() -> bool:
    """True when per-iteration solver tracing should be emitted: the
    ``OST_LOG`` env var says ``debug``/``trace`` (analogue of running the
    reference with ``RUST_LOG=debug``, ``ls_solver.rs:82-109``), or the
    package logger was configured at DEBUG level.  Checked at *trace time*
    by the drivers, so tracing is exactly zero-cost when off (no callback
    is ever staged into the compiled program)."""
    name = os.environ.get("OST_LOG", "").upper()
    if name in ("DEBUG", "TRACE"):
        return True
    logger = logging.getLogger(LOGGER_NAME)
    return logger.getEffectiveLevel() <= logging.DEBUG and bool(
        logger.handlers)


def _ensure_default_handler() -> None:
    # OST_LOG=debug alone must produce visible output (the reference's
    # RUST_LOG-style UX); lazily install a stdout layer if none configured
    logger = logging.getLogger(LOGGER_NAME)
    if not logger.handlers:
        Tracer().with_stdout_layer(LogFormat.NORMAL).build()


def iteration_tracer(target: str, level: int = logging.DEBUG):
    """Host-side per-iteration event sink for the solver drivers: logs
    ``k / f / ||g|| / t`` with a per-component target (the reference's
    per-solver ``tracing`` targets, e.g. ``ls_solver.rs:82-109``,
    ``spg.rs:124-137``).  ``level`` defaults to DEBUG (the OST_LOG=debug
    path); explicit verbosity requests (``Lbfgsb.set_verbosity``) pass
    INFO so events show under the default level.  Handles both scalar
    (single-solve) and batched (vmapped) payloads — per-lane host logging
    of a lockstep batch would serialize the device loop, so batches log
    aggregate statistics."""
    import numpy as np

    _ensure_default_handler()
    logger = get_logger(target)

    def cb(k, f, gnorm, t):
        k_ = np.asarray(k)
        f_ = np.asarray(f)
        g_ = np.asarray(gnorm)
        t_ = np.asarray(t)
        if k_.size == 1:
            logger.log(
                level, "k=%-5d f=%.8e ||g||=%.3e t=%.3e",
                int(k_.reshape(())), float(f_.reshape(())),
                float(g_.reshape(())), float(t_.reshape(())))
        else:
            logger.log(
                level, "k<=%-5d batch=%d f_p50=%.8e ||g||_max=%.3e t_p50=%.3e",
                int(k_.max()), k_.size, float(np.median(f_)),
                float(g_.max()), float(np.median(t_)))

    return cb


def trial_tracer(target: str, level: int = logging.DEBUG):
    """Host-side per-TRIAL event sink for the line searches: logs every
    trial step length, its objective value, and the accept/shrink decision
    — the reference's per-trial ``tracing`` events
    (``/root/reference/src/line_search/backtracking.rs:38-53``,
    ``steepest_descent/spg.rs:124-137``).  Staged only when
    :func:`debug_enabled` is true at trace time (``OST_LOG=debug``, like
    ``RUST_LOG=debug`` on the reference), so it is zero-cost when off.
    Batched (vmapped) payloads log aggregate statistics, as
    :func:`iteration_tracer` does."""
    import numpy as np

    _ensure_default_handler()
    logger = get_logger(target)

    def cb(i, t, f_t, accept):
        i_ = np.asarray(i)
        t_ = np.asarray(t)
        f_ = np.asarray(f_t)
        a_ = np.asarray(accept)
        if i_.size == 1:
            logger.log(
                level, "trial i=%-3d t=%.6e f=%.8e %s",
                int(i_.reshape(())), float(t_.reshape(())),
                float(f_.reshape(())),
                "accept" if bool(a_.reshape(())) else "shrink")
        else:
            logger.log(
                level,
                "trial i<=%-3d batch=%d t_p50=%.6e f_p50=%.8e accepted=%d",
                int(i_.max()), i_.size, float(np.median(t_)),
                float(np.median(f_)), int(a_.sum()))

    return cb


def log_progress(every: int = 1, target: str = "solver"):
    """A ready-made per-iteration ``callback`` for
    :func:`optimization_solvers_tpu.solvers.minimize`: logs ``k`` and ``f``
    host-side via ``jax.debug.callback`` (off the device hot path)."""
    logger = get_logger(target)

    def cb(k, x, f):
        k = int(k)
        if k % every == 0:
            logger.info("iter %d: f=%s", k, f)

    return cb


def summarize(result: SolveResult) -> dict:
    """Batch-level convergence statistics in one device reduction."""
    status = jnp.atleast_1d(result.status)
    iters = jnp.atleast_1d(result.iterations)
    f = jnp.atleast_1d(result.f)
    finite_f = jnp.where(jnp.isfinite(f), f, jnp.inf)
    stats = {
        "instances": int(status.shape[0]),
        "converged": int(jnp.sum(status == Status.CONVERGED)),
        "max_iter": int(jnp.sum(status == Status.MAX_ITER_REACHED)),
        "out_of_domain": int(jnp.sum(status == Status.OUT_OF_DOMAIN)),
        "iters_p50": float(jnp.median(iters)),
        "iters_max": int(jnp.max(iters)),
        "f_p50": float(jnp.median(finite_f)),
        "f_max": float(jnp.max(finite_f)),
    }
    if result.pg_norm is not None:
        # per-lane stationarity at exit (projected-gradient inf norm):
        # lets callers separate true KKT convergence from the bounded-QN
        # family's inherited s/y-stall "successes" (bfgs_b.rs:92-104)
        pg = jnp.atleast_1d(result.pg_norm)
        stats["pg_norm_p50"] = float(jnp.median(pg))
        stats["pg_norm_max"] = float(jnp.max(pg))
        stats["abnormal"] = int(jnp.sum(status == Status.ABNORMAL))
        # quasi-Newton s/y-stall exits at non-KKT points (bfgs_b.rs:92-104),
        # re-labeled from CONVERGED by the driver (Status.STALLED)
        stats["stalled"] = int(jnp.sum(status == Status.STALLED))
    return stats
