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
    return stats
