"""Observability and front-end helpers (reference L5/L6)."""

from optimization_solvers_tpu.utils.telemetry import (
    LogFormat,
    Tracer,
    get_logger,
    log_progress,
    summarize,
)
from optimization_solvers_tpu.utils.plotting import Plotter3d

__all__ = [
    "LogFormat",
    "Tracer",
    "get_logger",
    "log_progress",
    "summarize",
    "Plotter3d",
]
