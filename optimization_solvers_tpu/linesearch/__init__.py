"""Batched line searches (reference L2, ``/root/reference/src/line_search/``)."""

from optimization_solvers_tpu.linesearch.base import (
    Bounds,
    LineSearch,
    strong_wolfe,
    sufficient_decrease,
    curvature_condition,
    strong_curvature_condition,
)
from optimization_solvers_tpu.linesearch.backtracking import BackTracking, BackTrackingB
from optimization_solvers_tpu.linesearch.morethuente import MoreThuente, MoreThuenteB
from optimization_solvers_tpu.linesearch.dcsrch import StrongWolfe
from optimization_solvers_tpu.linesearch.gll import GLLQuadratic
from optimization_solvers_tpu.linesearch.hager_zhang import HagerZhang, HagerZhangB
from optimization_solvers_tpu.linesearch.nosearch import NoSearch

__all__ = [
    "Bounds",
    "LineSearch",
    "BackTracking",
    "BackTrackingB",
    "MoreThuente",
    "MoreThuenteB",
    "StrongWolfe",
    "GLLQuadratic",
    "HagerZhang",
    "HagerZhangB",
    "NoSearch",
    "strong_wolfe",
    "sufficient_decrease",
    "curvature_condition",
    "strong_curvature_condition",
]
