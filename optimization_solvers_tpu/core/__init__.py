from optimization_solvers_tpu.core.types import FuncEval, SolveResult, Status
from optimization_solvers_tpu.core.numerics import (
    box_projection,
    infinity_norm,
    projected_gradient,
)
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.core import problems

__all__ = [
    "FuncEval",
    "SolveResult",
    "Status",
    "box_projection",
    "infinity_norm",
    "projected_gradient",
    "make_oracle",
    "problems",
]
