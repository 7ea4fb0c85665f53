"""Solver layer (reference L3/L4, ``/root/reference/src/{ls_solver.rs,
steepest_descent,quasi_newton,newton}``): generic line-search driver plus
the 13 solver families and the L-BFGS-B core."""

from optimization_solvers_tpu.solvers.driver import (
    SolverCarry,
    batch_minimize,
    make_solver,
    make_step,
    minimize,
    minimize_recorded,
)
from optimization_solvers_tpu.solvers.base import BoundedMethod, Method
from optimization_solvers_tpu.solvers.steepest import (
    CoordinateDescent,
    GradientDescent,
    PnormDescent,
    ProjectedGradientDescent,
    SpectralProjectedGradient,
)
from optimization_solvers_tpu.solvers.newton import (
    Newton,
    ProjectedNewton,
    SpectralProjectedNewton,
)
from optimization_solvers_tpu.solvers.quasi_newton import (
    BFGS,
    BFGSB,
    Broyden,
    BroydenB,
    DFP,
    DFPB,
    QuasiNewton,
    QuasiNewtonB,
    SR1B,
)
from optimization_solvers_tpu.solvers.implicit import (
    make_implicit_solver,
    make_implicit_solver_bounded,
)
from optimization_solvers_tpu.solvers.lbfgs import LBFGS, LbfgsState
from optimization_solvers_tpu.solvers.nonlinear_cg import NonlinearCG
from optimization_solvers_tpu.solvers.newton_cg import (
    NewtonCGConfig,
    make_newton_cg_step,
    newton_cg_batch_minimize,
    newton_cg_minimize,
)
from optimization_solvers_tpu.solvers.df_polish import (
    DFPolishResult,
    df_polish_minimize,
)
from optimization_solvers_tpu.solvers.lbfgsb import (
    LbfgsbConfig,
    lbfgsb_batch_minimize,
    lbfgsb_minimize,
    lbfgsb_minimize_scaled,
    make_lbfgsb_step,
)

__all__ = [
    "minimize",
    "batch_minimize",
    "DFPolishResult",
    "df_polish_minimize",
    "make_solver",
    "make_step",
    "minimize_recorded",
    "SolverCarry",
    "Method",
    "BoundedMethod",
    "GradientDescent",
    "CoordinateDescent",
    "PnormDescent",
    "ProjectedGradientDescent",
    "SpectralProjectedGradient",
    "Newton",
    "ProjectedNewton",
    "SpectralProjectedNewton",
    "QuasiNewton",
    "QuasiNewtonB",
    "BFGS",
    "DFP",
    "Broyden",
    "BFGSB",
    "DFPB",
    "BroydenB",
    "SR1B",
    "LBFGS",
    "make_implicit_solver",
    "make_implicit_solver_bounded",
    "NonlinearCG",
    "NewtonCGConfig",
    "make_newton_cg_step",
    "newton_cg_batch_minimize",
    "newton_cg_minimize",
    "LbfgsState",
    "LbfgsbConfig",
    "lbfgsb_batch_minimize",
    "lbfgsb_minimize",
    "lbfgsb_minimize_scaled",
    "make_lbfgsb_step",
]
