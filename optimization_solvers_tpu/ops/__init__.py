"""Compute kernels: XLA-native defaults with Pallas TPU overrides."""

from optimization_solvers_tpu.ops.linalg import cholesky_solve, solve_spd

__all__ = ["cholesky_solve", "solve_spd"]
