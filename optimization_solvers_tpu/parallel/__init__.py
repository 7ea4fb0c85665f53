"""Mesh / sharding / collectives layer — the new capability dimension the
single-process reference lacks (SURVEY.md §2.5)."""

from optimization_solvers_tpu.parallel.mesh import make_mesh, batch_sharding

__all__ = ["make_mesh", "batch_sharding"]
