"""Solver method protocol (reference ``ComputeDirection`` +
``LineSearchSolver`` hooks, ``/root/reference/src/ls_solver.rs:3-136``),
re-shaped functionally: a method is a frozen config whose per-iteration
state is an explicit pytree threaded through the driver's while-loop.

Hook mapping to the reference template:
  * ``prepare_x0``  — constructor-time box projection of x0 (e.g.
    ``projected_gradient_descent.rs:21``, ``bfgs_b.rs:50``).
  * ``init``        — constructor-time state (BB lambda seeding in SPG/SPN,
    identity inverse-Hessian in quasi-Newton).
  * ``converged``   — ``has_converged`` (per-solver criterion; see
    SURVEY.md §2.3 for the per-solver table).
  * ``direction``   — ``compute_direction`` (may update state, e.g. the
    Newton decrement, ``newton/mod.rs:40``).
  * ``post_step``   — the tail of each solver's overridden
    ``update_next_iterate``: s/y-based state refresh AFTER the step
    (BB scalar ``spg.rs:134-143``, inverse-Hessian updates
    ``bfgs.rs:104-124``).  ``ev_new`` is supplied by the driver, which
    fuses the reference's extra post-step oracle call with the next
    iteration's top-of-loop evaluation.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax

from optimization_solvers_tpu.core.numerics import (
    box_projection,
    infinity_norm,
    projected_gradient,
)
from optimization_solvers_tpu.core.types import FuncEval
from optimization_solvers_tpu.linesearch.base import Bounds


class Method:
    """Base solver config."""

    needs_hessian: bool = False

    def prepare_x0(self, x0: jax.Array, bounds: Bounds) -> jax.Array:
        return x0

    def init(self, x: jax.Array, ev: FuncEval, bounds: Bounds) -> Any:
        return None

    def converged(self, mstate, x, ev, bounds: Bounds) -> jax.Array:
        raise NotImplementedError

    def direction(self, mstate, x, ev, bounds: Bounds) -> Tuple[jax.Array, Any]:
        raise NotImplementedError

    def post_step(self, mstate, x, ev, d, t, x_new, ev_new, bounds: Bounds):
        return mstate


class BoundedMethod(Method):
    """Mixin for box-constrained methods: x0 is projected at construction
    and convergence tests the infinity norm of the projected gradient
    (``ls_solver.rs:121-133``)."""

    def prepare_x0(self, x0: jax.Array, bounds: Bounds) -> jax.Array:
        assert bounds is not None, f"{type(self).__name__} requires bounds"
        return box_projection(x0, *bounds)

    def projected_gradient_norm(self, x, ev, bounds: Bounds) -> jax.Array:
        lower, upper = bounds
        return infinity_norm(projected_gradient(ev.g, x, lower, upper))
