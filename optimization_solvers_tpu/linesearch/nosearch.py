"""Constant unit step (pure Newton / quasi-Newton step).

Reference: ``/root/reference/src/line_search/nosearch.rs:3-15``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from optimization_solvers_tpu.linesearch.base import Bounds, LineSearch


@dataclasses.dataclass(frozen=True)
class NoSearch(LineSearch):
    def step_len(self, oracle, x, ev, d, state, bounds: Bounds, max_iter: int):
        return jnp.asarray(1.0, x.dtype), state
