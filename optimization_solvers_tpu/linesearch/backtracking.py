"""Armijo backtracking line searches (Boyd ch. 9.2).

Device-resident re-design of ``/root/reference/src/line_search/backtracking.rs``
and ``backtracking_b.rs``: the repeat-shrink loop is a ``lax.while_loop``
over scalar carry ``(t, i, total, done)``; only the objective *value* is
evaluated per trial (``oracle.value``), skipping the gradient work the
reference's combined ``(f, g)`` oracles always pay.

Semantics parity notes:
  * An out-of-domain trial (NaN/inf f) shrinks ``t`` by ``beta`` WITHOUT
    consuming a line-search iteration (``backtracking.rs:37-41`` does
    ``continue`` before ``i += 1``).  The reference can spin forever there;
    we bound the total trips at ``max_iter + max_domain_shrinks``.
  * On exhaustion the *already shrunk* ``t`` is returned
    (``backtracking.rs:53``), not the last tested one.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from optimization_solvers_tpu.core.numerics import box_projection, dot as vdot
from optimization_solvers_tpu.linesearch.base import Bounds, LineSearch, _trial_cb


@dataclasses.dataclass(frozen=True)
class BackTracking(LineSearch):
    """Unconstrained Armijo backtracking (``backtracking.rs:3-58``).

    ``c1`` recommended in [0.01, 0.3], ``beta`` in [0.1, 0.8]
    (``backtracking.rs:4-6``).
    """

    c1: float = 1e-4
    beta: float = 0.5
    max_domain_shrinks: int = 64

    def step_len(self, oracle, x, ev, d, state, bounds: Bounds, max_iter: int):
        dtype = x.dtype
        g_dot_d = vdot(ev.g, d)
        c1 = jnp.asarray(self.c1, dtype)
        beta = jnp.asarray(self.beta, dtype)
        total_cap = max_iter + self.max_domain_shrinks
        cb = _trial_cb("BackTracking")

        def cond(c):
            t, i, total, done = c
            return (~done) & (i < max_iter) & (total < total_cap)

        def body(c):
            t, i, total, done = c
            f_t = oracle.value(x + t * d)
            out = ~jnp.isfinite(f_t)
            accept = (~out) & (f_t - ev.f <= c1 * t * g_dot_d)
            if cb is not None:   # reference per-trial events (backtracking.rs:38-53)
                jax.debug.callback(cb, i, t, f_t, accept)
            t_next = jnp.where(accept, t, t * beta)
            i_next = i + jnp.where(out | accept, 0, 1)
            return (t_next, i_next, total + 1, accept)

        t, _, _, _ = lax.while_loop(
            cond,
            body,
            (jnp.asarray(1.0, dtype), jnp.int32(0), jnp.int32(0), jnp.asarray(False)),
        )
        return t, state


@dataclasses.dataclass(frozen=True)
class BackTrackingB(LineSearch):
    """Box-constrained backtracking (``backtracking_b.rs:1-90``): each trial
    point is projected onto the box *before* evaluation
    (``backtracking_b.rs:67``) and the acceptance test is the modified Armijo
    rule ``f - f0 <= (-c1/t) ||x_proj - x0||^2`` (``backtracking_b.rs:24-35``).
    """

    c1: float = 1e-4
    beta: float = 0.5
    max_domain_shrinks: int = 64

    def step_len(self, oracle, x, ev, d, state, bounds: Bounds, max_iter: int):
        assert bounds is not None, "BackTrackingB requires bounds"
        lower, upper = bounds
        dtype = x.dtype
        c1 = jnp.asarray(self.c1, dtype)
        beta = jnp.asarray(self.beta, dtype)
        total_cap = max_iter + self.max_domain_shrinks
        cb = _trial_cb("BackTrackingB")

        def cond(c):
            t, i, total, done = c
            return (~done) & (i < max_iter) & (total < total_cap)

        def body(c):
            t, i, total, done = c
            x_t = box_projection(x + t * d, lower, upper)
            f_t = oracle.value(x_t)
            out = ~jnp.isfinite(f_t)
            diff = x_t - x
            accept = (~out) & (f_t - ev.f <= (-c1 / t) * vdot(diff, diff))
            if cb is not None:
                jax.debug.callback(cb, i, t, f_t, accept)
            t_next = jnp.where(accept, t, t * beta)
            i_next = i + jnp.where(out | accept, 0, 1)
            return (t_next, i_next, total + 1, accept)

        t, _, _, _ = lax.while_loop(
            cond,
            body,
            (jnp.asarray(1.0, dtype), jnp.int32(0), jnp.int32(0), jnp.asarray(False)),
        )
        return t, state
