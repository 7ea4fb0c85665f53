"""Line-search protocol (reference L2 layer, ``/root/reference/src/line_search/mod.rs``).

A line search is a frozen config object with two methods:

``init_state(ev0)``
    Build the search's persistent cross-iteration state (a pytree carried in
    the solver driver's ``lax.while_loop``).  Only GLL has one (the
    non-monotone f-history ring, ``gll_quadratic.rs:30-43``); the rest return
    ``None``.

``step_len(oracle, x, ev, d, state, bounds, max_iter) -> (t, state)``
    The reference ``LineSearch::compute_step_len`` (``mod.rs:14-23``)
    re-shaped for device residency: the data-dependent repeat-until-accept
    loop becomes a ``lax.while_loop`` whose carry is per-instance scalar
    state, so the whole search batches losslessly under ``vmap`` (each batch
    lane keeps its own accept mask and stops updating once accepted).

Shared Wolfe-condition predicates (``mod.rs:25-86``) live here as free
functions over scalars.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

Bounds = Optional[Tuple[jax.Array, jax.Array]]


def sufficient_decrease(c1, f_k, f_kp1, g_dot_d, t) -> jax.Array:
    """Armijo: ``f_{k+1} - f_k <= c1 * t * g_k . d`` (``mod.rs:27-37``)."""
    return f_kp1 - f_k <= c1 * t * g_dot_d


def curvature_condition(c2, g_dot_d, g_kp1_dot_d) -> jax.Array:
    """``g_{k+1} . d >= c2 * g_k . d`` (``mod.rs:41-47``)."""
    return g_kp1_dot_d >= c2 * g_dot_d


def strong_curvature_condition(c2, g_dot_d, g_kp1_dot_d) -> jax.Array:
    """``|g_{k+1} . d| <= c2 |g_k . d|`` (``mod.rs:49-56``)."""
    return jnp.abs(g_kp1_dot_d) <= c2 * jnp.abs(g_dot_d)


def strong_wolfe(c1, c2, f_k, f_kp1, g_dot_d, g_kp1_dot_d, t) -> jax.Array:
    """Strong Wolfe conditions (``mod.rs:73-85``)."""
    return sufficient_decrease(c1, f_k, f_kp1, g_dot_d, t) & strong_curvature_condition(
        c2, g_dot_d, g_kp1_dot_d
    )


class LineSearch:
    """Base class; concrete searches are frozen dataclasses subclassing this."""

    def init_state(self, ev0) -> Any:
        return None

    def step_len(self, oracle, x, ev, d, state, bounds: Bounds, max_iter: int):
        raise NotImplementedError

    def step_len_ev(self, oracle, x, ev, d, state, bounds: Bounds,
                    max_iter: int):
        """``(t, state, x_new, ev_new)``: the accepted step, updated search
        state, the accepted iterate, and its full evaluation.

        The reference template re-evaluates the oracle at the accepted point
        after every search (``ls_solver.rs:93-99`` via the per-solver state
        refresh, e.g. ``bfgs.rs:98``) even though the search's last trial
        often just computed it.  Searches that evaluate the full ``(f, g)``
        per trial (StrongWolfe/dcsrch, Hager-Zhang) override this to return
        the trial evaluation directly — one whole oracle evaluation saved
        per solver iteration.  The default covers value-only searches."""
        t, state = self.step_len(oracle, x, ev, d, state, bounds, max_iter)
        x_new = x + t * d
        return t, state, x_new, oracle(x_new)


def _trial_cb(kind: str):
    """Per-trial tracing hook (reference ``backtracking.rs:38-53``): returns
    a host callback when OST_LOG=debug (checked at TRACE time, so the
    compiled program carries no callback when tracing is off)."""
    from optimization_solvers_tpu.utils import telemetry

    if not telemetry.debug_enabled():
        return None
    return telemetry.trial_tracer(f"linesearch.{kind}")
