"""Grippo-Lampariello-Lucidi non-monotone line search with safeguarded
quadratic interpolation.

Reference: ``/root/reference/src/line_search/gll_quadratic.rs``.  The
non-monotone Armijo test compares against the max of the last ``m`` objective
values; the reference keeps them in a ``Vec`` FIFO (``gll_quadratic.rs:30-43``)
which becomes a fixed-shape ``(m,)`` ring buffer (initialized to -inf) plus a
wrapping write pointer, carried across outer solver iterations in the
line-search state.  Setting ``m = 1`` recovers the monotone Armijo search.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from optimization_solvers_tpu.core.numerics import dot as vdot
from optimization_solvers_tpu.linesearch.base import Bounds, LineSearch, _trial_cb


@dataclasses.dataclass(frozen=True)
class GLLQuadratic(LineSearch):
    """``GLLQuadratic::new(c1, m)`` with sigma window defaults 0.1/0.9
    (``gll_quadratic.rs:12-28``)."""

    c1: float = 1e-4
    m: int = 10
    sigma1: float = 0.1
    sigma2: float = 0.9

    def init_state(self, ev0):
        fhist = jnp.full((self.m,), -jnp.inf, dtype=ev0.f.dtype)
        return (fhist, jnp.int32(0))

    def step_len(self, oracle, x, ev, d, state, bounds: Bounds, max_iter: int):
        dtype = x.dtype
        c1 = jnp.asarray(self.c1, dtype)
        sigma1 = jnp.asarray(self.sigma1, dtype)
        sigma2 = jnp.asarray(self.sigma2, dtype)

        fhist, pos = state
        # append f(x_k) to the history ring (gll_quadratic.rs:62)
        fhist = fhist.at[pos % self.m].set(ev.f)
        pos = pos + 1
        f_max = jnp.max(fhist)

        f0 = ev.f
        g_dot_d = vdot(ev.g, d)
        cb = _trial_cb("GLLQuadratic")

        def cond(c):
            t, i, done = c
            return (~done) & (i < max_iter)

        def body(c):
            t, i, done = c
            f_t = oracle.value(x + t * d)
            # non-monotone Armijo vs f_max (gll_quadratic.rs:73)
            accept = f_t - f_max <= c1 * t * g_dot_d
            if cb is not None:   # reference per-trial events (spg.rs:124-137)
                jax.debug.callback(cb, i, t, f_t, accept)

            # safeguarded quadratic interpolation step (gll_quadratic.rs:78-93)
            t_half = t * 0.5
            t_tmp = -0.5 * t * t * g_dot_d / (f_t - f0 - t * g_dot_d)
            t_quad = jnp.where(
                (t_tmp > sigma1) & (t_tmp < sigma2 * t), t_tmp, t_tmp * 0.5
            )
            t_next = jnp.where(accept, t, jnp.where(t <= 0.1, t_half, t_quad))
            # lockup guard beyond the reference: the rejected-interpolant
            # halving above (gll_quadratic.rs:90-92) yields t_tmp*0.5 = -0
            # when f_t overflows (f32), freezing t at 0 forever (a zero step
            # always passes the non-monotone Armijo).  A nonpositive or
            # non-finite trial falls back to bisection.
            t_next = jnp.where(
                jnp.isfinite(t_next) & (t_next > 0.0), t_next, t_half)
            return (t_next, i + 1, accept)

        t, _, _ = lax.while_loop(
            cond, body, (jnp.asarray(1.0, dtype), jnp.int32(0), jnp.asarray(False))
        )
        return t, (fhist, pos)
