"""Nonlinear conjugate gradient family (Fletcher-Reeves, Polak-Ribiere+,
Hestenes-Stiefel, Dai-Yuan).

The reference crate has no CG solver; it is the natural sibling of its
steepest-descent family (same O(n) per-iteration state, dramatically better
valley-following), so it rounds out the first-order lineup for production
use.  Pairs with a strong-Wolfe search (:class:`StrongWolfe` /
:class:`MoreThuente`) — the curvature condition keeps the CG directions
descent directions.

State: previous gradient and direction; restart to steepest descent when
the computed direction loses descent (g.d >= 0) or every ``restart_every``
iterations (classic n-step restart when 0).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from optimization_solvers_tpu.core.numerics import dot as vdot, infinity_norm
from optimization_solvers_tpu.linesearch.base import Bounds
from optimization_solvers_tpu.solvers.base import Method

_BETAS = ("fr", "pr+", "hs", "dy")


class _CGState(NamedTuple):
    g_prev: jax.Array
    d_prev: jax.Array
    k_since_restart: jax.Array


@dataclasses.dataclass(frozen=True)
class NonlinearCG(Method):
    """``variant`` in {"fr", "pr+", "hs", "dy"}; ``restart_every=0`` means
    restart every n iterations (set at init from the problem dimension)."""

    grad_tol: float = 1e-8
    variant: str = "pr+"
    restart_every: int = 0

    def __post_init__(self):
        assert self.variant in _BETAS, self.variant

    def init(self, x, ev, bounds: Bounds):
        return _CGState(ev.g, -ev.g, jnp.int32(0))

    def converged(self, mstate, x, ev, bounds: Bounds):
        return infinity_norm(ev.g) < self.grad_tol

    def direction(self, mstate: _CGState, x, ev, bounds: Bounds):
        g = ev.g
        gp = mstate.g_prev
        dp = mstate.d_prev
        y = g - gp
        gg = vdot(g, g)
        if self.variant == "fr":
            beta = gg / vdot(gp, gp)
        elif self.variant == "pr+":
            beta = jnp.maximum(vdot(g, y) / vdot(gp, gp), 0.0)
        elif self.variant == "hs":
            beta = vdot(g, y) / vdot(dp, y)
        else:  # dy
            beta = gg / vdot(dp, y)

        # degenerate denominators (first iteration: y = 0) give inf/NaN
        # betas; fall back to steepest descent
        beta = jnp.where(jnp.isfinite(beta), beta, 0.0)

        n = x.shape[-1]
        period = self.restart_every if self.restart_every > 0 else n
        periodic = mstate.k_since_restart >= period
        d = -g + jnp.where(periodic, 0.0, beta) * dp
        # restart to steepest descent if d is not a descent direction
        descent = vdot(g, d) < 0.0
        d = jnp.where(descent, d, -g)
        restarted = periodic | ~descent
        k_new = jnp.where(restarted, jnp.int32(0), mstate.k_since_restart)
        return d, mstate._replace(k_since_restart=k_new)

    def post_step(self, mstate: _CGState, x, ev, d, t, x_new, ev_new, bounds):
        return _CGState(ev.g, d, mstate.k_since_restart + 1)
