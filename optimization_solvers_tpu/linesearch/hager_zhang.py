"""Hager-Zhang line search (CG_DESCENT, Hager & Zhang 2005/2006).

A capability the reference crate lacks (its searches are
``/root/reference/src/line_search/``: Armijo backtracking, More-Thuente, GLL,
NoSearch) but that users of this solver family expect, and the right default
under f32: the **approximate Wolfe** condition

    (2*delta - 1) * phi'(0)  >=  phi'(t)  >=  sigma * phi'(0),
    phi(t) <= phi(0) + eps * |phi(0)|,

tests derivatives only, so it keeps accepting steps when ``f`` changes by
less than one ulp near a minimizer - exactly where the finite-precision
Armijo test ``f(t) - f(0) <= c1*t*phi'(0)`` becomes 0 <= -tiny and stalls
(Hager & Zhang 2005, SIAM J. Optim. 16(1), section "approximate Wolfe
conditions").

TPU-native shape: a single ``lax.while_loop`` whose carry is per-lane scalar
state ``(a, b, c, mode)`` - one oracle evaluation per loop trip, with the
bracket / theta-bisection / secant phases flattened into a ``mode`` tag
(compare the reference's three nested Rust loops in ``morethuente.rs``).
Lanes that accept freeze; the whole search batches losslessly under ``vmap``.

Deviation from the paper, documented: the trial step uses single-secant plus
the ``gamma`` forced-bisection safeguard rather than the full secant^2 of
CG_DESCENT stage L2 (which needs the pre-update endpoint pair).  The gamma
safeguard alone already guarantees the bracket contracts geometrically, which
is what the convergence proof (their Thm 2.2) rests on.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from optimization_solvers_tpu.core.numerics import dot as vdot
from optimization_solvers_tpu.core.types import FuncEval
from optimization_solvers_tpu.linesearch.base import Bounds, LineSearch, _trial_cb

# mode tags for the flattened state machine
_BRACKET = 0  # expanding c by rho until phi'(c) >= 0 or phi(c) > f0 + eps
_BISECT = 1  # theta-bisection inside [a, b] (paper routine U3a-c)
_SECANT = 2  # secant step inside a valid opposite-slope bracket


@dataclasses.dataclass(frozen=True)
class HagerZhang(LineSearch):
    """CG_DESCENT line search with approximate Wolfe acceptance.

    Parameter names and defaults follow Hager & Zhang (2006, ACM TOMS 32(1),
    CG_DESCENT 1.4): ``delta`` / ``sigma`` are the Wolfe constants,
    ``eps`` the relative objective-error tolerance, ``theta`` the bisection
    weight, ``gamma`` the required bracket-shrink factor, ``rho`` the
    expansion factor of the bracketing phase.
    """

    delta: float = 0.1
    sigma: float = 0.9
    eps: float = 1e-6
    theta: float = 0.5
    gamma: float = 0.66
    rho: float = 5.0

    def _t_max(self, x, d, bounds: Bounds, dtype):
        """Max admissible step; overridden by the bounded variant."""
        return jnp.asarray(jnp.inf, dtype)

    def step_len(self, oracle, x, ev, d, state, bounds: Bounds, max_iter: int):
        t, state, _, _ = self.step_len_ev(
            oracle, x, ev, d, state, bounds, max_iter)
        return t, state

    def step_len_ev(self, oracle, x, ev, d, state, bounds: Bounds,
                    max_iter: int):
        dtype = x.dtype
        t_max = self._t_max(x, d, bounds, dtype)
        delta = jnp.asarray(self.delta, dtype)
        sigma = jnp.asarray(self.sigma, dtype)
        theta = jnp.asarray(self.theta, dtype)
        gamma = jnp.asarray(self.gamma, dtype)
        rho = jnp.asarray(self.rho, dtype)

        f0 = ev.f
        d0 = vdot(ev.g, d)  # phi'(0)
        f_eps = f0 + jnp.asarray(self.eps, dtype) * jnp.abs(f0)

        cb = _trial_cb("HagerZhang")

        def accept(t, ft, dt):
            # standard Wolfe (T1) OR approximate Wolfe (T2), plus the
            # f <= f0 + eps_k membership required for T2.
            wolfe = (ft - f0 <= delta * t * d0) & (dt >= sigma * d0)
            approx = (dt <= (2.0 * delta - 1.0) * d0) & (dt >= sigma * d0) & (
                ft <= f_eps
            )
            return wolfe | approx

        def cond(carry):
            done, i = carry[-2], carry[-1]
            return (~done) & (i < max_iter)

        def body(carry):
            (a, da_, b, c, mode, t_best, f_best, shrink_ref, f_ret, g_ret,
             done, i) = carry
            ev_t = oracle(x + c * d)
            fc, dc = ev_t.f, vdot(ev_t.g, d)
            ok = accept(c, fc, dc)
            if cb is not None:   # per-trial events
                jax.debug.callback(cb, i, c, fc, ok)
            # at the feasibility cap and still descending in-domain: the
            # boundary point is the answer (mirrors the bounded searches'
            # stpmx semantics)
            ok = ok | ((c >= t_max) & (dc < 0.0) & (fc <= f_eps))
            # track the best feasible point seen, returned on max_iter exhaustion
            better = (fc < f_best) & (c > 0.0)
            t_best = jnp.where(ok, c, jnp.where(better, c, t_best))
            f_best = jnp.where(better, fc, f_best)
            # the returned eval tracks t_best; i == 0 records the first trial
            # unconditionally (it IS the t_best fallback min(1, t_max)), so
            # even an all-rejected search returns the evaluation it made
            sel_ev = ok | better | (i == 0)
            f_ret = jnp.where(sel_ev, fc, f_ret)
            g_ret = jnp.where(sel_ev, ev_t.g, g_ret)

            # ---- interval update, identical for every mode -----------------
            # opposite-slope found: [a, c] is a valid bracket
            to_secant = dc >= 0.0
            # still descending and in-domain: advance the left end
            advance = (~to_secant) & (fc <= f_eps)
            # descending but f above the eps band: high point -> bisect [a, c]
            to_bisect = (~to_secant) & (fc > f_eps)

            a_new = jnp.where(advance, c, a)
            da_new = jnp.where(advance, dc, da_)
            b_new = jnp.where(to_secant | to_bisect, c, b)

            # ---- next trial per mode --------------------------------------
            # bracketing phase grows geometrically (capped at the max
            # admissible step); everything else works inside [a_new, b_new].
            grow = jnp.minimum(rho * c, t_max)
            bis = (1.0 - theta) * a_new + theta * b_new
            denom = dc - da_new
            sec = jnp.where(
                jnp.abs(denom) > jnp.finfo(dtype).tiny,
                (a_new * dc - c * da_new) / denom,
                bis,
            )
            # secant safeguard: fall back to bisection when the secant step
            # leaves the bracket or the bracket failed to shrink by gamma.
            width = b_new - a_new
            stalled = width > gamma * shrink_ref
            sec = jnp.where((sec <= a_new) | (sec >= b_new) | stalled, 0.5 * (a_new + b_new), sec)
            shrink_ref = width

            next_mode = jnp.where(
                to_secant,
                _SECANT,
                jnp.where(to_bisect, _BISECT, mode),
            )
            # while still bracketing, keep growing; once b exists, bis/secant
            in_bracket_phase = (mode == _BRACKET) & advance
            c_new = jnp.where(
                in_bracket_phase,
                grow,
                jnp.where(next_mode == _SECANT, sec, bis),
            )
            # freeze accepted lanes
            frozen = done | ok
            keep = lambda new, old: jnp.where(frozen, old, new)
            return (
                keep(a_new, a),
                keep(da_new, da_),
                keep(b_new, b),
                keep(c_new, c),
                keep(next_mode, mode),
                t_best,
                f_best,
                keep(shrink_ref, shrink_ref),
                f_ret,
                g_ret,
                frozen,
                i + 1,
            )

        big = jnp.asarray(jnp.finfo(dtype).max, dtype)
        carry0 = (
            jnp.asarray(0.0, dtype),  # a
            d0,  # phi'(a)
            big,  # b (unset until bracketed)
            jnp.minimum(jnp.asarray(1.0, dtype), t_max),  # first trial
            jnp.int32(_BRACKET),
            jnp.minimum(jnp.asarray(1.0, dtype), t_max),  # t_best fallback
            big,  # f_best
            big,  # shrink_ref
            f0,  # f_ret (max_iter == 0 degenerate: the t = 0 evaluation)
            ev.g,  # g_ret
            jnp.asarray(False),
            jnp.int32(0),
        )
        carry = lax.while_loop(cond, body, carry0)
        t = carry[5]
        return t, state, x + t * d, FuncEval(carry[8], carry[9])


@dataclasses.dataclass(frozen=True)
class HagerZhangB(HagerZhang):
    """Box-constrained Hager-Zhang: the bracketing expansion is capped at
    the per-coordinate max feasible step to the box boundary
    ``min_i (bound_i - x_i)/d_i`` (the same stpmx geometry as
    :class:`~optimization_solvers_tpu.linesearch.MoreThuenteB`, reference
    ``morethuente_b.rs:185-201``); a boundary trial that is still a
    descent point in the eps band is accepted as the answer."""

    def _t_max(self, x, d, bounds: Bounds, dtype):
        assert bounds is not None, "HagerZhangB requires bounds"
        lower, upper = bounds
        pos = (upper - x) / d
        neg = (lower - x) / d
        terms = jnp.where(d > 0.0, pos, jnp.where(d < 0.0, neg, jnp.inf))
        terms = jnp.where(jnp.isnan(terms), jnp.inf, terms)
        return jnp.min(terms)
