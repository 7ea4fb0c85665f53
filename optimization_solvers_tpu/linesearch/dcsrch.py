"""Strong-Wolfe line search in the style of MINPACK-2 ``dcsrch``/``dcstep``
(More & Thuente 1994) — the search the Fortran L-BFGS-B core actually uses,
and therefore the parity-correct companion for
:mod:`optimization_solvers_tpu.solvers.lbfgsb` (the reference reaches it
through ``setulb_``, ``/root/reference/src/quasi_newton/lbfgsb.rs:36-57``).

This differs from :class:`~optimization_solvers_tpu.linesearch.MoreThuente`,
which mirrors the reference's own Rust re-derivation bug-for-bug (including
its interval update with the *new* trial value, ``morethuente.rs:293``, which
can terminate prematurely via the ``t == tu`` test).  Here the classic
safeguarded bracketing is implemented: trial selection by ``dcstep``'s four
cases, forced bisection when the bracket doesn't shrink by 0.66x over two
steps, and stage-1 operation on the auxiliary psi function.

Everything is per-lane scalar dataflow in a ``lax.while_loop``: a single
compiled program serves every lane of a vmapped batch.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from optimization_solvers_tpu.core.numerics import dot as vdot
from optimization_solvers_tpu.core.types import FuncEval
from optimization_solvers_tpu.linesearch.base import Bounds, LineSearch, _trial_cb


def _dcstep(stx, fx, dx, sty, fy, dy, stp, fp, dp, brackt, stmin, stmax):
    """One safeguarded trial-value + interval update (MINPACK-2 ``dcstep``).

    All operands are scalars; returns updated
    ``(stx, fx, dx, sty, fy, dy, stp, brackt)``.
    """
    sgnd = dp * jnp.sign(dx)

    # --- cubic/quadratic candidates for each of the four cases ------------
    theta = 3.0 * (fx - fp) / (stp - stx) + dx + dp
    s = jnp.maximum(jnp.maximum(jnp.abs(theta), jnp.abs(dx)), jnp.abs(dp))
    gamma_sq = (theta / s) ** 2 - (dx / s) * (dp / s)
    gamma = s * jnp.sqrt(jnp.maximum(gamma_sq, 0.0))

    # case 1: higher function value -> minimum bracketed
    g1 = jnp.where(stp < stx, -gamma, gamma)
    p1 = (g1 - dx) + theta
    q1 = ((g1 - dx) + g1) + dp
    r1 = p1 / q1
    stpc1 = stx + r1 * (stp - stx)
    stpq1 = stx + ((dx / ((fx - fp) / (stp - stx) + dx)) / 2.0) * (stp - stx)
    # NaN-safe: a NaN trial value must count as "higher" so the NaN point
    # becomes the bracket's far end (sty) and the search backtracks toward
    # stx, exactly how the siblings treat out-of-domain trials — `fp > fx`
    # is False for NaN and would adopt the NaN point as the best step,
    # after which the unbracketed extrapolation runs away geometrically
    case1 = ~(fp <= fx)
    stpf1 = jnp.where(
        jnp.abs(stpc1 - stx) < jnp.abs(stpq1 - stx),
        stpc1,
        stpc1 + (stpq1 - stpc1) / 2.0,
    )

    # case 2: lower value, derivatives of opposite sign -> bracketed
    g2 = jnp.where(stp > stx, -gamma, gamma)
    p2 = (g2 - dp) + theta
    q2 = ((g2 - dp) + g2) + dx
    r2 = p2 / q2
    stpc2 = stp + r2 * (stx - stp)
    stpq2 = stp + (dp / (dp - dx)) * (stx - stp)
    case2 = (~case1) & (sgnd < 0.0)
    stpf2 = jnp.where(jnp.abs(stpc2 - stp) > jnp.abs(stpq2 - stp), stpc2, stpq2)

    # case 3: lower value, same sign, decreasing derivative magnitude
    g3 = jnp.where(stp > stx, -gamma, gamma)
    p3 = (g3 - dp) + theta
    q3 = (g3 + (dx - dp)) + g3
    r3 = p3 / q3
    stpc3_interp = stp + r3 * (stx - stp)
    stpc3 = jnp.where(
        (r3 < 0.0) & (g3 != 0.0),
        stpc3_interp,
        jnp.where(stp > stx, stmax, stmin),
    )
    stpq3 = stp + (dp / (dp - dx)) * (stx - stp)
    case3 = (~case1) & (~case2) & (jnp.abs(dp) < jnp.abs(dx))
    stpf3_brackt = jnp.where(
        jnp.abs(stpc3 - stp) < jnp.abs(stpq3 - stp), stpc3, stpq3
    )
    stpf3_brackt = jnp.where(
        stp > stx,
        jnp.minimum(stp + 0.66 * (sty - stp), stpf3_brackt),
        jnp.maximum(stp + 0.66 * (sty - stp), stpf3_brackt),
    )
    stpf3_free = jnp.where(
        jnp.abs(stpc3 - stp) > jnp.abs(stpq3 - stp), stpc3, stpq3
    )
    stpf3_free = jnp.clip(stpf3_free, stmin, stmax)
    stpf3 = jnp.where(brackt, stpf3_brackt, stpf3_free)

    # case 4: lower value, same sign, non-decreasing derivative magnitude
    theta4 = 3.0 * (fp - fy) / (sty - stp) + dy + dp
    s4 = jnp.maximum(jnp.maximum(jnp.abs(theta4), jnp.abs(dy)), jnp.abs(dp))
    gamma4 = s4 * jnp.sqrt(jnp.maximum((theta4 / s4) ** 2 - (dy / s4) * (dp / s4), 0.0))
    g4 = jnp.where(stp > sty, -gamma4, gamma4)
    p4 = (g4 - dp) + theta4
    q4 = ((g4 - dp) + g4) + dy
    r4 = p4 / q4
    stpc4 = stp + r4 * (sty - stp)
    stpf4 = jnp.where(brackt, stpc4, jnp.where(stp > stx, stmax, stmin))

    stpf = jnp.where(
        case1, stpf1, jnp.where(case2, stpf2, jnp.where(case3, stpf3, stpf4))
    )
    new_brackt = brackt | case1 | case2

    # --- interval update ----------------------------------------------------
    # fp > fx: sty <- stp ; elif sgnd < 0: sty <- stx, stx <- stp ; else stx <- stp
    sty_n = jnp.where(case1, stp, jnp.where(sgnd < 0.0, stx, sty))
    fy_n = jnp.where(case1, fp, jnp.where(sgnd < 0.0, fx, fy))
    dy_n = jnp.where(case1, dp, jnp.where(sgnd < 0.0, dx, dy))
    stx_n = jnp.where(case1, stx, stp)
    fx_n = jnp.where(case1, fx, fp)
    dx_n = jnp.where(case1, dx, dp)

    stpf = jnp.clip(stpf, stmin, stmax)
    # NaN trial polynomial (out-of-domain fp/dp): bisect the bracket — the
    # STEP endpoints are always finite even when their f-values are not,
    # so this backtracks geometrically toward the best point like the
    # sibling searches' NaN-shrink
    mid = stx_n + 0.5 * (sty_n - stx_n)
    stpf = jnp.where(jnp.isnan(stpf),
                     jnp.where(new_brackt, mid, stmin), stpf)
    return stx_n, fx_n, dx_n, sty_n, fy_n, dy_n, stpf, new_brackt


class _State(NamedTuple):
    i: jax.Array
    stp: jax.Array
    stx: jax.Array
    fx: jax.Array
    dx: jax.Array
    sty: jax.Array
    fy: jax.Array
    dy: jax.Array
    brackt: jax.Array
    stage1: jax.Array
    width: jax.Array
    width1: jax.Array
    stmin: jax.Array
    stmax: jax.Array
    done: jax.Array
    # raw (f, g) at the step the search will RETURN: the current trial's
    # evaluation on a Wolfe/forced exit, the best point stx's on exhaustion
    # — so callers get the accepted FuncEval without a duplicate oracle call
    f_ret: jax.Array
    g_ret: jax.Array


@dataclasses.dataclass(frozen=True)
class StrongWolfe(LineSearch):
    """MINPACK-2 ``dcsrch`` strong-Wolfe search.  Defaults match the Fortran
    L-BFGS-B driver (``ftol=1e-3, gtol=0.9, xtol=0.1``).  When ``bounded``
    the max step is capped at the distance to the box boundary along ``d``
    (the L-BFGS-B ``stpmx`` computation)."""

    c1: float = 1e-3
    c2: float = 0.9
    xtol: float = 0.1
    stp_min: float = 0.0
    stp_max: float = math.inf
    bounded: bool = False
    xtrapl: float = 1.1
    xtrapu: float = 4.0

    def step_len(self, oracle, x, ev, d, state, bounds: Bounds, max_iter: int):
        t, state, _, _ = self.step_len_ev(
            oracle, x, ev, d, state, bounds, max_iter)
        return t, state

    def step_len_ev(self, oracle, x, ev, d, state, bounds: Bounds,
                    max_iter: int):
        dtype = x.dtype
        c1 = jnp.asarray(self.c1, dtype)
        c2 = jnp.asarray(self.c2, dtype)

        f0 = ev.f
        ginit = vdot(ev.g, d)
        gtest = c1 * ginit

        stpmax_g = jnp.asarray(self.stp_max, dtype)
        if self.bounded:
            assert bounds is not None, "bounded StrongWolfe requires bounds"
            lower, upper = bounds
            terms = jnp.where(
                d > 0.0,
                (upper - x) / d,
                jnp.where(d < 0.0, (lower - x) / d, jnp.inf),
            )
            terms = jnp.where(jnp.isnan(terms), jnp.inf, terms)
            stpmax_g = jnp.minimum(stpmax_g, jnp.min(terms))
        stpmin_g = jnp.asarray(self.stp_min, dtype)
        cb = _trial_cb("StrongWolfe")

        stp0 = jnp.clip(jnp.asarray(1.0, dtype), stpmin_g, stpmax_g)
        # non-descent guard below zeroes the returned step (done=True exits
        # with s.stp)
        stp0 = jnp.where(ginit < 0.0, stp0, jnp.zeros((), dtype))
        width0 = stpmax_g - stpmin_g
        init = _State(
            i=jnp.int32(0),
            stp=stp0,
            stx=jnp.zeros((), dtype), fx=f0, dx=ginit,
            sty=jnp.zeros((), dtype), fy=f0, dy=ginit,
            brackt=jnp.asarray(False),
            stage1=jnp.asarray(True),
            width=width0,
            width1=width0 / 0.5,
            stmin=jnp.zeros((), dtype),
            stmax=stp0 + self.xtrapu * stp0,
            # MINPACK's 'ERROR: INITIAL G .GE. ZERO' guard: a non-descent
            # direction returns t = 0 immediately (stx) instead of burning
            # max_iter oracle evaluations on a search that cannot succeed
            done=~(ginit < 0.0),
            f_ret=f0,
            g_ret=ev.g,
        )

        def cond(s: _State):
            return (~s.done) & (s.i < max_iter)

        def body(s: _State):
            ev_t = oracle(x + s.stp * d)
            f = ev_t.f
            g = vdot(ev_t.g, d)
            ftest = f0 + s.stp * gtest

            stage1 = s.stage1 & ~((f <= ftest) & (g >= 0.0))

            # convergence: strong Wolfe conditions
            wolfe = (f <= ftest) & (jnp.abs(g) <= c2 * (-ginit))
            # forced termination (Fortran warning exits): bracket collapsed
            # below xtol, or the step is pinned at a global limit
            small = s.brackt & (s.stmax - s.stmin <= self.xtol * s.stmax)
            at_max = (s.stp == stpmax_g) & (f <= ftest) & (g <= gtest)
            at_min = (s.stp == stpmin_g) & ((f > ftest) | (g >= gtest))
            out_of_interval = s.brackt & ((s.stp <= s.stmin) | (s.stp >= s.stmax))
            finish = wolfe | small | at_max | at_min | out_of_interval
            if cb is not None:   # per-trial events (MINPACK dcsrch decisions)
                jax.debug.callback(cb, s.i, s.stp, f, finish)

            # stage-1 psi-modified update (subtract the Armijo slope) when
            # the trial is below fx but above the Armijo line
            use_mod = stage1 & (f <= s.fx) & (f > ftest)
            fm = jnp.where(use_mod, f - s.stp * gtest, f)
            fxm = jnp.where(use_mod, s.fx - s.stx * gtest, s.fx)
            fym = jnp.where(use_mod, s.fy - s.sty * gtest, s.fy)
            gm = jnp.where(use_mod, g - gtest, g)
            gxm = jnp.where(use_mod, s.dx - gtest, s.dx)
            gym = jnp.where(use_mod, s.dy - gtest, s.dy)

            stx, fx, dx, sty, fy, dy, stp, brackt = _dcstep(
                s.stx, fxm, gxm, s.sty, fym, gym, s.stp, fm, gm,
                s.brackt, s.stmin, s.stmax,
            )

            fx = jnp.where(use_mod, fx + stx * gtest, fx)
            fy = jnp.where(use_mod, fy + sty * gtest, fy)
            dx = jnp.where(use_mod, dx + gtest, dx)
            dy = jnp.where(use_mod, dy + gtest, dy)

            # forced bisection if the bracket failed to shrink enough
            bisect = brackt & (jnp.abs(sty - stx) >= 0.66 * s.width1)
            stp = jnp.where(bisect, stx + 0.5 * (sty - stx), stp)
            width1 = jnp.where(brackt, s.width, s.width1)
            width = jnp.where(brackt, jnp.abs(sty - stx), s.width)

            # fmin/fmax skip NaN endpoints: a NaN (out-of-domain) far end
            # must not poison the safeguard interval — the search then
            # keeps shrinking toward the finite best point stx
            stmin = jnp.where(brackt, jnp.fmin(stx, sty),
                              stp + self.xtrapl * (stp - stx))
            stmax = jnp.where(brackt, jnp.fmax(stx, sty),
                              stp + self.xtrapu * (stp - stx))
            stp = jnp.clip(stp, stpmin_g, stpmax_g)

            # if further progress is impossible, return the best point so far
            give_up = (brackt & ((stp <= stmin) | (stp >= stmax))) | (
                brackt & (stmax - stmin <= self.xtol * stmax)
            )
            stp = jnp.where(give_up, stx, stp)

            # the returned eval tracks the returned step: the CURRENT trial
            # on a finish exit (accepted step = s.stp = the point evaluated
            # this trip), and whichever trial stx last adopted otherwise
            # (exhaustion returns stx; a bitwise-equal stx means the same
            # point, so the stale value is identical)
            sel_ev = finish | (stx != s.stx)
            f_ret = jnp.where(sel_ev, f, s.f_ret)
            g_ret = jnp.where(sel_ev, ev_t.g, s.g_ret)

            # freeze everything once finished; the accepted step is s.stp
            return _State(
                i=s.i + 1,
                stp=jnp.where(finish, s.stp, stp),
                stx=jnp.where(finish, s.stx, stx),
                fx=jnp.where(finish, s.fx, fx),
                dx=jnp.where(finish, s.dx, dx),
                sty=jnp.where(finish, s.sty, sty),
                fy=jnp.where(finish, s.fy, fy),
                dy=jnp.where(finish, s.dy, dy),
                brackt=brackt | s.brackt,
                stage1=stage1,
                width=jnp.where(finish, s.width, width),
                width1=jnp.where(finish, s.width1, width1),
                stmin=jnp.where(finish, s.stmin, stmin),
                stmax=jnp.where(finish, s.stmax, stmax),
                done=finish,
                f_ret=f_ret,
                g_ret=g_ret,
            )

        out = lax.while_loop(cond, body, init)
        # on exhaustion return the best step found (stx), not the live trial
        t = jnp.where(out.done, out.stp, out.stx)
        return t, state, x + t * d, FuncEval(out.f_ret, out.g_ret)
