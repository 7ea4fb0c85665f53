"""Fused Pallas TPU kernel: complete batched **L-BFGS-B** solves in VMEM.

The box-constrained sibling of :mod:`pallas_lbfgs` and the TPU-native
answer to the reference's Fortran ``setulb_`` core at production scale:
one kernel invocation runs the full Byrd-Lu-Nocedal-Zhu loop — compact
middle-matrix factorization, generalized Cauchy point, primal subspace
minimization, projected backtracking line search — for a tile of instances,
with every piece of state resident in VMEM for the whole solve.

In-kernel reformulations (beyond the Mosaic rules listed in
:mod:`pallas_lbfgs`):
  * the GCP breakpoint sweep replaces the argsort with per-lane iterative
    min-extraction (processed breakpoints are masked to +inf); each sweep
    step gathers the per-lane breaking coordinate through a one-hot
    reduction, so the whole sweep is full-lane vector work;
  * the middle matrix lives as its Schur factorization — D (m, T),
    chronological L (m, m, T), and the Cholesky factor of
    ``theta S S^T + L D^{-1} L^T`` — rebuilt once per outer iteration from
    incrementally-maintained S.Y / S.S Gram tables (only the new pair's
    row/column is recomputed);
  * the history is kept in chronological order by an explicit VMEM shift
    (S[p] <- S[p+1]) instead of a head-indexed ring: ~100 live
    ``(head+p)%m`` scalar indices blew the TPU scalar register allocator
    ("live_range_finder RET_CHECK"); with the shift, every history index
    is a compile-time constant;
  * all triangular solves unroll over the static history length m (keep m
    modest: every unit adds ~O(m) lane-wide ops to the program).

Validated in interpret mode against the unfused
:mod:`optimization_solvers_tpu.solvers.lbfgsb` implementation.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl

from optimization_solvers_tpu.core.types import SolveResult, Status
from optimization_solvers_tpu.core.numerics import batched_pg_inf_norm
from optimization_solvers_tpu.ops.pallas_lbfgs import (
    _batched_value,
    _batched_value_and_grad,
    _load_consts,
    _pack_consts,
)
from optimization_solvers_tpu.ops.pallas_lbfgsb_tall import (
    VMEM_BUDGET_BYTES,
    VMEM_MARGIN,
)


def vmem_footprint_bytes(n: int, m: int, tile: int, consts=()) -> int:
    """Estimated per-program VMEM working set of the LANE-LAST kernel:
    X/G + the (m, n, T) histories + the five (n, T) GCP slabs + consts.
    Single source of truth for the kernel's own vmem_limit raise and the
    frontend router's fit check — keeping the two copies of this formula
    in sync was a round-4 review finding (same treatment as the tall
    kernel's helper).  Originally-1-D consts count at ``k * tile``
    elements, not ``k``: the kernel broadcasts each to a (k, T)
    sublane-resident slab (``_load_consts``), so sizing them at their
    wrapper-side shape underestimated the working set by ~k*T*4 bytes per
    1-D const (round-4 advisor finding)."""
    import numpy as _np

    return (2 * m + 10) * n * tile * 4 + sum(
        int(_np.size(c)) * (tile if _np.ndim(c) == 1 else 1) * 4
        for c in consts)


def _make_kernel(f, const_1d, n, m, T, pgtol, factr, max_iter, max_iter_ls,
                 c1, dtype, unbounded=False):
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7
    f_rtol = factr * eps_mach
    curvature_eps = eps_mach
    inf = float("inf")  # python scalar: a jnp constant here would be a captured tracer
    n_consts = len(const_1d)

    def kernel(x0_ref, lo_ref, up_ref, *rest):
        const_refs = rest[:n_consts]
        (x_out, f_out, it_out, st_out,
         X, G, Fv, Fprev, S, Y, SYt, SSt, Dh, Lc, Sch, theta, validf,
         iters, tbr, dgc, xcp, fixedm, cvec, pvec, sc1, ls_t,
         ls_done, abn, dvec, actm) = rest[n_consts:]
        cvals, caxes = _load_consts(const_refs, const_1d, T)
        bvg = _batched_value_and_grad(f, cvals, caxes)
        bval = _batched_value(f, cvals, caxes)
        lo = lo_ref[0]                                           # (n, T)
        up = up_ref[0]

        X[...] = jnp.clip(x0_ref[0], lo, up)
        fv, gv = bvg(X[...])
        Fv[...] = fv
        Fprev[...] = jnp.full((1, T), jnp.inf, dtype)
        G[...] = gv
        S[...] = jnp.zeros((m, n, T), dtype)
        Y[...] = jnp.zeros((m, n, T), dtype)
        SYt[...] = jnp.zeros((m, m, T), dtype)
        SSt[...] = jnp.zeros((m, m, T), dtype)
        validf[...] = jnp.zeros((m, T), dtype)
        theta[...] = jnp.ones((1, T), dtype)
        iters[...] = jnp.zeros((1, T), jnp.int32)
        abn[...] = jnp.zeros((1, T), jnp.int32)

        row_iota = lax.broadcasted_iota(jnp.int32, (n, T), 0)

        def pg_inf_norm():
            pg = X[...] - jnp.clip(X[...] - G[...], lo, up)
            return jnp.max(jnp.abs(pg), axis=0, keepdims=True)    # (1, T)

        def active_mask():
            done = pg_inf_norm() <= pgtol
            fmax = jnp.maximum(
                jnp.maximum(jnp.abs(Fv[...]), jnp.abs(Fprev[...])), 1.0
            )
            done = done | (
                jnp.isfinite(Fprev[...])
                & ((Fprev[...] - Fv[...]) <= f_rtol * fmax)
            )
            return jnp.isfinite(Fv[...]) & (abn[...] == 0) & ~done

        # ------------------------------------------------------------------
        # middle factorization (per outer iteration)

        def build_middle():
            th = theta[...]                                       # (1, T)
            # D-hat: s_p . y_p patched to 1 on invalid slots (slots are in
            # chronological order: index m-1 is the newest)
            for p in range(m):
                d_p = SYt[p, p]                                   # (T,)
                Dh[p] = jnp.where(validf[p] > 0, d_p, jnp.ones((T,), dtype))
            # chronological strictly-lower L: L[p, q] = s_p . y_q, p > q
            for p in range(m):
                for q in range(m):
                    if q < p:
                        Lc[p, q] = SYt[p, q]
                    else:
                        Lc[p, q] = jnp.zeros((T,), dtype)
            # Schur = theta * SS^T + L D^{-1} L^T  (chronological, patched)
            for p in range(m):
                for q in range(m - 1, -1, -1):
                    if q > p:
                        continue
                    v = th[0] * SSt[p, q]
                    for k in range(min(p, q)):
                        v = v + Lc[p, k] * Lc[q, k] / Dh[k]
                    if p == q:
                        v = jnp.where(validf[p] > 0, v,
                                      jnp.ones((T,), dtype))
                    Sch[p, q] = v
            # in-place lane-wide Cholesky of Sch (lower)
            for j in range(m):
                d = Sch[j, j]
                for k in range(j):
                    d = d - Sch[j, k] * Sch[j, k]
                dj = jnp.sqrt(jnp.maximum(d, eps_mach))
                Sch[j, j] = dj
                for i in range(j + 1, m):
                    s_ = Sch[i, j]
                    for k in range(j):
                        s_ = s_ - Sch[i, k] * Sch[j, k]
                    Sch[i, j] = s_ / dj

        def sch_solve(b):
            """Solve (Schur) z = b for a list of m (T,) lanes, in place."""
            y_ = [None] * m
            for i in range(m):
                s_ = b[i]
                for k in range(i):
                    s_ = s_ - Sch[i, k] * y_[k]
                y_[i] = s_ / Sch[i, i]
            z = [None] * m
            for i in range(m - 1, -1, -1):
                s_ = y_[i]
                for k in range(i + 1, m):
                    s_ = s_ - Sch[k, i] * z[k]
                z[i] = s_ / Sch[i, i]
            return z

        def mid_solve(ab):
            """MM^{-1} applied to a list of 2m (T,) lanes."""
            a, b = ab[:m], ab[m:]
            rhs = []
            for i in range(m):
                s_ = b[i]
                for k in range(i):
                    s_ = s_ + Lc[i, k] * a[k] / Dh[k]
                rhs.append(s_)
            v = sch_solve(rhs)
            u = []
            for i in range(m):
                s_ = -a[i]
                for k in range(i + 1, m):
                    s_ = s_ + Lc[k, i] * v[k]
                u.append(s_ / Dh[i])
            return u + v

        def w_dot(vec):
            """W^T vec: list of 2m (T,) lanes; W rows are
            [y_0..y_{m-1}, theta s_0..theta s_{m-1}] chronological."""
            th = theta[0]
            out = []
            for p in range(m):
                out.append(jnp.sum(Y[p] * vec, axis=0))
            for p in range(m):
                out.append(th * jnp.sum(S[p] * vec, axis=0))
            return out

        def w_gather(onehot):
            """Per-lane column of W at the one-hot coordinate."""
            return w_dot(onehot)

        def w_apply(coeffs):
            """W @ coeffs: (n, T) from a list of 2m (T,) lanes."""
            th = theta[...]
            acc = jnp.zeros((n, T), dtype)
            for p in range(m):
                acc = acc + coeffs[p][None, :] * Y[p]
            for p in range(m):
                acc = acc + (coeffs[m + p][None, :] * th) * S[p]
            return acc

        # ------------------------------------------------------------------

        def cauchy_point(active):
            g = G[...]
            x = X[...]
            tb = jnp.where(
                g < 0.0, (x - up) / g,
                jnp.where(g > 0.0, (x - lo) / g, inf),
            )
            d0 = jnp.where(tb > 0.0, -g, jnp.zeros((n, T), dtype))
            tbr[...] = jnp.where(tb > 0.0, tb, inf)
            dgc[...] = d0
            xcp[...] = x
            fixedm[...] = jnp.zeros((n, T), dtype)

            p0 = w_dot(d0)
            for r in range(2 * m):
                pvec[r] = p0[r]
                cvec[r] = jnp.zeros((T,), dtype)
            Mp = mid_solve(p0)
            th = theta[...]
            f1 = -jnp.sum(d0 * d0, axis=0, keepdims=True)         # (1, T)
            pMp = jnp.zeros((1, T), dtype)
            for r in range(2 * m):
                pMp = pMp + (p0[r] * Mp[r])[None, :]
            f2 = -th * f1 - pMp

            def seg_min(f1v, f2v):
                return jnp.where(
                    f2v > eps_mach, -f1v / f2v,
                    jnp.where(f1v < 0.0, inf, jnp.zeros((1, T), dtype)),
                )

            # sc1 rows: 0=f1, 1=f2, 2=t_old, 3=dt_min
            sc1[0] = f1[0]
            sc1[1] = f2[0]
            sc1[2] = jnp.zeros((T,), dtype)
            sc1[3] = seg_min(f1, f2)[0]

            def cond(s):
                i, n_go = s
                return (i < n) & (n_go > 0)

            def body(s):
                i, _ = s
                f1 = sc1[0][None, :]
                f2 = sc1[1][None, :]
                t_old = sc1[2][None, :]
                dt_min = sc1[3][None, :]

                t_b = jnp.min(tbr[...], axis=0, keepdims=True)    # (1, T)
                b_idx = jnp.argmin(tbr[...], axis=0)[None, :]     # (1, T)
                onehot = (row_iota == b_idx).astype(dtype)
                go = active & jnp.isfinite(t_b) & (dt_min >= t_b - t_old)
                gof = go.astype(dtype)

                # lanes with no finite breakpoint left have t_b = +inf;
                # their masked update `gof * dt * pvec` would still compute
                # 0 * inf = NaN and poison cvec permanently (reachable with
                # free infinite-bound coordinates: zb below stays finite
                # because only finite breakpoints are ever selected, but dt
                # must be zeroed explicitly)
                dt = jnp.where(go, t_b - t_old, jnp.zeros((1, T), dtype))
                gb = jnp.sum(G[...] * onehot, axis=0, keepdims=True)
                db = jnp.sum(dgc[...] * onehot, axis=0, keepdims=True)
                ub_b = jnp.sum(up * onehot, axis=0, keepdims=True)
                lb_b = jnp.sum(lo * onehot, axis=0, keepdims=True)
                bound_b = jnp.where(db > 0.0, ub_b, lb_b)
                xb = jnp.sum(X[...] * onehot, axis=0, keepdims=True)
                zb = bound_b - xb

                cl = [cvec[r] + gof[0] * dt[0] * pvec[r] for r in range(2 * m)]
                for r in range(2 * m):
                    cvec[r] = cl[r]
                Mc = mid_solve(cl)
                pl = [pvec[r] for r in range(2 * m)]
                Mp = mid_solve(pl)
                wb = w_gather(onehot)
                Mw = mid_solve(wb)
                wMc = jnp.zeros((1, T), dtype)
                wMp = jnp.zeros((1, T), dtype)
                wMw = jnp.zeros((1, T), dtype)
                for r in range(2 * m):
                    wMc = wMc + (wb[r] * Mc[r])[None, :]
                    wMp = wMp + (wb[r] * Mp[r])[None, :]
                    wMw = wMw + (wb[r] * Mw[r])[None, :]

                th = theta[...]
                f1n = f1 + dt * f2 + gb * gb + th * gb * zb - gb * wMc
                f2n = f2 - th * gb * gb - 2.0 * gb * wMp - gb * gb * wMw
                for r in range(2 * m):
                    pvec[r] = pvec[r] + gof[0] * gb[0] * wb[r]

                fix = (onehot > 0) & go
                dgc[...] = jnp.where(fix, 0.0, dgc[...])
                xcp[...] = jnp.where(fix, bound_b, xcp[...])
                fixedm[...] = jnp.where(fix, 1.0, fixedm[...])
                tbr[...] = jnp.where(fix, inf, tbr[...])

                f1 = jnp.where(go, f1n, f1)
                f2 = jnp.where(go, f2n, f2)
                dt_min_n = seg_min(f1, f2)
                sc1[0] = f1[0]
                sc1[1] = f2[0]
                sc1[2] = jnp.where(go, t_b, t_old)[0]
                sc1[3] = jnp.where(go, dt_min_n, dt_min)[0]

                # continue while some lane still consumes breakpoints
                t_next = jnp.min(tbr[...], axis=0, keepdims=True)
                more = active & jnp.isfinite(t_next) & (
                    sc1[3][None, :] >= t_next - sc1[2][None, :]
                )
                return (i + 1, jnp.sum(more.astype(jnp.int32),
                                       dtype=jnp.int32))

            lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

            dt_min = jnp.maximum(sc1[3][None, :], 0.0)
            t_cp = sc1[2][None, :] + dt_min
            # dt_min is +inf for lanes whose model minimizer lies beyond all
            # breakpoints; there the remaining direction (and p) are exactly
            # zero, so mask the inf * 0 = NaN products (same guard as
            # solvers/lbfgsb.py _cauchy_point)
            dt_fin = jnp.where(jnp.isfinite(dt_min), dt_min, 0.0)
            for r in range(2 * m):
                cvec[r] = cvec[r] + dt_fin[0] * pvec[r]
            xcp[...] = jnp.where(
                fixedm[...] > 0,
                xcp[...],
                X[...] + jnp.where(dgc[...] == 0.0, 0.0, t_cp * dgc[...]),
            )
            # free = had room to move and not fixed during the sweep
            tb_pos = jnp.where(
                G[...] < 0.0, (X[...] - up) / G[...],
                jnp.where(G[...] > 0.0, (X[...] - lo) / G[...], inf),
            )
            return (tb_pos > 0.0) & (fixedm[...] == 0.0)

        # ------------------------------------------------------------------

        def subspace(free):
            th = theta[...]
            cl = [cvec[r] for r in range(2 * m)]
            Mc = mid_solve(cl)
            r_full = G[...] + th * (xcp[...] - X[...]) - w_apply(Mc)
            rF = jnp.where(free, r_full, 0.0)
            freef = free.astype(dtype)

            # subspace middle matrix P = [[-E, Gm],[Gm^T, H]] (chronological)
            # E = Dh + Y_F Y_F^T / theta ; Gm = L^T - Y_F S_F^T ;
            # H = theta * S_A S_A^T
            YF = [Y[p] * freef for p in range(m)]
            SF = [S[p] * freef for p in range(m)]
            SA = [S[p] * (1.0 - freef) for p in range(m)]
            E = [[None] * m for _ in range(m)]
            Gm = [[None] * m for _ in range(m)]
            H = [[None] * m for _ in range(m)]
            for p_ in range(m):
                for q_ in range(m):
                    if q_ <= p_:
                        e_ = jnp.sum(YF[p_] * YF[q_], axis=0) / th[0]
                        if p_ == q_:
                            e_ = e_ + Dh[p_]
                        E[p_][q_] = e_
                        E[q_][p_] = e_
                        h_ = th[0] * jnp.sum(SA[p_] * SA[q_], axis=0)
                        if p_ == q_:
                            h_ = h_ + jnp.where(
                                validf[p_] > 0,
                                jnp.zeros((T,), dtype),
                                jnp.ones((T,), dtype),
                            )
                        H[p_][q_] = h_
                        H[q_][p_] = h_
                    lq = Lc[q_, p_] if q_ > p_ else jnp.zeros((T,), dtype)
                    Gm[p_][q_] = lq - jnp.sum(YF[p_] * SF[q_], axis=0)

            # lane-wide Cholesky of E (unrolled, Python-list storage)
            Ech = [[None] * m for _ in range(m)]
            for j in range(m):
                d = E[j][j]
                for k in range(j):
                    d = d - Ech[j][k] * Ech[j][k]
                dj = jnp.sqrt(jnp.maximum(d, eps_mach))
                Ech[j][j] = dj
                for i2 in range(j + 1, m):
                    s_ = E[i2][j]
                    for k in range(j):
                        s_ = s_ - Ech[i2][k] * Ech[j][k]
                    Ech[i2][j] = s_ / dj

            def ech_solve(b):
                y_ = [None] * m
                for i2 in range(m):
                    s_ = b[i2]
                    for k in range(i2):
                        s_ = s_ - Ech[i2][k] * y_[k]
                    y_[i2] = s_ / Ech[i2][i2]
                z = [None] * m
                for i2 in range(m - 1, -1, -1):
                    s_ = y_[i2]
                    for k in range(i2 + 1, m):
                        s_ = s_ - Ech[k][i2] * z[k]
                    z[i2] = s_ / Ech[i2][i2]
                return z

            # Schur2 = H + Gm^T E^{-1} Gm ; factor into Sch (reuse scratch)
            EinvG = [ech_solve([Gm[i2][j] for i2 in range(m)])
                     for j in range(m)]           # column j
            for p_ in range(m):
                for q_ in range(m):
                    if q_ > p_:
                        continue
                    v = H[p_][q_]
                    for k in range(m):
                        v = v + Gm[k][p_] * EinvG[q_][k]
                    Sch[p_, q_] = v
            for j in range(m):
                d = Sch[j, j]
                for k in range(j):
                    d = d - Sch[j, k] * Sch[j, k]
                dj = jnp.sqrt(jnp.maximum(d, eps_mach))
                Sch[j, j] = dj
                for i2 in range(j + 1, m):
                    s_ = Sch[i2, j]
                    for k in range(j):
                        s_ = s_ - Sch[i2, k] * Sch[j, k]
                    Sch[i2, j] = s_ / dj

            # u2 = W_F^T rF ; block solve P v = u2
            u2 = w_dot(rF)
            a, b = u2[:m], u2[m:]
            Einv_a = ech_solve(a)
            rhs = []
            for i2 in range(m):
                s_ = b[i2]
                for k in range(m):
                    s_ = s_ + Gm[k][i2] * Einv_a[k]
                rhs.append(s_)
            v = sch_solve(rhs)
            u = []
            for i2 in range(m):
                s_ = -a[i2]
                for k in range(m):
                    s_ = s_ + Gm[i2][k] * v[k]
                u.append(s_)
            u = ech_solve(u)

            dvec = rF / th + jnp.where(
                free, w_apply(u + v), 0.0
            ) / (th * th)
            du = -dvec

            pos = (up - xcp[...]) / du
            neg = (lo - xcp[...]) / du
            steps = jnp.where(du > 0.0, pos, jnp.where(du < 0.0, neg, inf))
            steps = jnp.where(free, steps, inf)
            steps = jnp.where(jnp.isnan(steps), inf, steps)
            alpha = jnp.minimum(
                jnp.ones((1, T), dtype), jnp.min(steps, axis=0, keepdims=True)
            )
            # clip away rounding dust: an epsilon-outward direction on a
            # coordinate sitting exactly on its bound collapses the line
            # search's max feasible step to -0.0 (see solvers/lbfgsb.py
            # _subspace_step); mathematically xbar is already in the box
            return jnp.clip(
                xcp[...] + alpha * jnp.where(free, du, 0.0), lo, up)

        # ------------------------------------------------------------------

        def line_search(d, active):
            """Projected value-only Armijo backtracking with the max
            feasible step as the initial trial cap."""
            g0d = jnp.sum(G[...] * d, axis=0, keepdims=True)
            f0 = Fv[...]
            if unbounded:
                # every bound infinite (static): stpmax = inf, cap = 1
                ls_t[...] = jnp.ones((1, T), dtype)
            else:
                pos = (up - X[...]) / d
                neg = (lo - X[...]) / d
                fs = jnp.where(d > 0.0, pos, jnp.where(d < 0.0, neg, inf))
                fs = jnp.where(jnp.isnan(fs), inf, fs)
                stpmax = jnp.min(fs, axis=0, keepdims=True)
                ls_t[...] = jnp.minimum(jnp.ones((1, T), dtype), stpmax)
            ls_done[...] = (~active).astype(jnp.int32)

            def cond(s):
                i, n_active = s
                return (i < max_iter_ls) & (n_active > 0)

            def body(s):
                i, _ = s
                t = ls_t[...]
                done = ls_done[...] > 0
                fv_t = bval(X[...] + t * d)
                ok = (fv_t <= f0 + c1 * t * g0d) & jnp.isfinite(fv_t)
                keep = done | ok
                ls_t[...] = jnp.where(keep, t, t * 0.5)
                ls_done[...] = keep.astype(jnp.int32)
                return (i + 1,
                        jnp.sum((~keep).astype(jnp.int32), dtype=jnp.int32))

            lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
            return ls_t[...]

        # ------------------------------------------------------------------

        def two_loop(g):
            """d = -B^{-1} g over the chronological history (H0 =
            theta^{-1} I) — returns r_tl with x - r_tl the QN point."""
            th = theta[...]
            q = g
            alphas = [None] * m
            for j in range(m - 1, -1, -1):
                vj = (validf[j] > 0).astype(dtype)[None, :]
                a = (vj / Dh[j][None, :]) * jnp.sum(
                    S[j] * q, axis=0, keepdims=True)
                q = q - a * Y[j]
                alphas[j] = a
            r_tl = q / th
            for j in range(m):
                vj = (validf[j] > 0).astype(dtype)[None, :]
                b = (vj / Dh[j][None, :]) * jnp.sum(
                    Y[j] * r_tl, axis=0, keepdims=True)
                r_tl = r_tl + (alphas[j] - b) * S[j]
            return r_tl

        # the convergence/domain mask is a pure function of solver state,
        # which only changes inside the body — so the end-of-body mask (the
        # loop-continue test) IS the next trip's entry mask.  Cache it in a
        # scratch row instead of recomputing pg/factr at body entry
        # (saves ~4 of ~112 (n, T) passes per iteration).
        def read_active():
            return actm[...] > 0.5

        def store_active():
            mask = active_mask()
            actm[...] = mask.astype(dtype)
            return jnp.sum(mask.astype(jnp.int32)) > 0

        def body_unbounded(carry):
            """Statically all-infinite box (VERDICT round-3 item 8): the
            interior gate's conditions hold identically — no coordinate is
            ever blocked, t_first = inf, the QN point is always "in box" —
            so the fast path IS the iteration, and the gate's
            w_dot(d0)/mid_solve/dt0 probes AND the middle factorization
            behind them are skipped at trace time (the gate measured ~12%
            of the headline kernel, BENCH_NOTES round-3 ablation)."""
            i, _go = carry
            active = read_active()
            # the two-loop needs only the patched curvature diagonal
            for p in range(m):
                Dh[p] = jnp.where(validf[p] > 0, SYt[p, p],
                                  jnp.ones((T,), dtype))
            dvec[...] = -two_loop(G[...])
            return finish_step(i, active)

        def body(carry):
            i, _go = carry
            active = read_active()

            build_middle()

            # ---- interior FAST PATH (exact-equivalence gate, not a
            # heuristic): when (a) no coordinate is pinned against a bound
            # by its gradient, (b) the first GCP segment's model minimizer
            # precedes the first breakpoint (the walk would consume
            # nothing, so xcp sits on the unbroken steepest segment and the
            # free set is every coordinate), and (c) the full quasi-Newton
            # point x - B^{-1} g lies inside the box (the subspace alpha*
            # is 1), the BLNZ primal subspace step from the Cauchy point
            # IS x - B^{-1} g (BLNZ paper section 5.1: the model minimizer
            # over all-free coordinates is xcp-independent).  The compact
            # form and the two-loop recursion are exact inverses given the
            # same pairs and H0 = theta^{-1} I, so the direction comes from
            # 4m (n, T) passes instead of the walk + the O(m^2) (n, T)
            # free-set Gram rebuild — measured ~2.4x on the headline where
            # bounds never activate.  The gate is tile-wide (lockstep).
            g = G[...]
            x = X[...]
            tb = jnp.where(
                g < 0.0, (x - up) / g,
                jnp.where(g > 0.0, (x - lo) / g, inf),
            )
            blocked = jnp.min(tb, axis=0, keepdims=True) <= 0.0
            t_first = jnp.min(jnp.where(tb > 0.0, tb, inf), axis=0,
                              keepdims=True)
            d0 = jnp.where(tb > 0.0, -g, jnp.zeros((n, T), dtype))
            p0 = w_dot(d0)
            Mp0 = mid_solve(p0)
            pMp = jnp.zeros((1, T), dtype)
            for r_ in range(2 * m):
                pMp = pMp + (p0[r_] * Mp0[r_])[None, :]
            th = theta[...]
            f1_0 = -jnp.sum(d0 * d0, axis=0, keepdims=True)
            f2_0 = -th * f1_0 - pMp
            dt0 = jnp.where(
                f2_0 > eps_mach, -f1_0 / f2_0,
                jnp.where(f1_0 < 0.0, inf, jnp.zeros((1, T), dtype)))

            # two-loop d = -B^{-1} g over the same chronological history
            xn = x - two_loop(g)
            in_box = jnp.min(
                jnp.minimum(xn - lo, up - xn), axis=0, keepdims=True) >= 0.0
            okf = (~blocked) & (dt0 < t_first) & in_box
            n_slow = jnp.sum((active & ~okf).astype(jnp.int32),
                             dtype=jnp.int32)

            @pl.when(n_slow == 0)
            def _fast():
                # clip only removes +-1 ulp dust (in_box already holds)
                dvec[...] = jnp.clip(xn, lo, up) - x

            @pl.when(n_slow > 0)
            def _slow():
                free = cauchy_point(active)
                dvec[...] = subspace(free) - X[...]

            return finish_step(i, active)

        def finish_step(i, active):
            d = dvec[...]
            t = line_search(d, active)

            X_new = X[...] + t * d
            f_new, g_new = bvg(X_new)
            # the gradient check matches the unfused poisoned-step guard
            # (solvers/lbfgsb.py): finite f with a non-finite gradient
            # would NaN-poison the next iteration's breakpoints
            ok = (
                jnp.isfinite(f_new)
                & jnp.all(jnp.isfinite(X_new), axis=0, keepdims=True)
                & jnp.all(jnp.isfinite(g_new), axis=0, keepdims=True)
            )
            # Fortran mainlb failure semantics (as in solvers/lbfgsb.py
            # step_fn): a line search that accepted a non-descent trial, a
            # zero step, or a poisoned step restores the previous iterate;
            # lanes with history restart from a wiped model, lanes without
            # terminate ABNORMAL instead of stall-exiting CONVERGED
            no_move = jnp.all(X_new == X[...], axis=0, keepdims=True)
            fail = active & (
                (~ok) | (f_new > Fv[...]) | (t <= 0.0) | no_move)
            hh = validf[0][None, :]
            for p in range(1, m):
                hh = jnp.maximum(hh, validf[p][None, :])
            has_hist = hh > 0
            restart = fail & has_hist
            abn[...] = jnp.where(
                fail & ~has_hist, jnp.int32(1), abn[...])
            keepx = ok & ~fail
            X_new = jnp.where(keepx, X_new, X[...])
            f_new = jnp.where(keepx, f_new, Fv[...])
            g_new = jnp.where(keepx, g_new, G[...])

            s_vec = X_new - X[...]
            y_vec = g_new - G[...]
            if n_consts:
                # consts-bearing kernels: the plain lane reduction here gets
                # a replicated-layout accumulator Mosaic cannot lower
                # ("Unsupported output implicit dimension").  An unrolled
                # halving tree of static row-slices lowers cleanly with no
                # extra scoped VMEM (an MXU ones-row contraction also lowers
                # but its staging blows the 16 MB scoped limit).  Kept off
                # the const-free path so the validated headline kernel stays
                # bit-identical.
                def lane_sum(v):
                    while v.shape[0] > 1:
                        k = v.shape[0]
                        half = k // 2
                        head = v[:half] + v[half : 2 * half]
                        if k % 2:
                            first = lax.broadcasted_iota(
                                jnp.int32, (half, T), 0
                            ) == 0
                            head = head + jnp.where(first, v[-1:], 0.0)
                        v = head
                    return v

                sy = lane_sum(s_vec * y_vec)
                yy = lane_sum(y_vec * y_vec)
            else:
                sy = jnp.sum(s_vec * y_vec, axis=0, keepdims=True)
                yy = jnp.sum(y_vec * y_vec, axis=0, keepdims=True)
            accept = active & ok & (sy > curvature_eps * yy)

            # shift the chronological history ONLY on accepted pairs
            # (static indices; the unfused reference keeps history intact
            # on a rejected step — an unconditional shift would discard one
            # valid pair per rejection and wipe the model after m of them)
            acc = accept
            for p in range(m - 1):
                S[p] = jnp.where(acc, S[p + 1], S[p])
                Y[p] = jnp.where(acc, Y[p + 1], Y[p])
                validf[p] = jnp.where(acc[0], validf[p + 1], validf[p])
            S[m - 1] = jnp.where(acc, s_vec, S[m - 1])
            Y[m - 1] = jnp.where(acc, y_vec, Y[m - 1])
            validf[m - 1] = jnp.where(
                acc[0], jnp.ones((T,), dtype), validf[m - 1])
            theta[...] = jnp.where(acc, yy / sy, theta[...])
            # shift the Gram tables and refresh the new row/column (for
            # rejected lanes the refresh recomputes the unchanged entries)
            for p in range(m - 1):
                for q in range(m - 1):
                    SYt[p, q] = jnp.where(acc[0], SYt[p + 1, q + 1],
                                          SYt[p, q])
                    SSt[p, q] = jnp.where(acc[0], SSt[p + 1, q + 1],
                                          SSt[p, q])
            for j in range(m):
                SYt[m - 1, j] = jnp.sum(S[m - 1] * Y[j], axis=0)
                SYt[j, m - 1] = jnp.sum(S[j] * Y[m - 1], axis=0)
                SSt[m - 1, j] = jnp.sum(S[m - 1] * S[j], axis=0)
                SSt[j, m - 1] = SSt[m - 1, j]

            # history restart on failed lanes: zero S/Y (inert W rows),
            # invalidate slots, reset theta, clear the Gram tables
            zrow = jnp.zeros((T,), dtype)
            for p in range(m):
                S[p] = jnp.where(restart, 0.0, S[p])
                Y[p] = jnp.where(restart, 0.0, Y[p])
                validf[p] = jnp.where(restart[0], zrow, validf[p])
                for q in range(m):
                    SYt[p, q] = jnp.where(restart[0], zrow, SYt[p, q])
                    SSt[p, q] = jnp.where(restart[0], zrow, SSt[p, q])
            theta[...] = jnp.where(restart, jnp.ones((1, T), dtype),
                                   theta[...])

            # a restart disables the stall exit for the retry iteration
            Fprev[...] = jnp.where(
                restart, jnp.full((1, T), jnp.inf, dtype),
                jnp.where(active, Fv[...], Fprev[...]))
            X[...] = jnp.where(active, X_new, X[...])
            Fv[...] = jnp.where(active, f_new, Fv[...])
            G[...] = jnp.where(active, g_new, G[...])
            iters[...] = iters[...] + active.astype(jnp.int32)

            return (i + 1, store_active())

        def cond(carry):
            i, go = carry
            return (i < max_iter) & go

        lax.while_loop(cond, body_unbounded if unbounded else body,
                       (jnp.int32(0), store_active()))

        finite = jnp.isfinite(Fv[...])
        conv = pg_inf_norm() <= pgtol
        fmax = jnp.maximum(
            jnp.maximum(jnp.abs(Fv[...]), jnp.abs(Fprev[...])), 1.0
        )
        conv = conv | (
            jnp.isfinite(Fprev[...])
            & ((Fprev[...] - Fv[...]) <= f_rtol * fmax)
        )
        status = jnp.where(
            abn[...] > 0,
            jnp.int32(Status.ABNORMAL),
            jnp.where(
                conv & finite,
                jnp.int32(Status.CONVERGED),
                jnp.where(~finite, jnp.int32(Status.OUT_OF_DOMAIN),
                          jnp.int32(Status.MAX_ITER_REACHED)),
            ),
        )
        x_out[0] = X[...]
        f_out[...] = Fv[...]
        it_out[...] = iters[...]
        st_out[...] = status

    return kernel


def lbfgsb_solve_fused(
    f: Callable,
    x0: jax.Array,                  # (B, n)
    lower: jax.Array,               # (n,) shared or (B, n) per-lane
    upper: jax.Array,               # (n,) shared or (B, n) per-lane
    consts: tuple = (),             # problem-data arrays: f(x, *consts)
    **kwargs,
) -> SolveResult:
    """Batched box-constrained solves with the fused L-BFGS-B kernel.

    ``B`` must be a multiple of ``tile``.  Keep ``m`` small (default 5, the
    reference's default): the in-kernel factorizations unroll in m.

    This wrapper is NOT jitted so that statically-unbounded problems
    (every bound infinite, CONCRETE at call time) can be detected and
    routed to the dedicated unbounded kernel body, which skips the
    interior gate and the middle factorization at trace time.  Inside
    the jitted implementation the bounds are tracers and the check could
    never succeed (round-4 review finding — the original in-jit check
    made the unbounded body unreachable).  Called under an outer ``jit``
    the detection degrades safely to the general bounded kernel.
    """
    try:
        import numpy as _np

        unbounded = bool(_np.all(_np.isneginf(_np.asarray(lower)))
                         and _np.all(_np.isposinf(_np.asarray(upper))))
    except (TypeError, jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        unbounded = False
    return _lbfgsb_solve_fused_jit(f, x0, lower, upper, consts,
                                   unbounded=unbounded, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "f", "m", "pgtol", "factr", "max_iter", "max_iter_ls", "tile", "c1",
        "interpret", "vmem_limit_bytes", "unbounded",
    ),
)
def _lbfgsb_solve_fused_jit(
    f: Callable,
    x0: jax.Array,                  # (B, n)
    lower: jax.Array,               # (n,) shared or (B, n) per-lane
    upper: jax.Array,               # (n,) shared or (B, n) per-lane
    consts: tuple = (),             # problem-data arrays: f(x, *consts)
    *,
    m: int = 5,
    pgtol: float = 1e-5,
    factr: float = 1e7,
    max_iter: int = 500,
    max_iter_ls: int = 20,
    tile: int = 128,
    c1: float = 1e-3,
    interpret: bool = False,
    vmem_limit_bytes: int = None,
    unbounded: bool = False,
) -> SolveResult:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = x0.shape
    assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
    dtype = x0.dtype
    T = tile

    if vmem_limit_bytes is None and not interpret:
        # per-program working set (X/G/S/Y + the five (n,T) GCP slabs);
        # mid-n shapes need the compiler guardrail raised the same way the
        # tall kernel does — small shapes (the headline) keep the default
        # None and their existing compile-cache keys.  The raise threshold
        # uses the SAME x2.5 margin the sizing does (a x2 threshold left
        # shapes in the (6.4, 8] MB band on the 16 MB default although the
        # margin model predicts up to 20 MB — round-4 review finding).
        need = vmem_footprint_bytes(n, m, T, consts)
        if need * VMEM_MARGIN > 16 * 2 ** 20:
            vmem_limit_bytes = min(
                int(need * VMEM_MARGIN), VMEM_BUDGET_BYTES)

    xT = x0.T.reshape(1, n, B)
    # bounds: shared (n,) replicated across lanes, or PER-LANE (B, n)
    # boxes (a batch-axis capability the single-instance reference cannot
    # express) — the kernel body sees an (n, T) block either way
    per_lane = jnp.ndim(lower) == 2
    if per_lane:
        assert jnp.shape(lower) == (B, n) and jnp.shape(upper) == (B, n), (
            jnp.shape(lower), jnp.shape(upper))
        loT = lower.astype(dtype).T.reshape(1, n, B)
        upT = upper.astype(dtype).T.reshape(1, n, B)
        bspec = pl.BlockSpec((1, n, T), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM)
    else:
        loT = jnp.broadcast_to(
            lower.astype(dtype)[:, None], (n, T)).reshape(1, n, T)
        upT = jnp.broadcast_to(
            upper.astype(dtype)[:, None], (n, T)).reshape(1, n, T)
        bspec = pl.BlockSpec((1, n, T), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    consts_p, const_1d = _pack_consts(consts)
    kernel = _make_kernel(
        f, const_1d, n, m, T, pgtol, factr, max_iter, max_iter_ls, c1,
        dtype, unbounded=unbounded
    )
    const_specs = [
        pl.BlockSpec(c.shape, lambda b, _nd=c.ndim: (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for c in consts_p
    ]
    scratch = [
        pltpu.VMEM((n, T), dtype),       # X
        pltpu.VMEM((n, T), dtype),       # G
        pltpu.VMEM((1, T), dtype),       # Fv
        pltpu.VMEM((1, T), dtype),       # Fprev
        pltpu.VMEM((m, n, T), dtype),    # S
        pltpu.VMEM((m, n, T), dtype),    # Y
        pltpu.VMEM((m, m, T), dtype),    # SYt
        pltpu.VMEM((m, m, T), dtype),    # SSt
        pltpu.VMEM((m, T), dtype),       # Dh
        pltpu.VMEM((m, m, T), dtype),    # Lc
        pltpu.VMEM((m, m, T), dtype),    # Sch
        pltpu.VMEM((1, T), dtype),       # theta
        pltpu.VMEM((m, T), dtype),       # validf
        pltpu.VMEM((1, T), jnp.int32),   # iters
        pltpu.VMEM((n, T), dtype),       # tbr
        pltpu.VMEM((n, T), dtype),       # dgc
        pltpu.VMEM((n, T), dtype),       # xcp
        pltpu.VMEM((n, T), dtype),       # fixedm
        pltpu.VMEM((2 * m, T), dtype),   # cvec
        pltpu.VMEM((2 * m, T), dtype),   # pvec
        pltpu.VMEM((4, T), dtype),       # sc1 (f1, f2, t_old, dt_min)
        pltpu.VMEM((1, T), dtype),       # ls_t
        pltpu.VMEM((1, T), jnp.int32),   # ls_done
        pltpu.VMEM((1, T), jnp.int32),   # abn (abnormal-termination flag)
        pltpu.VMEM((n, T), dtype),       # dvec (search direction)
        pltpu.VMEM((1, T), dtype),       # actm (cached active mask)
    ]
    x_out, f_out, it_out, st_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((1, n, T), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            bspec,
            bspec,
            *const_specs,
        ],
        out_specs=(
            pl.BlockSpec((1, n, T), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda b: (0, b), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        # None keeps the default 16 MB scoped limit (and the compile-cache
        # key of every existing shape); consts-bearing kernels need more —
        # their scoped-vmem accounting inflates ~3x (v5e has 128 MB VMEM)
        **(
            {}
            if vmem_limit_bytes is None
            else {
                "compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_limit_bytes
                )
            }
        ),
    )(xT, loT, upT, *consts_p)

    x_final = x_out[0].T
    f_host = (lambda x: f(x, *consts)) if consts else f
    _, g_final = jax.vmap(jax.value_and_grad(f_host))(x_final)
    return SolveResult(
        x_final, f_out[0], g_final, it_out[0], st_out[0],
        pg_norm=batched_pg_inf_norm(x_final, g_final, lower, upper))


# objective -> scaled wrapper; weak keys so dynamically-created objectives
# are not pinned forever (the wrapper closes over f, so a strong dict would
# keep both alive unboundedly in a long-lived process)
import weakref

_SCALED_WRAPPERS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def lbfgsb_solve_fused_scaled(
    f: Callable,
    x0: jax.Array,                  # (B, n)
    lower: jax.Array,               # (n,) shared or (B, n) per-lane
    upper: jax.Array,               # (n,) shared or (B, n) per-lane
    diag: jax.Array,                # (n,) positive preconditioner diagonal
    consts: tuple = (),
    **fused_kwargs,
) -> SolveResult:
    """Scaled (diagonally preconditioned) fused solve: the same exact change
    of variables as :func:`solvers.lbfgsb_minimize_scaled` (``z = sqrt(d) x``
    maps boxes to boxes and makes the kernel's implicit ``theta*I`` scaling
    equal ``theta*diag(d)`` in the original coordinates), applied around the
    whole-solve VMEM kernel.  ``pgtol``/``factr`` act in the scaled metric.

    Real-TPU note: the scale rides the kernel's problem-data (consts)
    path as a plain 1-D ``(n,)`` array, which ``_pack_consts`` ships
    sublane-resident and vmaps per lane — the wrapper body divides by its
    per-instance ``(n,)`` slice directly.  (Historical: before the
    consts layout fix this needed a ``(1, n)`` block plus a ``+ 0*z``
    materialization hack and a 64 MB vmem default — BENCH_NOTES rounds
    1 and 4.)"""
    s = jnp.sqrt(jnp.asarray(diag, x0.dtype))

    # The wrapper is memoized on f: lbfgsb_solve_fused jit-caches on the
    # static objective's identity, and a fresh closure per call would
    # force a minutes-long retrace+Mosaic lowering every call.
    try:
        fz = _SCALED_WRAPPERS.get(f)
    except TypeError:       # non-weakref-able callable: fresh wrapper per call
        fz = None
    if fz is None:
        try:
            # the wrapper must reference f WEAKLY: a strong capture would
            # keep the WeakKeyDictionary key alive through its own value
            # and the entry (plus f's captured arrays) would never collect
            fref = weakref.ref(f)

            def fz(z, s_, *cs):
                return fref()(z / s_, *cs)

            _SCALED_WRAPPERS[f] = fz
        except TypeError:

            def fz(z, s_, *cs, _f=f):
                return _f(z / s_, *cs)

    r = lbfgsb_solve_fused(
        fz, x0 * s[None, :], lower * s, upper * s, (s, *consts),
        **fused_kwargs
    )
    # pg_norm stays in the SCALED metric (the metric pgtol acts in)
    return SolveResult(r.x / s[None, :], r.f, r.g * s[None, :],
                       r.iterations, r.status, pg_norm=r.pg_norm)
