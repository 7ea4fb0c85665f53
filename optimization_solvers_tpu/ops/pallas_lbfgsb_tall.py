"""Fused Pallas TPU kernel: batched **large-n L-BFGS-B** solves, tall layout.

The HBM-resident workload class (BASELINE config 4: n = 10,000 bounded
log-sum-exp) that :mod:`pallas_lbfgsb` cannot serve: its lane-last (n, T)
layout puts the batch on the 128-lane axis, so the small tiles a 10k-dim
problem forces (T <= 8 for VMEM) would waste 120/128 lanes, and its GCP
sweep retires ONE breakpoint per step — measured ~2,400 walked segments
per iteration on this problem (tools/probe_config4_counts.py), i.e.
O(segments * n) work per lane.  This kernel is the same Byrd-Lu-Nocedal-
Zhu algorithm (same reference capability: the Fortran ``setulb_`` reached
from ``/root/reference/src/quasi_newton/lbfgsb.rs:34-85``) re-laid-out for
few-lane/huge-n:

  * **tall (T, n) layout**: T instances on the sublane axis, the n
    coordinates on the 128-lane axis — every vector op runs at full lane
    occupancy at any T >= 8; reductions are lane-axis sums.
  * **GCP by segment bisection, not a walk** (the TPU-native replacement
    for the Fortran's sorted breakpoint sweep): the walk's running state
    has CLOSED FORMS at any path position t — with u(t)_i =
    -g_i min(t, t_i) on moving coordinates, p(t) = W^T d(t), c(t) =
    W^T u(t), f1(t+) = (theta*t - 1) * sum_free g_i^2 - p^T M c, f2(t+) =
    theta * sum_free g_i^2 - p^T M p (telescoping the per-breakpoint
    recurrences of solvers/lbfgsb.py ``_cauchy_point``) — so the Cauchy
    segment is found by ~20 geometric bisection probes over breakpoint
    VALUES, each a handful of threshold-masked (T, n) reductions, instead
    of ~2,400 sequential segment crossings.  No sort, no gathers.
  * the compact middle matrix is inverted EXPLICITLY once per iteration
    (the block elimination of solvers/lbfgsb.py ``_middle_inverse``) into
    per-lane (T, 2m) rows, so each bisection probe's quadratic forms are
    ~2m small row ops rather than a triangular re-solve.
  * line search: projected value-only Armijo backtracking with the max
    feasible step as the initial cap — the same pairing as the small-n
    fused kernel (different trial rule than the XLA path's dcsrch, so
    iteration counts differ; minimizers agree — the established fused
    parity standard, tests/test_fused_lbfgsb.py).  ``line_search=
    "dcsrch"`` (round 5) instead runs the MINPACK dcsrch strong-Wolfe
    state machine in-kernel — the exact pairing of the Fortran core the
    reference drives (``lbfgsb.rs:36-57``) — closing the iteration-count
    semantics gap at the cost of one gradient-bearing trial eval per
    line-search trip.

Semantics deviation (documented): the sequential walk stops at the FIRST
local minimizer of the piecewise-quadratic model along the projection
path; bisection assumes the path derivative f1 crosses zero once, which
holds whenever the model is convex along the arc (always true in exact
arithmetic for B = theta I - W M W^T SPD within a segment; breakpoint
jumps of f1 are sign-indefinite only in degenerate tie/curvature cases).
Where several local minima exist the kernel may select a later one; the
parity tests cross-check trajectories against the XLA backend on the
config-4 workload class and random bounded geometries.  Empirical bound
(round 4): over 400 lanes / 100 random bound-active SPD quadratics with
mixed finite/infinite boxes (shifted optima, cond up to 1e3), the final
iterates agree with the sequential-walk XLA backend to 5.2e-7 in x and
8.3e-13 in f — zero divergent solves observed.

Mosaic rules followed (see ops/pallas_lbfgs.py): scalar-only loop
carries (all evolving vectors live in VMEM scratch), float 0/1 masks,
static history indexing (shift-not-ring), unrolled small factorizations.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl

from optimization_solvers_tpu.core.numerics import batched_pg_inf_norm
from optimization_solvers_tpu.core.types import SolveResult, Status


def vmem_footprint_bytes(n: int, m: int, tile: int, consts=()) -> int:
    """Estimated per-program VMEM working set of the tall kernel: slabs +
    histories + a margin for the compiler's transient (T, n) temporaries.
    Single source of truth for both the kernel's own vmem_limit and the
    frontend router's fit check (keeping the two in sync was a round-4
    review finding)."""
    import numpy as _np

    return (2 * m + 12) * tile * n * 4 + sum(
        int(_np.size(c)) * 4 for c in consts)


VMEM_BUDGET_BYTES = 120 * 2 ** 20       # v5e guardrail used by the router
VMEM_MARGIN = 2.5                       # compiler-accounting inflation


def _row_value_and_grad(f: Callable):
    """(T, n) -> ((T, 1), (T, n)) value-and-grad over the sublane axis."""
    bvg = jax.vmap(jax.value_and_grad(f), in_axes=0, out_axes=(0, 0))

    def wrapped(X):
        fv, gv = bvg(X)
        return fv[:, None], gv

    return wrapped


def _row_value(f: Callable):
    bf = jax.vmap(f, in_axes=0, out_axes=0)

    def wrapped(X):
        return bf(X)[:, None]

    return wrapped


def _make_kernel(f, n_consts, n, m, T, pgtol, factr, max_iter, max_iter_ls,
                 c1, bisect_iters, gcp_guard_maxseg, line_search, dtype):
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7
    f_rtol = factr * eps_mach
    curvature_eps = eps_mach
    inf = float("inf")
    m2 = 2 * m

    def kernel(x0_ref, lo_ref, up_ref, *rest):
        const_refs = rest[:n_consts]
        (x_out, f_out, it_out, st_out, gf_out,
         X, G, Fv, Fprev, S, Y, SYt, SSt, validf, theta, iters, abn,
         scB, ls_t, ls_done, actm, gflag, scW) = rest[n_consts:]
        cvals = [r[...] for r in const_refs]
        f_local = (lambda x: f(x, *cvals)) if n_consts else f
        bvg = _row_value_and_grad(f_local)
        bval = _row_value(f_local)
        lo = lo_ref[0]                                            # (T, n)
        up = up_ref[0]

        X[...] = jnp.clip(x0_ref[0], lo, up)
        fv, gv = bvg(X[...])
        Fv[...] = fv
        Fprev[...] = jnp.full((T, 1), jnp.inf, dtype)
        G[...] = gv
        S[...] = jnp.zeros((m, T, n), dtype)
        Y[...] = jnp.zeros((m, T, n), dtype)
        SYt[...] = jnp.zeros((m, T, m), dtype)
        SSt[...] = jnp.zeros((m, T, m), dtype)
        validf[...] = jnp.zeros((T, m), dtype)
        theta[...] = jnp.ones((T, 1), dtype)
        iters[...] = jnp.zeros((T, 1), jnp.int32)
        abn[...] = jnp.zeros((T, 1), jnp.int32)
        gflag[...] = jnp.zeros((T, 1), jnp.int32)

        def rsum(v):                      # lane-axis reduction -> (T, 1)
            return jnp.sum(v, axis=1, keepdims=True)

        def pg_inf_norm():
            pg = X[...] - jnp.clip(X[...] - G[...], lo, up)
            return jnp.max(jnp.abs(pg), axis=1, keepdims=True)    # (T, 1)

        def active_mask():
            done = pg_inf_norm() <= pgtol
            fmax = jnp.maximum(
                jnp.maximum(jnp.abs(Fv[...]), jnp.abs(Fprev[...])), 1.0)
            done = done | (
                jnp.isfinite(Fprev[...])
                & ((Fprev[...] - Fv[...]) <= f_rtol * fmax))
            return jnp.isfinite(Fv[...]) & (abn[...] == 0) & ~done

        # ------------------------------------------------------------------
        # compact middle operator, explicit per-lane inverse (2m x 2m)
        # mirroring solvers/lbfgsb.py _middle_inverse (block elimination on
        # the -D block; Schur = theta SS~ + L D^{-1} L^T, one unrolled
        # lane-wide Cholesky) — all entries are (T, 1) python temporaries
        # valid for the current outer iteration only.

        def build_middle():
            th = theta[...]
            D = []
            for p in range(m):
                vp = validf[:, p:p + 1]
                D.append(jnp.where(vp > 0, SYt[p][:, p:p + 1],
                                   jnp.ones((T, 1), dtype)))
            L = [[SYt[p][:, q:q + 1] if q < p else jnp.zeros((T, 1), dtype)
                  for q in range(m)] for p in range(m)]
            SSp = [[None] * m for _ in range(m)]
            for p in range(m):
                for q in range(m):
                    v = SSt[p][:, q:q + 1]
                    if p == q:
                        v = v + jnp.where(validf[:, p:p + 1] > 0,
                                          jnp.zeros((T, 1), dtype),
                                          jnp.ones((T, 1), dtype))
                    SSp[p][q] = v
            U = [[L[p][q] / D[q] for q in range(m)] for p in range(m)]
            Sc = [[None] * m for _ in range(m)]
            for p in range(m):
                for q in range(m):
                    v = th * SSp[p][q]
                    for k in range(m):
                        v = v + U[p][k] * L[q][k]
                    Sc[p][q] = v
            # lane-wide Cholesky of Sc
            Ch = [[None] * m for _ in range(m)]
            for j in range(m):
                d = Sc[j][j]
                for k in range(j):
                    d = d - Ch[j][k] * Ch[j][k]
                dj = jnp.sqrt(jnp.maximum(d, eps_mach))
                Ch[j][j] = dj
                for i in range(j + 1, m):
                    s_ = Sc[i][j]
                    for k in range(j):
                        s_ = s_ - Ch[i][k] * Ch[j][k]
                    Ch[i][j] = s_ / dj

            def ch_solve(b):
                y_ = [None] * m
                for i in range(m):
                    s_ = b[i]
                    for k in range(i):
                        s_ = s_ - Ch[i][k] * y_[k]
                    y_[i] = s_ / Ch[i][i]
                z = [None] * m
                for i in range(m - 1, -1, -1):
                    s_ = y_[i]
                    for k in range(i + 1, m):
                        s_ = s_ - Ch[k][i] * z[k]
                    z[i] = s_ / Ch[i][i]
                return z

            # J = Sc^{-1} column by column
            J = [[None] * m for _ in range(m)]
            for j in range(m):
                e = [jnp.ones((T, 1), dtype) if i == j
                     else jnp.zeros((T, 1), dtype) for i in range(m)]
                col = ch_solve(e)
                for i in range(m):
                    J[i][j] = col[i]
            JU = [[None] * m for _ in range(m)]
            for p in range(m):
                for q in range(m):
                    v = jnp.zeros((T, 1), dtype)
                    for k in range(m):
                        v = v + J[p][k] * U[k][q]
                    JU[p][q] = v
            TL = [[None] * m for _ in range(m)]
            for p in range(m):
                for q in range(m):
                    v = jnp.zeros((T, 1), dtype)
                    for k in range(m):
                        v = v + U[k][p] * JU[k][q]
                    if p == q:
                        v = v - 1.0 / D[p]
                    TL[p][q] = v
            # assemble the 2m inverse rows as (T, 2m) for row-op applies
            M_rows = []
            for r in range(m):
                M_rows.append(jnp.concatenate(
                    TL[r] + [JU[q][r] for q in range(m)], axis=1))
            for r in range(m):
                M_rows.append(jnp.concatenate(
                    JU[r] + J[r], axis=1))
            return M_rows, D, L, SSp

        # ------------------------------------------------------------------

        # end-of-body mask == next trip's entry mask (state only changes
        # inside the body): cache it instead of recomputing pg/factr twice
        def read_active():
            return actm[...] > 0.5

        def store_active():
            mask = active_mask()
            actm[...] = mask.astype(dtype)
            return jnp.sum(mask.astype(jnp.int32)) > 0

        def body(carry):
            i_, _go = carry
            active = read_active()

            g = G[...]
            x = X[...]
            th = theta[...]
            M_rows, D_l, L_l, SS_l = build_middle()

            def w_dot(vec):               # (T, n) -> (T, 2m)
                cols = [rsum(Y[p] * vec) for p in range(m)]
                cols += [th * rsum(S[p] * vec) for p in range(m)]
                return jnp.concatenate(cols, axis=1)

            def m_apply(v2m):             # (T, 2m) -> (T, 2m)
                return jnp.concatenate(
                    [rsum(M_rows[r] * v2m) for r in range(m2)], axis=1)

            def quad(a2m, Mb2m):          # a^T (M b) given M b -> (T, 1)
                return rsum(a2m * Mb2m)

            def w_apply(coef):            # (T, 2m) -> (T, n)
                acc = jnp.zeros((T, n), dtype)
                for p in range(m):
                    acc = acc + coef[:, p:p + 1] * Y[p]
                for p in range(m):
                    acc = acc + (coef[:, m + p:m + p + 1] * th) * S[p]
                return acc

            # ---- generalized Cauchy point by segment bisection ------------
            tb = jnp.where(
                g < 0.0, (x - up) / g,
                jnp.where(g > 0.0, (x - lo) / g, inf))
            movingf = (tb > 0.0).astype(dtype)
            bound_vec = jnp.where(g < 0.0, up, jnp.where(g > 0.0, lo, x))
            z = bound_vec - x

            def seg_eval(t_lo):
                # (T, 1) -> (f1, f2, scale) at t_lo+; ``scale`` is the
                # magnitude of f1's constituent terms — the rounding noise
                # floor the GCP guard measures sign evidence against
                freeseg = movingf * (tb > t_lo).astype(dtype)
                G2F = rsum(freeseg * g * g)
                d = -g * freeseg
                u = movingf * jnp.where(tb <= t_lo, z, -g * t_lo)
                p2 = w_dot(d)
                c2 = w_dot(u)
                ta = (th * t_lo - 1.0) * G2F
                tc = quad(p2, m_apply(c2))
                f1 = ta - tc
                f2 = th * G2F - quad(p2, m_apply(p2))
                return f1, f2, jnp.abs(ta) + jnp.abs(tc)

            def seg_min(f1, f2):
                return jnp.where(
                    f2 > eps_mach, -f1 / f2,
                    jnp.where(f1 < 0.0, inf, jnp.zeros((T, 1), dtype)))

            tb_m = jnp.where(movingf > 0, tb, inf)
            t_min = jnp.min(tb_m, axis=1, keepdims=True)
            hi0 = jnp.max(
                jnp.where((movingf > 0) & jnp.isfinite(tb), tb, -inf),
                axis=1, keepdims=True)
            has_fin = hi0 > 0.0

            zero = jnp.zeros((T, 1), dtype)
            f1_0, f2_0, _ = seg_eval(zero)
            dt0 = seg_min(f1_0, f2_0)
            doneA = f1_0 >= 0.0                         # t_cp = 0
            doneB = (~doneA) & (dt0 <= t_min)           # min in 1st segment
            f1_L, f2_L, _ = seg_eval(jnp.where(has_fin, hi0, zero))
            dtL = seg_min(f1_L, f2_L)
            doneC = (~doneA) & (~doneB) & has_fin & (f1_L < 0.0)

            done0 = doneA | doneB | doneC
            t_fin0 = jnp.where(doneC, hi0, zero)
            dtm0 = jnp.where(doneA, zero, jnp.where(doneB, dt0, dtL))
            scB[0] = t_min                              # lo
            scB[1] = hi0                                # hi
            scB[2] = done0.astype(dtype)                # done flag
            scB[3] = t_fin0                             # final segment start
            scB[4] = dtm0                               # dt inside segment

            def bcond(s):
                j, n_open = s
                return (j < bisect_iters) & (n_open > 0)

            def bbody(s):
                j, _ = s
                lo_b = scB[0]
                hi_b = scB[1]
                open_ = (scB[2] < 0.5) & active
                t_mid = jnp.sqrt(lo_b) * jnp.sqrt(hi_b)
                t_lo_seg = jnp.max(
                    jnp.where((movingf > 0) & (tb <= t_mid), tb, 0.0),
                    axis=1, keepdims=True)
                t_hi_seg = jnp.min(
                    jnp.where((movingf > 0) & (tb > t_lo_seg), tb, inf),
                    axis=1, keepdims=True)
                f1, f2, _ = seg_eval(t_lo_seg)
                dt = seg_min(f1, f2)
                found = open_ & (
                    ((f1 >= 0.0) & (t_lo_seg <= lo_b))
                    | ((f1 < 0.0) & (t_lo_seg + dt <= t_hi_seg)))
                godn = open_ & ~found & (f1 >= 0.0)
                goup = open_ & ~found & (f1 < 0.0)
                scB[0] = jnp.where(goup, t_hi_seg, lo_b)
                scB[1] = jnp.where(godn, t_lo_seg, hi_b)
                scB[2] = jnp.where(found, jnp.ones((T, 1), dtype), scB[2])
                scB[3] = jnp.where(found, t_lo_seg, scB[3])
                scB[4] = jnp.where(found, dt, scB[4])
                still = ((scB[2] < 0.5) & active)
                return (j + 1, jnp.sum(still.astype(jnp.int32),
                                       dtype=jnp.int32))

            n_open0 = jnp.sum(((scB[2] < 0.5) & active).astype(jnp.int32),
                              dtype=jnp.int32)
            lax.while_loop(bcond, bbody, (jnp.int32(0), n_open0))

            # budget-exhausted fallback (non-monotone path derivative):
            # finalize at the bracket's lo segment with dt clamped into it
            open_ = scB[2] < 0.5
            t_lo_seg = jnp.max(
                jnp.where((movingf > 0) & (tb <= scB[0]), tb, 0.0),
                axis=1, keepdims=True)
            t_hi_seg = jnp.min(
                jnp.where((movingf > 0) & (tb > t_lo_seg), tb, inf),
                axis=1, keepdims=True)
            f1_fb, f2_fb, _ = seg_eval(t_lo_seg)
            dt_fb = jnp.clip(seg_min(f1_fb, f2_fb), 0.0,
                             t_hi_seg - t_lo_seg)
            t_lo_fin = jnp.where(open_, t_lo_seg, scB[3])
            dtm = jnp.maximum(jnp.where(open_, dt_fb, scB[4]), 0.0)
            t_cp = t_lo_fin + dtm

            if gcp_guard_maxseg:
                # ---- single-crossing certification flag (round 5, VERDICT
                # item 7; full calibration story in BENCH_NOTES round 5
                # "GCP guard calibration") ----
                # Fires when the bisection EXHAUSTED its trip budget in a
                # bracket holding <= maxseg segments: a monotone f1 there
                # resolves in ~2 trips, so exhaustion means the found-test
                # kept flipping — the path derivative is non-monotone AT
                # f32 GRANULARITY for this lane.  That includes BOTH true
                # multi-crossing geometries (where the walk's first local
                # minimum may differ from the chosen one) and crossings
                # landing within rounding of a breakpoint (harmless).
                # MEASURED characteristics, so callers know what the flag
                # is and is not: on an adversarial multimodal stress class
                # it fires on 22% of lanes with 78% precision for
                # actual walk-divergence but only ~23% recall (most true
                # divergences have NO cheap in-kernel signature); on the
                # benign config-4 class it fires on ~88% of lanes whose
                # final iterates nonetheless MATCH the walk backend.
                # Treat as "single-crossing not certified", never as
                # "result wrong"; the authoritative parity check is the
                # XLA walk-backend comparison (tests do exactly that).
                # Probe-grid f1 sign tests were tried and measured
                # uninformative both ways (f1 -> 0^- noise below the
                # crossing; genuine humps rarely probe-visible).
                cnt = rsum(((movingf > 0) & (tb > scB[0])
                            & (tb <= scB[1])).astype(dtype))
                fl = open_ & active & (cnt <= float(gcp_guard_maxseg))
                gflag[...] = jnp.maximum(gflag[...], fl.astype(jnp.int32))

            fixedf = movingf * (tb <= t_lo_fin).astype(dtype)
            freef = movingf * (tb > t_lo_fin).astype(dtype)
            d_rem = -g * freef
            # dtm (hence t_cp) is +inf only when the model decreases beyond
            # every breakpoint, which requires d_rem == 0 (B SPD); guard the
            # inf * 0 exactly as solvers/lbfgsb.py _cauchy_point does.
            # Residual f32 exposure (shared with the XLA backend, kept for
            # parity): if f2 rounds to <= eps with f1 < 0 while d_rem != 0,
            # xcp goes infinite, the trial eval goes non-finite, and the
            # lane recovers through the designed restart path (history
            # wiped, steepest-descent retry with theta = 1, where f2 =
            # |g|^2 is safely positive)
            xcp = jnp.where(
                fixedf > 0, bound_vec,
                x + jnp.where(d_rem == 0.0, 0.0, t_cp * d_rem))
            c2 = w_dot(xcp - x)

            # ---- subspace minimization (paper 5.4-5.11; masked free set) --
            r_vec = g + th * (xcp - x) - w_apply(m_apply(c2))
            rF = r_vec * freef

            YF = [Y[p] * freef for p in range(m)]
            SF = [S[p] * freef for p in range(m)]
            E = [[None] * m for _ in range(m)]
            Gm = [[None] * m for _ in range(m)]
            H = [[None] * m for _ in range(m)]
            for p in range(m):
                for q in range(m):
                    if q <= p:
                        e_ = rsum(YF[p] * YF[q]) / th
                        if p == q:
                            e_ = e_ + D_l[p]
                        E[p][q] = e_
                        E[q][p] = e_
                        h_ = th * (SS_l[p][q] - rsum(SF[p] * SF[q]))
                        H[p][q] = h_
                        H[q][p] = h_
                    lq = L_l[q][p] if q > p else jnp.zeros((T, 1), dtype)
                    Gm[p][q] = lq - rsum(YF[p] * SF[q])

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
                zz = [None] * m
                for i2 in range(m - 1, -1, -1):
                    s_ = y_[i2]
                    for k in range(i2 + 1, m):
                        s_ = s_ - Ech[k][i2] * zz[k]
                    zz[i2] = s_ / Ech[i2][i2]
                return zz

            EinvG = [ech_solve([Gm[i2][j] for i2 in range(m)])
                     for j in range(m)]
            Sch2 = [[None] * m for _ in range(m)]
            for p in range(m):
                for q in range(m):
                    if q > p:
                        continue
                    v = H[p][q]
                    for k in range(m):
                        v = v + Gm[k][p] * EinvG[q][k]
                    Sch2[p][q] = v
            for j in range(m):
                d = Sch2[j][j]
                for k in range(j):
                    d = d - Sch2[j][k] * Sch2[j][k]
                dj = jnp.sqrt(jnp.maximum(d, eps_mach))
                Sch2[j][j] = dj
                for i2 in range(j + 1, m):
                    s_ = Sch2[i2][j]
                    for k in range(j):
                        s_ = s_ - Sch2[i2][k] * Sch2[j][k]
                    Sch2[i2][j] = s_ / dj

            def sch2_solve(b):
                y_ = [None] * m
                for i2 in range(m):
                    s_ = b[i2]
                    for k in range(i2):
                        s_ = s_ - Sch2[i2][k] * y_[k]
                    y_[i2] = s_ / Sch2[i2][i2]
                zz = [None] * m
                for i2 in range(m - 1, -1, -1):
                    s_ = y_[i2]
                    for k in range(i2 + 1, m):
                        s_ = s_ - Sch2[k][i2] * zz[k]
                    zz[i2] = s_ / Sch2[i2][i2]
                return zz

            u2 = w_dot(rF)                             # (T, 2m)
            a_l = [u2[:, r:r + 1] for r in range(m)]
            b_l = [u2[:, m + r:m + r + 1] for r in range(m)]
            Einv_a = ech_solve(a_l)
            rhs = []
            for i2 in range(m):
                s_ = b_l[i2]
                for k in range(m):
                    s_ = s_ + Gm[k][i2] * Einv_a[k]
                rhs.append(s_)
            v_l = sch2_solve(rhs)
            u_l = []
            for i2 in range(m):
                s_ = -a_l[i2]
                for k in range(m):
                    s_ = s_ + Gm[i2][k] * v_l[k]
                u_l.append(s_)
            u_l = ech_solve(u_l)
            coef = jnp.concatenate(u_l + v_l, axis=1)   # (T, 2m)

            dvec = rF / th + freef * w_apply(coef) / (th * th)
            du = -dvec
            pos = (up - xcp) / du
            neg = (lo - xcp) / du
            steps = jnp.where(du > 0.0, pos, jnp.where(du < 0.0, neg, inf))
            steps = jnp.where(freef > 0, steps, inf)
            steps = jnp.where(jnp.isnan(steps), inf, steps)
            alpha = jnp.minimum(
                jnp.ones((T, 1), dtype), jnp.min(steps, axis=1,
                                                 keepdims=True))
            xbar = jnp.clip(xcp + alpha * jnp.where(freef > 0, du, 0.0),
                            lo, up)
            d = xbar - x

            g0d = rsum(g * d)
            f0 = Fv[...]
            posf = (up - x) / d
            negf = (lo - x) / d
            fs = jnp.where(d > 0.0, posf, jnp.where(d < 0.0, negf, inf))
            fs = jnp.where(jnp.isnan(fs), inf, fs)
            stpmax = jnp.min(fs, axis=1, keepdims=True)

            if line_search == "dcsrch":
                # ---- MINPACK dcsrch strong Wolfe (round 5, VERDICT item
                # 4): the SAME search the Fortran core pairs with L-BFGS-B
                # (ftol=c1, gtol=0.9, xtol=0.1; stpmx cap at the box —
                # reached by the reference via setulb_, lbfgsb.rs:36-57).
                # Port of the lane-last fused spec (ops/pallas_driver.py
                # _StrongWolfeSpec) to (T, 1) columns, reusing the unfused
                # ``_dcstep`` verbatim (pure elementwise jnp).  One
                # gradient-bearing trial eval per loop trip.
                from optimization_solvers_tpu.linesearch.dcsrch import (
                    _dcstep)

                gtol, xtol = 0.9, 0.1
                xtrapl, xtrapu = 1.1, 4.0
                ginit = g0d
                gtest = c1 * ginit
                stpmin_g = jnp.zeros((T, 1), dtype)
                stp0 = jnp.clip(jnp.ones((T, 1), dtype), stpmin_g, stpmax)
                descent = ginit < 0.0
                stp0 = jnp.where(descent, stp0, jnp.zeros((T, 1), dtype))
                width0 = stpmax - stpmin_g

                scW[0] = stp0
                scW[1] = jnp.zeros((T, 1), dtype)          # stx
                scW[2] = f0                                # fx
                scW[3] = ginit                             # dx
                scW[4] = jnp.zeros((T, 1), dtype)          # sty
                scW[5] = f0                                # fy
                scW[6] = ginit                             # dy
                scW[7] = jnp.zeros((T, 1), dtype)          # brackt 0/1
                scW[8] = jnp.ones((T, 1), dtype)           # stage1 0/1
                scW[9] = width0
                scW[10] = width0 / 0.5
                scW[11] = jnp.zeros((T, 1), dtype)         # stmin
                scW[12] = stp0 + xtrapu * stp0             # stmax
                scW[13] = ((~active) | ~descent).astype(dtype)   # done
                scW[14] = stpmax

                def w_cond(s):
                    i2, n_go = s
                    return (i2 < max_iter_ls) & (n_go > 0)

                def w_body(s):
                    i2, _ = s
                    stp = scW[0]
                    stx, fx, dx = scW[1], scW[2], scW[3]
                    sty, fy, dy = scW[4], scW[5], scW[6]
                    brackt = scW[7] > 0
                    stage1 = scW[8] > 0
                    width, width1 = scW[9], scW[10]
                    stmin, stmax_w = scW[11], scW[12]
                    wdone = scW[13] > 0
                    smax_g = scW[14]

                    f_t, g_row = bvg(x + stp * d)
                    gd = rsum(g_row * d)
                    ftest = f0 + stp * gtest

                    stage1_n = stage1 & ~((f_t <= ftest) & (gd >= 0.0))
                    wolfe = (f_t <= ftest) & (jnp.abs(gd)
                                              <= gtol * (-ginit))
                    small = brackt & (stmax_w - stmin <= xtol * stmax_w)
                    at_max = (stp == smax_g) & (f_t <= ftest) & (gd <= gtest)
                    at_min = (stp == stpmin_g) & ((f_t > ftest)
                                                  | (gd >= gtest))
                    out_int = brackt & ((stp <= stmin) | (stp >= stmax_w))
                    finish = wolfe | small | at_max | at_min | out_int

                    use_mod = stage1_n & (f_t <= fx) & (f_t > ftest)
                    fm = jnp.where(use_mod, f_t - stp * gtest, f_t)
                    fxm = jnp.where(use_mod, fx - stx * gtest, fx)
                    fym = jnp.where(use_mod, fy - sty * gtest, fy)
                    gm = jnp.where(use_mod, gd - gtest, gd)
                    gxm = jnp.where(use_mod, dx - gtest, dx)
                    gym = jnp.where(use_mod, dy - gtest, dy)

                    (stx_n, fx_n, dx_n, sty_n, fy_n, dy_n, stp_n,
                     brackt_n) = _dcstep(stx, fxm, gxm, sty, fym, gym,
                                         stp, fm, gm, brackt, stmin,
                                         stmax_w)

                    fx_n = jnp.where(use_mod, fx_n + stx_n * gtest, fx_n)
                    fy_n = jnp.where(use_mod, fy_n + sty_n * gtest, fy_n)
                    dx_n = jnp.where(use_mod, dx_n + gtest, dx_n)
                    dy_n = jnp.where(use_mod, dy_n + gtest, dy_n)

                    bisect = brackt_n & (jnp.abs(sty_n - stx_n)
                                         >= 0.66 * width1)
                    stp_n = jnp.where(bisect,
                                      stx_n + 0.5 * (sty_n - stx_n), stp_n)
                    width1_n = jnp.where(brackt_n, width, width1)
                    width_n = jnp.where(brackt_n, jnp.abs(sty_n - stx_n),
                                        width)
                    stmin_n = jnp.where(
                        brackt_n, jnp.fmin(stx_n, sty_n),
                        stp_n + xtrapl * (stp_n - stx_n))
                    stmax_n = jnp.where(
                        brackt_n, jnp.fmax(stx_n, sty_n),
                        stp_n + xtrapu * (stp_n - stx_n))
                    stp_n = jnp.clip(stp_n, stpmin_g, smax_g)
                    give_up = (brackt_n & ((stp_n <= stmin_n)
                                           | (stp_n >= stmax_n))) | (
                        brackt_n & (stmax_n - stmin_n <= xtol * stmax_n))
                    stp_n = jnp.where(give_up, stx_n, stp_n)

                    frozen = wdone | finish
                    scW[0] = jnp.where(frozen, stp, stp_n)
                    scW[1] = jnp.where(frozen, stx, stx_n)
                    scW[2] = jnp.where(frozen, fx, fx_n)
                    scW[3] = jnp.where(frozen, dx, dx_n)
                    scW[4] = jnp.where(frozen, sty, sty_n)
                    scW[5] = jnp.where(frozen, fy, fy_n)
                    scW[6] = jnp.where(frozen, dy, dy_n)
                    # Mosaic: float 0/1 encodings, never i1 vectors
                    scW[7] = jnp.where(frozen, scW[7],
                                       (brackt | brackt_n).astype(dtype))
                    scW[8] = jnp.where(frozen, scW[8],
                                       stage1_n.astype(dtype))
                    scW[9] = jnp.where(frozen, width, width_n)
                    scW[10] = jnp.where(frozen, width1, width1_n)
                    scW[11] = jnp.where(frozen, stmin, stmin_n)
                    scW[12] = jnp.where(frozen, stmax_w, stmax_n)
                    scW[13] = frozen.astype(dtype)
                    n_go = jnp.sum((scW[13] == 0.0).astype(jnp.int32),
                                   dtype=jnp.int32)
                    return (i2 + 1, n_go)

                lax.while_loop(w_cond, w_body, (jnp.int32(0), jnp.int32(1)))
                # exhaustion returns the best step found (stx)
                t = jnp.where(scW[13] > 0, scW[0], scW[1])
            else:
                # ---- projected value-only Armijo backtracking -------------
                ls_t[...] = jnp.minimum(jnp.ones((T, 1), dtype), stpmax)
                ls_done[...] = (~active).astype(jnp.int32)

                def ls_cond(s):
                    i2, n_act = s
                    return (i2 < max_iter_ls) & (n_act > 0)

                def ls_body(s):
                    i2, _ = s
                    t = ls_t[...]
                    ldone = ls_done[...] > 0
                    fv_t = bval(x + t * d)
                    ok = (fv_t <= f0 + c1 * t * g0d) & jnp.isfinite(fv_t)
                    keep = ldone | ok
                    ls_t[...] = jnp.where(keep, t, t * 0.5)
                    ls_done[...] = keep.astype(jnp.int32)
                    return (i2 + 1, jnp.sum((~keep).astype(jnp.int32),
                                            dtype=jnp.int32))

                lax.while_loop(ls_cond, ls_body, (jnp.int32(0),
                                                  jnp.int32(1)))
                t = ls_t[...]

            X_new = x + t * d
            f_new, g_new = bvg(X_new)
            ok = (
                jnp.isfinite(f_new)
                & jnp.all(jnp.isfinite(X_new), axis=1, keepdims=True)
                & jnp.all(jnp.isfinite(g_new), axis=1, keepdims=True))
            # Fortran mainlb failure semantics (as solvers/lbfgsb.py
            # step_fn): restore previous iterate; restart with history,
            # ABNORMAL without
            no_move = jnp.all(X_new == x, axis=1, keepdims=True)
            fail = active & ((~ok) | (f_new > f0) | (t <= 0.0) | no_move)
            hh = validf[:, 0:1]
            for p in range(1, m):
                hh = jnp.maximum(hh, validf[:, p:p + 1])
            has_hist = hh > 0
            restart = fail & has_hist
            abn[...] = jnp.where(fail & ~has_hist, jnp.int32(1), abn[...])
            keepx = ok & ~fail
            X_new = jnp.where(keepx, X_new, x)
            f_new = jnp.where(keepx, f_new, f0)
            g_new = jnp.where(keepx, g_new, g)

            s_vec = X_new - x
            y_vec = g_new - g
            sy = rsum(s_vec * y_vec)
            yy = rsum(y_vec * y_vec)
            accept = active & ok & (sy > curvature_eps * yy)

            def shift_lanes(v):           # (T, m): lane q <- q + 1
                return jnp.concatenate(
                    [v[:, 1:], jnp.zeros((T, 1), dtype)], axis=1)

            acc = accept
            for p in range(m - 1):
                S[p] = jnp.where(acc, S[p + 1], S[p])
                Y[p] = jnp.where(acc, Y[p + 1], Y[p])
            S[m - 1] = jnp.where(acc, s_vec, S[m - 1])
            Y[m - 1] = jnp.where(acc, y_vec, Y[m - 1])
            validf[...] = jnp.where(
                acc, shift_lanes(validf[...]), validf[...])
            validf[:, m - 1:m] = jnp.where(
                acc, jnp.ones((T, 1), dtype), validf[:, m - 1:m])
            theta[...] = jnp.where(acc, yy / sy, theta[...])

            for p in range(m - 1):
                SYt[p] = jnp.where(acc, shift_lanes(SYt[p + 1]), SYt[p])
                SSt[p] = jnp.where(acc, shift_lanes(SSt[p + 1]), SSt[p])
            for j in range(m):
                SYt[m - 1, :, j:j + 1] = rsum(S[m - 1] * Y[j])
                SYt[j, :, m - 1:m] = rsum(S[j] * Y[m - 1])
                v_ss = rsum(S[m - 1] * S[j])
                SSt[m - 1, :, j:j + 1] = v_ss
                SSt[j, :, m - 1:m] = v_ss

            zrow = jnp.zeros((T, m), dtype)
            for p in range(m):
                S[p] = jnp.where(restart, 0.0, S[p])
                Y[p] = jnp.where(restart, 0.0, Y[p])
                SYt[p] = jnp.where(restart, zrow, SYt[p])
                SSt[p] = jnp.where(restart, zrow, SSt[p])
            validf[...] = jnp.where(restart, zrow, validf[...])
            theta[...] = jnp.where(restart, jnp.ones((T, 1), dtype),
                                   theta[...])

            Fprev[...] = jnp.where(
                restart, jnp.full((T, 1), jnp.inf, dtype),
                jnp.where(active, f0, Fprev[...]))
            X[...] = jnp.where(active, X_new, X[...])
            Fv[...] = jnp.where(active, f_new, Fv[...])
            G[...] = jnp.where(active, g_new, G[...])
            iters[...] = iters[...] + active.astype(jnp.int32)

            return (i_ + 1, store_active())

        def cond(carry):
            i_, go = carry
            return (i_ < max_iter) & go

        lax.while_loop(cond, body, (jnp.int32(0), store_active()))

        finite = jnp.isfinite(Fv[...])
        conv = pg_inf_norm() <= pgtol
        fmax = jnp.maximum(
            jnp.maximum(jnp.abs(Fv[...]), jnp.abs(Fprev[...])), 1.0)
        conv = conv | (
            jnp.isfinite(Fprev[...])
            & ((Fprev[...] - Fv[...]) <= f_rtol * fmax))
        status = jnp.where(
            abn[...] > 0,
            jnp.int32(Status.ABNORMAL),
            jnp.where(
                conv & finite,
                jnp.int32(Status.CONVERGED),
                jnp.where(~finite, jnp.int32(Status.OUT_OF_DOMAIN),
                          jnp.int32(Status.MAX_ITER_REACHED))))
        x_out[0] = X[...]
        f_out[...] = Fv[...]
        it_out[...] = iters[...]
        st_out[...] = status
        gf_out[...] = gflag[...]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "f", "m", "pgtol", "factr", "max_iter", "max_iter_ls", "tile", "c1",
        "bisect_iters", "gcp_guard_maxseg", "line_search", "interpret",
        "vmem_limit_bytes",
    ),
)
def lbfgsb_solve_fused_tall(
    f: Callable,
    x0: jax.Array,                  # (B, n)
    lower: jax.Array,               # (n,) shared or (B, n) per-lane
    upper: jax.Array,               # (n,) shared or (B, n) per-lane
    consts: tuple = (),             # problem-data arrays: f(x, *consts)
    *,
    m: int = 10,
    pgtol: float = 1e-5,
    factr: float = 1e7,
    max_iter: int = 500,
    max_iter_ls: int = 20,
    tile: int = 8,
    c1: float = 1e-3,
    bisect_iters: int = 40,
    gcp_guard_maxseg: int = 4,
    line_search: str = "armijo",
    interpret: bool = False,
    vmem_limit_bytes: int = None,
) -> SolveResult:
    """Batched large-n box-constrained solves with the tall fused kernel.

    ``B`` must be a multiple of ``tile`` (default 8 — instances ride the
    sublane axis, so small tiles keep full lane occupancy at huge n).
    Problem-data arrays (e.g. the (rows, n) design matrix of the config-4
    log-sum-exp) ride ``consts`` and stay VMEM-resident for the whole
    solve.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = x0.shape
    assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
    dtype = x0.dtype
    T = tile

    x3 = x0.reshape(1, B, n)
    # bounds: shared (n,) or PER-LANE (B, n) boxes (batch-axis capability);
    # the kernel body sees a (T, n) block either way
    per_lane = jnp.ndim(lower) == 2
    if per_lane:
        assert jnp.shape(lower) == (B, n) and jnp.shape(upper) == (B, n), (
            jnp.shape(lower), jnp.shape(upper))
        loT = lower.astype(dtype).reshape(1, B, n)
        upT = upper.astype(dtype).reshape(1, B, n)
    else:
        loT = jnp.broadcast_to(lower.astype(dtype)[None, :], (T, n)).reshape(
            1, T, n)
        upT = jnp.broadcast_to(upper.astype(dtype)[None, :], (T, n)).reshape(
            1, T, n)

    assert line_search in ("armijo", "dcsrch"), line_search
    kernel = _make_kernel(
        f, len(consts), n, m, T, pgtol, factr, max_iter, max_iter_ls, c1,
        bisect_iters, gcp_guard_maxseg, line_search, dtype)
    const_specs = [
        pl.BlockSpec(c.shape, lambda b, _nd=c.ndim: (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for c in consts
    ]
    scratch = [
        pltpu.VMEM((T, n), dtype),       # X
        pltpu.VMEM((T, n), dtype),       # G
        pltpu.VMEM((T, 1), dtype),       # Fv
        pltpu.VMEM((T, 1), dtype),       # Fprev
        pltpu.VMEM((m, T, n), dtype),    # S
        pltpu.VMEM((m, T, n), dtype),    # Y
        pltpu.VMEM((m, T, m), dtype),    # SYt
        pltpu.VMEM((m, T, m), dtype),    # SSt
        pltpu.VMEM((T, m), dtype),       # validf
        pltpu.VMEM((T, 1), dtype),       # theta
        pltpu.VMEM((T, 1), jnp.int32),   # iters
        pltpu.VMEM((T, 1), jnp.int32),   # abn
        pltpu.VMEM((5, T, 1), dtype),    # scB: lo, hi, done, t_fin, dtm
        pltpu.VMEM((T, 1), dtype),       # ls_t
        pltpu.VMEM((T, 1), jnp.int32),   # ls_done
        pltpu.VMEM((T, 1), dtype),       # actm (cached active mask)
        pltpu.VMEM((T, 1), jnp.int32),   # gflag (GCP multi-crossing guard)
        pltpu.VMEM((15, T, 1), dtype),   # scW (dcsrch state; ~60B/lane)
    ]
    if vmem_limit_bytes is None and not interpret:
        need = vmem_footprint_bytes(n, m, T, consts)
        if need * 2 > 16 * 2 ** 20:
            vmem_limit_bytes = min(int(need * VMEM_MARGIN),
                                   VMEM_BUDGET_BYTES)
    extra = {}
    if vmem_limit_bytes is not None and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes)

    x_out, f_out, it_out, st_out, gf_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, B, n), dtype),
            # scalar outputs as (B, 1) so the (T, 1) block is tileable at
            # small T (a (1, T) block with T = 8 fails the lane-divisibility
            # check)
            jax.ShapeDtypeStruct((B, 1), dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((1, T, n), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, n),
                         (lambda b: (0, b, 0)) if per_lane
                         else (lambda b: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, n),
                         (lambda b: (0, b, 0)) if per_lane
                         else (lambda b: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=(
            pl.BlockSpec((1, T, n), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **extra,
    )(x3, loT, upT, *consts)

    x_final = x_out[0]
    f_host = (lambda x: f(x, *consts)) if consts else f
    _, g_final = jax.vmap(jax.value_and_grad(f_host))(x_final)
    return SolveResult(
        x_final, f_out[:, 0], g_final, it_out[:, 0], st_out[:, 0],
        pg_norm=batched_pg_inf_norm(x_final, g_final, lower, upper),
        gcp_multimodal=(gf_out[:, 0] > 0) if gcp_guard_maxseg else None)
