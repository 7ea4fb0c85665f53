"""Generic fused whole-solve Pallas TPU kernel, parameterized over
(method, line search): the reference template loop
(``/root/reference/src/ls_solver.rs:66-111``) compiled into ONE Mosaic
program per (method, search) combo instead of a chain of small XLA ops.

Why this exists: the flexible vmapped ``lax.while_loop`` driver path is
small-op dispatch-bound on TPU (~4% VPU; it measured *slower than one CPU
core* on the round-1 headline).  The round-1 fix was four hand-written
whole-solve kernels (L-BFGS, L-BFGS-B, dense BFGS, SPG); this module is the
general middle ground: tile-level "method specs" and "search specs" plug
into one shared kernel skeleton, so every first-order method × Armijo-family
search combo gets fused-kernel speed without a bespoke kernel.

Supported methods (reference files in ``src/steepest_descent/`` and
``src/quasi_newton/``):
  GradientDescent, CoordinateDescent (Gauss-Southwell), PnormDescent,
  ProjectedGradientDescent, SpectralProjectedGradient, NonlinearCG
  (fr/pr+/hs/dy — no reference counterpart), limited-memory BFGS (two-loop
  recursion over (m, n, T) histories), the dense quasi-Newton
  family BFGS/DFP/Broyden (+ bounded twins and SR1B) with their (n, n, T)
  inverse-Hessian slabs resident in VMEM, and the Newton family
  Newton/ProjectedNewton/SPN (``src/newton/``) with per-iteration AD
  Hessians and an in-kernel lane-parallel masked Cholesky.
Supported searches (``src/line_search/``): BackTracking, BackTrackingB,
  GLLQuadratic (with the safeguarded quadratic interpolation trial update,
  ``gll_quadratic.rs:78-93``), MoreThuente / MoreThuenteB (strong Wolfe;
  corrected interval update — ``reference_quirks=True`` falls back to the
  XLA path), HagerZhang / HagerZhangB (CG_DESCENT approximate Wolfe),
  NoSearch.

Mosaic structure follows :mod:`pallas_lbfgs` (learned the hard way, see its
docstring): scalar-only loop carries, all evolving state in VMEM scratch
refs, lane-last (n, T) layout, shift-not-ring history buffers, and — on
consts-bearing kernels — halving-tree lane reductions (the plain
``jnp.sum(axis=0)`` gets a replicated-layout accumulator Mosaic cannot
lower).

Semantics deviations from the unfused path (documented, test-covered):
  * line searches run in lockstep with per-lane accept masks; the
    out-of-domain "shrink without consuming an iteration" bookkeeping of
    ``backtracking.rs:37-41`` is folded into the single trial budget;
  * a lane that converges exactly at the iteration budget reports
    CONVERGED (the unfused driver reports MAX_ITER_REACHED there).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from optimization_solvers_tpu.core.types import SolveResult, Status
from optimization_solvers_tpu.core.numerics import batched_pg_inf_norm
from optimization_solvers_tpu.ops.pallas_lbfgs import (
    _batched_value,
    _batched_value_and_grad,
    _load_consts,
    _pack_consts,
)


def _batched_hessian(f: Callable, cvals=(), caxes=()):
    """(n, T) -> (n, n, T) per-lane dense Hessian (forward-over-reverse AD,
    traced straight into the kernel for the fused Newton family).
    ``cvals``/``caxes`` as in ``_batched_value_and_grad``."""
    h = jax.hessian(f)
    bh = jax.vmap(h, in_axes=(1, *caxes), out_axes=2)
    return lambda X: bh(X, *cvals)


class _Ctx:
    """Tile-level context handed to specs: bounds values, lane reducers."""

    def __init__(self, n, T, dtype, lo, up, safe_reduce):
        self.n = n
        self.T = T
        self.dtype = dtype
        self.lo = lo          # (n, T) or None
        self.up = up          # (n, T) or None
        self._safe = safe_reduce

    # (n, T) -> (1, T) reductions.  With const inputs present, Mosaic cannot
    # lower the plain axis-0 reduction (replicated-layout accumulator); an
    # unrolled halving tree of static row slices always lowers.
    def sum(self, v):
        if not self._safe:
            return jnp.sum(v, axis=0, keepdims=True)
        while v.shape[0] > 1:
            k = v.shape[0]
            half = k // 2
            head = v[:half] + v[half:2 * half]
            if k % 2:
                first = lax.broadcasted_iota(jnp.int32, (half, v.shape[1]), 0) == 0
                head = head + jnp.where(first, v[-1:], 0.0)
            v = head
        return v

    def max(self, v):
        if not self._safe:
            return jnp.max(v, axis=0, keepdims=True)
        while v.shape[0] > 1:
            k = v.shape[0]
            half = k // 2
            head = jnp.maximum(v[:half], v[half:2 * half])
            if k % 2:
                first = lax.broadcasted_iota(jnp.int32, (half, v.shape[1]), 0) == 0
                head = jnp.where(first, jnp.maximum(head, v[-1:]), head)
            v = head
        return v

    def clip(self, v):
        return jnp.clip(v, self.lo, self.up)

    def pg_inf_norm(self, X, G):
        """Reference projected-gradient infinity norm: mask components
        pushing against an ACTIVE bound (``ls_solver.rs:121-133``), then
        take ``||.||_inf`` — NOT the projection-arc residual
        ``||x - P(x - g)||``, which goes to zero for interior points
        approaching a bound regardless of the gradient there."""
        at_lo = (X == self.lo) & (G > 0)
        at_up = (X == self.up) & (G < 0)
        pg = jnp.where(at_lo | at_up, 0.0, G)
        return self.max(jnp.abs(pg))

    def max_feasible_step(self, X, d):
        """Per-lane max step keeping ``X + t d`` in the box:
        ``min_i (bound_i - x_i)/d_i`` with the Rust NaN-skipping min-fold
        (``morethuente_b.rs:185-201``); shared by the bounded MT/HZ specs."""
        pos = (self.up - X) / d
        neg = (self.lo - X) / d
        terms = jnp.where(d > 0.0, pos,
                          jnp.where(d < 0.0, neg, jnp.inf))
        terms = jnp.where(jnp.isnan(terms), jnp.inf, terms)
        return -self.max(-terms)  # lane-wise min via the safe reducer

    # (rb, n, T) -> (rb, 1, T) halving-tree reduction over the middle axis,
    # for row-chunked matvecs against an (n, n, T) VMEM slab.  Same
    # replicated-layout-accumulator workaround as sum()/max() above.
    def sum_mid(self, v):
        if not self._safe:
            return jnp.sum(v, axis=1, keepdims=True)
        while v.shape[1] > 1:
            k = v.shape[1]
            half = k // 2
            head = v[:, :half] + v[:, half:2 * half]
            if k % 2:
                first = lax.broadcasted_iota(
                    jnp.int32, head.shape, 1) == 0
                head = head + jnp.where(first, v[:, -1:], 0.0)
            v = head
        return v


# ---------------------------------------------------------------------------
# Method specs: tile-level (n, T) re-expressions of the solver configs in
# solvers/steepest.py and solvers/nonlinear_cg.py.  Each spec declares its
# scratch state slots and implements init / converged / direction / post_step
# over refs.
# ---------------------------------------------------------------------------


class _GDSpec:
    """GradientDescent: d = -g, ||g||_inf test (gradient_descent.rs:24-53)."""

    bounded = False

    def __init__(self, method):
        self.tol = float(method.grad_tol)

    def scratch(self, n, T, dtype):
        return []

    def const_arrays(self):
        return ()

    def init(self, st, X, G, Fv, ctx):
        pass

    def converged(self, st, X, G, Fv, ctx):
        return ctx.max(jnp.abs(G)) < self.tol

    def direction(self, st, X, G, Fv, active, ctx):
        return -G

    def post_step(self, st, active, d, t, X_old, G_old, F_old, X, G, Fv, ctx):
        pass


class _CDSpec(_GDSpec):
    """Gauss-Southwell coordinate descent: -sign(g_i) e_i at the largest
    |g_i| (coordinate_descent.rs:24-46; textbook sign, see steepest.py)."""

    def direction(self, st, X, G, Fv, active, ctx):
        a = jnp.abs(G)
        amax = ctx.max(a)
        ii = lax.broadcasted_iota(jnp.int32, (ctx.n, ctx.T), 0)
        # first-max tie-break = jnp.argmax semantics on the unfused path
        idx = -ctx.max(jnp.where(a == amax, -ii, -ctx.n).astype(jnp.int32)
                       .astype(ctx.dtype)).astype(jnp.int32)
        onehot = (ii == idx).astype(ctx.dtype)
        return -jnp.sign(G) * onehot


class _PnormSpec(_GDSpec):
    """Preconditioned steepest descent d = -P^{-1} g
    (pnorm_descent.rs:30-37); P^{-1} rides as an (n, n) const input and the
    direction is one MXU contraction per iteration."""

    def __init__(self, method):
        self.tol = float(method.grad_tol)
        self._pinv = jnp.asarray(method.inverse_p)

    def const_arrays(self):
        return (self._pinv,)

    def direction(self, st, X, G, Fv, active, ctx):
        pinv = ctx.method_consts[0]
        return -lax.dot_general(
            pinv, G, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        ).astype(ctx.dtype)


class _PGDSpec(_GDSpec):
    """Projected gradient (Andrei alg. 12.1): d = P(x - g) - x, projected
    gradient ||.||_inf test (projected_gradient_descent.rs:50-83)."""

    bounded = True

    def converged(self, st, X, G, Fv, ctx):
        return ctx.pg_inf_norm(X, G) < self.tol

    def direction(self, st, X, G, Fv, active, ctx):
        return ctx.clip(X - G) - X


class _SPGSpec(_PGDSpec):
    """Spectral projected gradient: BB-scaled projected gradient step
    (spg.rs:39-46 seeding, spg.rs:134-143 safeguarded update).  The opt-in
    ``bb_variant="alternate"`` alternates BB1/BB2 per completed step (the
    cycling-breaker for the config-3 f32 tail — see
    solvers.SpectralProjectedGradient docs); the per-lane step parity rides
    a float scratch row (Mosaic rule: no int/bool vector carries)."""

    def __init__(self, method):
        self.tol = float(method.grad_tol)
        self.lam_min = float(method.lambda_min)
        self.lam_max = float(method.lambda_max)
        self.alternate = getattr(method, "bb_variant", "bb1") == "alternate"

    def scratch(self, n, T, dtype):
        rows = [((1, T), dtype)]   # lam
        if self.alternate:
            rows.append(((1, T), dtype))  # completed-step parity (0/1)
        return rows

    def init(self, st, X, G, Fv, ctx):
        lam = st[0]
        d0 = ctx.clip(X[...] - G[...]) - X[...]
        l0 = 1.0 / ctx.max(jnp.abs(d0))
        lam[...] = jnp.clip(l0, self.lam_min, self.lam_max)
        if self.alternate:
            st[1][...] = jnp.zeros((1, ctx.T), ctx.dtype)

    def direction(self, st, X, G, Fv, active, ctx):
        lam = st[0]
        return ctx.clip(X - lam[...] * G) - X

    def post_step(self, st, active, d, t, X_old, G_old, F_old, X, G, Fv, ctx):
        lam = st[0]
        s = X - X_old
        y = G - G_old
        sy = ctx.sum(s * y)
        raw = ctx.sum(s * s) / sy
        if self.alternate:
            par = st[1]
            raw = jnp.where(par[...] > 0.5, sy / ctx.sum(y * y), raw)
            par[...] = jnp.where(active, 1.0 - par[...], par[...])
        lam_bb = jnp.clip(raw, self.lam_min, self.lam_max)
        lam_new = jnp.where(sy <= 0.0,
                            jnp.full((1, ctx.T), self.lam_max, ctx.dtype),
                            lam_bb)
        lam[...] = jnp.where(active, lam_new, lam[...])


class _NCGSpec(_GDSpec):
    """Nonlinear CG (fr / pr+ / hs / dy) with restart-on-nondescent and
    periodic restart (solvers/nonlinear_cg.py; no reference counterpart)."""

    def __init__(self, method):
        self.tol = float(method.grad_tol)
        self.variant = method.variant
        self.restart_every = int(method.restart_every)

    def scratch(self, n, T, dtype):
        return [((n, T), dtype),      # g_prev
                ((n, T), dtype),      # d_prev
                ((1, T), jnp.int32)]  # k_since_restart

    def init(self, st, X, G, Fv, ctx):
        Gp, Dp, ks = st
        Gp[...] = G[...]
        Dp[...] = -G[...]
        ks[...] = jnp.zeros((1, ctx.T), jnp.int32)

    def direction(self, st, X, G, Fv, active, ctx):
        Gp, Dp, ks = st
        g = G
        gp = Gp[...]
        dp = Dp[...]
        y = g - gp
        gg = ctx.sum(g * g)
        if self.variant == "fr":
            beta = gg / ctx.sum(gp * gp)
        elif self.variant == "pr+":
            beta = jnp.maximum(ctx.sum(g * y) / ctx.sum(gp * gp), 0.0)
        elif self.variant == "hs":
            beta = ctx.sum(g * y) / ctx.sum(dp * y)
        else:  # dy
            beta = gg / ctx.sum(dp * y)
        beta = jnp.where(jnp.isfinite(beta), beta, 0.0)

        period = self.restart_every if self.restart_every > 0 else ctx.n
        periodic = ks[...] >= period
        d = -g + jnp.where(periodic, 0.0, beta) * dp
        descent = ctx.sum(g * d) < 0.0
        d = jnp.where(descent, d, -g)
        restarted = periodic | ~descent
        ks[...] = jnp.where(active & restarted, 0, ks[...])
        return d

    def post_step(self, st, active, d, t, X_old, G_old, F_old, X, G, Fv, ctx):
        Gp, Dp, ks = st
        Gp[...] = jnp.where(active, G_old, Gp[...])
        Dp[...] = jnp.where(active, d, Dp[...])
        ks[...] = ks[...] + active.astype(jnp.int32)


class _QNSpec:
    """Dense quasi-Newton (bfgs / dfp / broyden / sr1): the lane-sliced
    (n, n, T) approximate inverse Hessian lives in VMEM; direction matvec
    and rank-1/rank-2 update are row-chunked slab traversals (same chunking
    pattern as ops/pallas_bfgs.py).  Mirrors solvers/quasi_newton.py
    semantics (reference ``src/quasi_newton/bfgs.rs:42-49,114-124`` and
    siblings), including the opt-in ``scale_b0`` / ``restart_on_degeneracy``
    robustness knobs.

    Deviation from the reference (shared with ops/pallas_bfgs.py): the
    update is skipped when the curvature s.y is non-positive — the
    reference applies it anyway and lets B go indefinite
    (``bfgs.rs:114-124``); in lockstep f32 batches that poisons lanes.
    """

    bounded = False
    row_block = 16

    def __init__(self, method):
        self.tol = float(method.tol)
        self.update = method.update
        self.scale_b0 = bool(method.scale_b0)
        self.restart = bool(method.restart_on_degeneracy)

    def scratch(self, n, T, dtype):
        return [((n, n, T), dtype),   # B (approx inverse Hessian, lane-last)
                ((1, T), dtype),      # s_norm
                ((1, T), dtype),      # y_norm
                ((1, T), jnp.int32),  # consecutive degenerate pairs
                ((1, T), dtype)]      # pending B-reset (restart mode)

    def const_arrays(self):
        return ()

    def preferred_tile(self, n, tile):
        return min(tile, 128)

    def vmem_limit(self, n, T, requested):
        if requested is not None:
            return requested
        slab = n * n * T * 4
        if slab * 3 > 120 * 2 ** 20:
            raise ValueError(
                f"dense QN slab (n={n}, tile={T}) exceeds VMEM; use the "
                "limited-memory kernels for large n")
        if slab * 3 > 16 * 2 ** 20:   # beyond the compiler's default guard
            return min(max(32 * 2 ** 20, slab * 3), 120 * 2 ** 20)
        return None

    # -- slab helpers -------------------------------------------------------
    def _eye_chunk(self, r0, rb, ctx):
        rows = lax.broadcasted_iota(jnp.int32, (rb, ctx.n), 0) + r0
        cols = lax.broadcasted_iota(jnp.int32, (rb, ctx.n), 1)
        return (rows == cols).astype(ctx.dtype)[:, :, None]

    def _matvec(self, Bref, v, ctx):
        """B @ v -> (n, T), row-chunked over the slab."""
        rows = []
        for r0 in range(0, ctx.n, self.row_block):
            rb = min(self.row_block, ctx.n - r0)
            prod = Bref[r0:r0 + rb] * v[None, :, :]
            rows.append(ctx.sum_mid(prod)[:, 0, :])
        return jnp.concatenate(rows, axis=0)

    def _rmatvec(self, Bref, v, ctx):
        """B^T @ v -> (n, T) (needed by the unsymmetric Broyden update)."""
        acc = jnp.zeros((ctx.n, ctx.T), ctx.dtype)
        for r0 in range(0, ctx.n, self.row_block):
            rb = min(self.row_block, ctx.n - r0)
            prod = Bref[r0:r0 + rb] * v[r0:r0 + rb][:, None, :]
            part = prod[0]
            for r in range(1, rb):
                part = part + prod[r]
            acc = acc + part
        return acc

    # -- driver hooks -------------------------------------------------------
    def init(self, st, X, G, Fv, ctx):
        B, sn, yn, stc, pend = st
        for r0 in range(0, ctx.n, self.row_block):
            rb = min(self.row_block, ctx.n - r0)
            B[r0:r0 + rb] = jnp.broadcast_to(
                self._eye_chunk(r0, rb, ctx), (rb, ctx.n, ctx.T))
        sn[...] = jnp.full((1, ctx.T), jnp.inf, ctx.dtype)
        yn[...] = jnp.full((1, ctx.T), jnp.inf, ctx.dtype)
        stc[...] = jnp.zeros((1, ctx.T), jnp.int32)
        pend[...] = jnp.zeros((1, ctx.T), ctx.dtype)

    def converged(self, st, X, G, Fv, ctx):
        B, sn, yn, stc = st[:4]
        gn = jnp.sqrt(ctx.sum(G * G))
        g_small = gn < self.tol
        if self.restart:
            # stall exit only after a restarted steepest-descent step also
            # produced a degenerate pair (lane at its numerical floor) —
            # see solvers/quasi_newton.py restart_on_degeneracy docs
            return g_small | (stc[...] >= 2)
        return g_small | (sn[...] < self.tol) | (yn[...] < self.tol)

    def direction(self, st, X, G, Fv, active, ctx):
        d = -self._matvec(st[0], G, ctx)
        if self.restart:
            # descent safeguard: f32 noise can leave B indefinite even with
            # curvature-gated updates; a non-descent direction would make
            # the Armijo tests accept uphill steps (catastrophic under the
            # non-monotone GLL window) — fall back to steepest descent.
            # A non-finite B g additionally means last iteration's update
            # overflowed B: any non-finite slab entry makes its whole
            # matvec row NaN (inf * 0 = NaN), so this (n, T)-vector check
            # is EXACT and free — the unfused robust path's
            # isfinite(B_new) gate without the whole-slab tally (which
            # measured 5x the kernel, and whose fused-reduce form does
            # not lower in Mosaic).  Flag it so the next update restarts
            # from the identity.
            fin = ctx.sum(jnp.where(jnp.isfinite(d),
                                    jnp.zeros((), ctx.dtype),
                                    jnp.ones((), ctx.dtype))) == 0
            gd = ctx.sum(G * d)
            d = jnp.where(fin & (gd < 0.0), d, -G)
            pend = st[4]
            pend[...] = jnp.where(active & ~fin,
                                  jnp.ones((), ctx.dtype), pend[...])
        return d

    def post_step(self, st, active, d, t, X_old, G_old, F_old, X, G, Fv, ctx):
        B, sn, yn, stc, pend = st
        # restart mode: a B poisoned by last iteration's overflowed update
        # is materialized as the identity HERE (the one loop that already
        # reads and writes every chunk), so the repair costs no extra slab
        # pass; the intervening direction() already fell back to -g because
        # a NaN/inf descent test selects the steepest-descent branch
        pending = pend[...] > 0.5
        eps = 1.2e-7 if ctx.dtype == jnp.float32 else 2.3e-16
        s = X - X_old
        y = G - G_old
        sy = ctx.sum(s * y)
        s_norm = jnp.sqrt(ctx.sum(s * s))
        y_norm = jnp.sqrt(ctx.sum(y * y))
        curv_ok = sy > eps * s_norm * y_norm

        first = ~jnp.isfinite(sn[...])
        if self.scale_b0:
            gamma = jnp.where(curv_ok, sy / ctx.sum(y * y), 1.0)
            scale_cond = first & curv_ok
        else:
            gamma = jnp.ones((1, ctx.T), ctx.dtype)
            scale_cond = jnp.zeros((1, ctx.T), bool)

        By = self._matvec(B, y, ctx)
        # at the first update B == I, so the scaled base gives By = gamma*y
        By = jnp.where(scale_cond, gamma * y, By)
        if self.restart:
            # pending reset: B is the identity for these lanes
            By = jnp.where(pending, y, By)

        sf = s[None, :, :]
        Byf = By[None, :, :]

        if self.update == "bfgs":
            yBy = ctx.sum(y * By)
            rho = 1.0 / sy
            coeff = rho * rho * yBy + rho
            ok = curv_ok

            def chunk_update(Bc, r0, rb):
                s_r = s[r0:r0 + rb][:, None, :]
                By_r = By[r0:r0 + rb][:, None, :]
                return (Bc - rho[None] * (s_r * Byf + By_r * sf)
                        + coeff[None] * (s_r * sf))
        elif self.update == "dfp":
            yBy = ctx.sum(y * By)
            ok = curv_ok & (yBy > eps * y_norm * y_norm)

            def chunk_update(Bc, r0, rb):
                s_r = s[r0:r0 + rb][:, None, :]
                By_r = By[r0:r0 + rb][:, None, :]
                return Bc + (s_r * sf) / sy[None] - (By_r * Byf) / yBy[None]
        elif self.update == "broyden":
            Bts = self._rmatvec(B, s, ctx)
            Bts = jnp.where(scale_cond, gamma * s, Bts)
            if self.restart:
                Bts = jnp.where(pending, s, Bts)
            Btsf = Bts[None, :, :]
            ok = jnp.abs(sy) > eps * s_norm * y_norm

            def chunk_update(Bc, r0, rb):
                s_r = s[r0:r0 + rb][:, None, :]
                By_r = By[r0:r0 + rb][:, None, :]
                return Bc + ((s_r - By_r) * Btsf) / sy[None]
        else:  # sr1
            shy = s - By
            denom = ctx.sum(shy * y)
            shy_norm = jnp.sqrt(ctx.sum(shy * shy))
            shyf = shy[None, :, :]
            ok = jnp.abs(denom) > eps * shy_norm * y_norm

            def chunk_update(Bc, r0, rb):
                shy_r = shy[r0:r0 + rb][:, None, :]
                return Bc + (shy_r * shyf) / denom[None]

        not_tiny = (s_norm >= self.tol) & (y_norm >= self.tol)
        if self.restart:
            # the unfused robust path gates EVERY update type on the
            # SIGNED curvature (quasi_newton.py _robust_post_step); the
            # per-type |denominator| gates above are the parity-mode
            # deviation only — near-zero denominators under the signed
            # gate produce non-finite updates, repaired below exactly as
            # the unfused jnp.all(isfinite(B_new)) check would
            ok = curv_ok
        ok = ok & not_tiny & jnp.isfinite(sy)
        upd = active & ok
        # restart mode: a degenerate pair on an active lane resets B to I
        reset = active & ~ok if self.restart else jnp.zeros((1, ctx.T), bool)

        for r0 in range(0, ctx.n, self.row_block):
            rb = min(self.row_block, ctx.n - r0)
            eye_c = self._eye_chunk(r0, rb, ctx)
            Bc = B[r0:r0 + rb]
            if self.restart:
                Bc = jnp.where(
                    pending[None], jnp.broadcast_to(eye_c, Bc.shape), Bc)
            if self.scale_b0:
                Bc = jnp.where(scale_cond[None], gamma[None] * eye_c, Bc)
            new_c = chunk_update(Bc, r0, rb)
            out = jnp.where(upd[None], new_c, Bc)
            if self.restart:
                out = jnp.where(
                    reset[None], jnp.broadcast_to(eye_c, out.shape), out)
            B[r0:r0 + rb] = out

        if self.restart:
            # the repaired lanes count a stall (one iteration later than
            # the unfused path's immediate detection, same net behavior:
            # the intervening direction was already -g) and the flag is
            # consumed by the materialization above
            stall_clear = ok & ~pending
            pend[...] = jnp.where(active, jnp.zeros((), ctx.dtype),
                                  pend[...])
        else:
            stall_clear = ok

        sn[...] = jnp.where(active, s_norm, sn[...])
        yn[...] = jnp.where(active, y_norm, yn[...])
        stc[...] = jnp.where(
            active, jnp.where(stall_clear, jnp.int32(0), stc[...] + 1),
            stc[...])


class _QNBSpec(_QNSpec):
    """Box-constrained dense QN: ``d = P_box(x - B g) - x``
    (``bfgs_b.rs:66-77``); convergence still tests the RAW gradient 2-norm,
    exactly like the reference (``bfgs_b.rs:92-104``)."""

    bounded = True

    def direction(self, st, X, G, Fv, active, ctx):
        Bg = self._matvec(st[0], G, ctx)
        d = ctx.clip(X - Bg) - X
        if self.restart:
            # same poisoned-B detection as the unbounded spec — checked on
            # the raw B g (the clip would silently clamp +-inf into the
            # box and hide the poison)
            fin = ctx.sum(jnp.where(jnp.isfinite(Bg),
                                    jnp.zeros((), ctx.dtype),
                                    jnp.ones((), ctx.dtype))) == 0
            gd = ctx.sum(G * d)
            d = jnp.where(fin & (gd < 0.0), d, ctx.clip(X - G) - X)
            pend = st[4]
            pend[...] = jnp.where(active & ~fin,
                                  jnp.ones((), ctx.dtype), pend[...])
        return d


class _LBFGSSpec:
    """Limited-memory BFGS (solvers/lbfgs.py) as a fused tile spec: the
    (m, n, T) S/Y histories live in VMEM scratch with shift-not-ring
    updates, and the two-loop recursion unrolls over the static history
    length m — a chain of full-lane (n, T) FMAs with (1, T) scalars.
    O(m n) memory per lane vs the dense family's (n, n, T) slabs, so it
    scales to much larger n at fused-kernel speed."""

    bounded = False

    def __init__(self, method):
        self.tol = float(method.tol)
        self.m = int(method.m)
        self.curvature_eps = float(method.curvature_eps)

    def scratch(self, n, T, dtype):
        m = self.m
        return [((m, n, T), dtype),   # S (row m-1 = newest pair)
                ((m, n, T), dtype),   # Y
                ((m, T), dtype),      # rho = 1/s.y (0 on invalid slots)
                ((m, T), dtype),      # valid (float 0/1)
                ((1, T), dtype)]      # gamma (H0 = gamma I)

    def const_arrays(self):
        return ()

    def init(self, st, X, G, Fv, ctx):
        S, Y, rho, valid, gamma = st
        S[...] = jnp.zeros((self.m, ctx.n, ctx.T), ctx.dtype)
        Y[...] = jnp.zeros((self.m, ctx.n, ctx.T), ctx.dtype)
        rho[...] = jnp.zeros((self.m, ctx.T), ctx.dtype)
        valid[...] = jnp.zeros((self.m, ctx.T), ctx.dtype)
        gamma[...] = jnp.ones((1, ctx.T), ctx.dtype)

    def converged(self, st, X, G, Fv, ctx):
        return ctx.max(jnp.abs(G)) < self.tol

    def direction(self, st, X, G, Fv, active, ctx):
        S, Y, rho, valid, gamma = st
        m = self.m
        q = G
        alphas = [None] * m
        for j in range(m - 1, -1, -1):          # newest -> oldest
            vj = valid[j][None, :]               # (1, T) 0/1
            a = rho[j][None, :] * ctx.sum(S[j] * q) * vj
            q = q - a * Y[j]
            alphas[j] = a
        r = gamma[...] * q
        for j in range(m):                       # oldest -> newest
            vj = valid[j][None, :]
            b = rho[j][None, :] * ctx.sum(Y[j] * r) * vj
            r = r + (alphas[j] - b) * S[j]
        d = -r
        # descent safeguard with history reset (mirrors solvers/lbfgs.py
        # LBFGS.direction): any non-finite entry or a non-descent d means
        # the f32 two-loop model is corrupt — discard it and retry from
        # steepest descent, like the Fortran mainlb restart.  The finiteness
        # tally uses the same zero/one-sum trick as the dense-QN restart
        # (a direct fused-reduce isfinite does not lower in Mosaic).
        fin = ctx.sum(jnp.where(jnp.isfinite(d),
                                jnp.zeros((), ctx.dtype),
                                jnp.ones((), ctx.dtype))) == 0
        gd = ctx.sum(G * d)
        ok = fin & (gd < 0.0)
        bad = active & ~ok
        d = jnp.where(ok, d, -G)
        bad_row = bad[0]                         # (T,)
        zrow = jnp.zeros((ctx.T,), ctx.dtype)
        for j in range(m):
            rho[j] = jnp.where(bad_row, zrow, rho[j])
            valid[j] = jnp.where(bad_row, zrow, valid[j])
        gamma[...] = jnp.where(bad, jnp.ones((1, ctx.T), ctx.dtype),
                               gamma[...])
        return d

    def post_step(self, st, active, d, t, X_old, G_old, F_old, X, G, Fv, ctx):
        S, Y, rho, valid, gamma = st
        m = self.m
        s = X - X_old
        y = G - G_old
        sy = ctx.sum(s * y)
        yy = ctx.sum(y * y)
        # dtype-aware curvature floor, as in the L-BFGS-B backends: the f64
        # default eps is vacuous against f32 cancellation noise
        eps = max(self.curvature_eps,
                  1.2e-7 if ctx.dtype == jnp.float32 else 2.3e-16)
        accept = active & (sy > eps * yy)
        # shift-not-ring, per-lane masked (see pallas_lbfgs docstring rules)
        acc_row = accept[0]                      # (T,)
        for p in range(m - 1):
            S[p] = jnp.where(accept, S[p + 1], S[p])
            Y[p] = jnp.where(accept, Y[p + 1], Y[p])
            rho[p] = jnp.where(acc_row, rho[p + 1], rho[p])
            valid[p] = jnp.where(acc_row, valid[p + 1], valid[p])
        S[m - 1] = jnp.where(accept, s, S[m - 1])
        Y[m - 1] = jnp.where(accept, y, Y[m - 1])
        rho[m - 1] = jnp.where(acc_row, (1.0 / sy)[0], rho[m - 1])
        valid[m - 1] = jnp.where(acc_row, 1.0, valid[m - 1])
        gamma[...] = jnp.where(accept, sy / yy, gamma[...])
        # zero-progress repair (mirrors solvers/lbfgs.py LBFGS.post_step):
        # an accepted step that underflowed the iterate leaves a
        # bit-identical state and wedges the lane at a non-stationary point;
        # wipe the model so the retry goes through steepest descent.  The
        # moved tally uses the where-zero/one-sum trick (a fused-reduce
        # of a comparison does not lower in Mosaic).
        zeros = jnp.zeros((ctx.n, ctx.T), ctx.dtype)
        ones = jnp.ones((ctx.n, ctx.T), ctx.dtype)
        moved = ctx.sum(jnp.where(s == 0.0, zeros, ones))
        no_move = active & (moved == 0.0)
        nm_row = no_move[0]                      # (T,)
        zrow = jnp.zeros((ctx.T,), ctx.dtype)
        for p in range(m):
            rho[p] = jnp.where(nm_row, zrow, rho[p])
            valid[p] = jnp.where(nm_row, zrow, valid[p])
        gamma[...] = jnp.where(no_move, jnp.ones((1, ctx.T), ctx.dtype),
                               gamma[...])


class _NewtonCommon:
    """Shared machinery for the fused Newton family (reference
    ``src/newton/``): per-iteration dense Hessians (forward-over-reverse AD
    traced straight into the kernel) and a lane-parallel masked Cholesky
    over the (n, n, T) VMEM slab.

    Mosaic re-expression of ``hessian.cholesky().solve(g)``
    (``projected_newton.rs:75``): the right-looking factorization runs
    ``n`` masked full-slab rank-1 downdates (every op full-lane VPU work,
    no scalar indexing); the factor's column ``j`` is stored as ROW ``j``
    of a second slab (``L[j] = column j``) because Mosaic supports dynamic
    indexing on the major axis only.  Triangular solves are ``n`` masked
    dot-axpy sweeps against those rows.  Work vectors live in scratch —
    loop carries stay scalar (see module docstring rules).
    """

    bounded = False
    needs_hessian = True

    def _base_scratch(self, n, T, dtype):
        return [((n, n, T), dtype),   # H (downdated in place)
                ((n, n, T), dtype),   # L (row j = factor column j)
                ((n, T), dtype),      # w1: rhs / solution
                ((n, T), dtype),      # w2: forward-solve intermediate
                ((1, T), dtype)]      # flags: 1.0 where a pivot collapsed
                                      # (Mosaic forbids vector loop carries,
                                      # so the bad-pivot mask lives here)

    def preferred_tile(self, n, tile):
        return min(tile, 128)

    def vmem_limit(self, n, T, requested):
        if requested is not None:
            return requested
        slabs = 2 * n * n * T * 4
        if slabs * 2 > 120 * 2 ** 20:   # ~2x headroom for AD intermediates
            raise ValueError(
                f"fused Newton slabs (n={n}, tile={T}) exceed VMEM; use the "
                "XLA batched-Cholesky path for large n")
        if slabs * 2 > 16 * 2 ** 20:
            return min(max(32 * 2 ** 20, slabs * 2), 120 * 2 ** 20)
        return None

    def const_arrays(self):
        return ()

    def _row_extract(self, v, j, ctx):
        """v (n, T), traced j -> (1, T) element row via one-hot reduction."""
        sel = lax.broadcasted_iota(jnp.int32, (ctx.n, ctx.T), 0) == j
        return ctx.sum(jnp.where(sel, v, 0.0))

    def _factor(self, st, ctx):
        """Right-looking masked Cholesky of H (slab 0) into L (slab 1);
        returns a (1, T) ``bad`` mask — true where a pivot collapsed (H not
        numerically SPD on that lane)."""
        H, L = st[0], st[1]
        n, T = ctx.n, ctx.T
        eps = 1.2e-7 if ctx.dtype == jnp.float32 else 2.3e-16
        rows3 = lax.broadcasted_iota(jnp.int32, (n, n, T), 0)
        cols3 = lax.broadcasted_iota(jnp.int32, (n, n, T), 1)
        rows2 = lax.broadcasted_iota(jnp.int32, (n, T), 0)

        # diagonal scale for the PD test: pivot must stay a sane fraction
        # of the original diagonal, not just above machine eps
        diag = ctx.sum_mid(jnp.where(rows3 == cols3, H[...], 0.0))[:, 0, :]
        dmax = ctx.max(jnp.abs(diag))

        flags = st[4]
        flags[...] = jnp.zeros((1, T), ctx.dtype)

        def fact_body(j, _):
            Hj = H[j]                                     # (n, T)
            piv = self._row_extract(Hj, j, ctx)           # (1, T)
            flags[...] = jnp.maximum(
                flags[...],
                (piv <= eps * jnp.maximum(dmax, 1.0)).astype(ctx.dtype))
            piv_s = jnp.sqrt(jnp.maximum(piv, eps))
            col = jnp.where(rows2 > j, Hj / piv_s, 0.0)
            L[j] = col + jnp.where(rows2 == j, jnp.broadcast_to(piv_s, (n, T)), 0.0)
            mask = (rows3 > j) & (cols3 > j)
            H[...] = H[...] - jnp.where(mask, col[:, None, :] * col[None, :, :], 0.0)
            return 0

        lax.fori_loop(0, n, fact_body, 0)
        return flags[...] > 0.0

    def _tri_solve(self, st, rhs, ctx):
        """Solve ``H w = rhs`` re-using the factor in slab 1 (forward then
        backward masked substitution sweeps); returns the (n, T) solution."""
        L, w1, w2 = st[1], st[2], st[3]
        n, T, dtype = ctx.n, ctx.T, ctx.dtype
        rows2 = lax.broadcasted_iota(jnp.int32, (n, T), 0)

        # forward solve L y = rhs  (y accumulates in w2, residual in w1)
        w1[...] = rhs
        w2[...] = jnp.zeros((n, T), dtype)

        def fwd_body(j, _):
            Lcol = L[j]
            piv = self._row_extract(Lcol, j, ctx)
            yj = self._row_extract(w1[...], j, ctx) / piv
            w2[...] = w2[...] + jnp.where(rows2 == j, jnp.broadcast_to(yj, (n, T)), 0.0)
            w1[...] = w1[...] - yj * jnp.where(rows2 > j, Lcol, 0.0)
            return 0

        lax.fori_loop(0, n, fwd_body, 0)

        # backward solve L^T x = y  (x accumulates in w1)
        w1[...] = jnp.zeros((n, T), dtype)

        def bwd_body(i, _):
            j = n - 1 - i
            Lcol = L[j]
            piv = self._row_extract(Lcol, j, ctx)
            dotv = ctx.sum(jnp.where(rows2 > j, Lcol * w1[...], 0.0))
            xj = (self._row_extract(w2[...], j, ctx) - dotv) / piv
            w1[...] = w1[...] + jnp.where(rows2 == j, jnp.broadcast_to(xj, (n, T)), 0.0)
            return 0

        lax.fori_loop(0, n, bwd_body, 0)
        return w1[...]

    def _chol_solve(self, st, G, ctx):
        """Factor + solve ``H step = G``; returns ``(step, ok_mask)``."""
        bad = self._factor(st, ctx)
        step = self._tri_solve(st, G, ctx)
        ok = ~bad & (ctx.sum((~jnp.isfinite(step)).astype(ctx.dtype)) == 0.0)
        return step, ok


class _NewtonSpec(_NewtonCommon):
    """Damped Newton (``newton/mod.rs:26-69``): ``d = -H^{-1} g`` with
    steepest-descent fallback, stop when half the squared decrement
    ``(H^{-1} d) . d`` is below tol (the reference's literal quantity,
    ``mod.rs:40``).

    Documented deviation: the unfused path inverts H (``jnp.linalg.inv``)
    and takes Newton steps on indefinite-but-invertible Hessians; in the
    kernel a non-PD H triggers the steepest-descent fallback instead (the
    Cholesky is the only factorization that maps to lane-parallel VPU
    work, and a guarded descent direction is strictly more robust)."""

    def __init__(self, method):
        self.tol = float(method.tol)

    def scratch(self, n, T, dtype):
        return self._base_scratch(n, T, dtype) + [((1, T), dtype)]  # dec2

    def init(self, st, X, G, Fv, ctx):
        dec2 = st[5]
        dec2[...] = jnp.full((1, ctx.T), jnp.inf, ctx.dtype)

    def post_step(self, st, active, d, t, X_old, G_old, F_old, X, G, Fv, ctx):
        pass

    def converged(self, st, X, G, Fv, ctx):
        dec2 = st[5]
        return dec2[...] * 0.5 < self.tol

    def direction(self, st, X, G, Fv, active, ctx):
        dec2 = st[5]
        H = st[0]
        H[...] = ctx.bhess(X)
        step, ok = self._chol_solve(st, G, ctx)
        d = jnp.where(ok, -step, -G)
        # decrement: the reference's literal (H^{-1} d) . d with
        # d = -H^{-1} g (``newton/mod.rs:40``) — one more solve against the
        # factor already sitting in the L slab
        z = self._tri_solve(st, d, ctx)
        dec2[...] = jnp.where(ok, ctx.sum(z * d), dec2[...])
        return d


class _PNSpec(_NewtonCommon):
    """Projected Newton (``projected_newton.rs:64-110``):
    ``d = P_box(x - H^{-1} g) - x``; stops on the projected-gradient
    infinity norm or when iterate/gradient stopped moving.  The reference
    panics on a non-PD Hessian; here that lane falls back to the projected
    gradient direction."""

    bounded = True

    def __init__(self, method):
        self.tol = float(method.grad_tol)

    def scratch(self, n, T, dtype):
        return self._base_scratch(n, T, dtype) + [
            ((1, T), dtype), ((1, T), dtype)]  # s_norm, y_norm

    def init(self, st, X, G, Fv, ctx):
        sn, yn = st[5], st[6]
        sn[...] = jnp.full((1, ctx.T), jnp.inf, ctx.dtype)
        yn[...] = jnp.full((1, ctx.T), jnp.inf, ctx.dtype)

    def converged(self, st, X, G, Fv, ctx):
        sn, yn = st[5], st[6]
        too_close = (sn[...] < self.tol) | (yn[...] < self.tol)
        return too_close | (ctx.pg_inf_norm(X, G) < self.tol)

    def direction(self, st, X, G, Fv, active, ctx):
        H = st[0]
        H[...] = ctx.bhess(X)
        step, ok = self._chol_solve(st, G, ctx)
        step = jnp.where(ok, step, G)
        return ctx.clip(X - step) - X

    def post_step(self, st, active, d, t, X_old, G_old, F_old, X, G, Fv, ctx):
        sn, yn = st[5], st[6]
        s = X - X_old
        y = G - G_old
        sn[...] = jnp.where(active, jnp.sqrt(ctx.sum(s * s)), sn[...])
        yn[...] = jnp.where(active, jnp.sqrt(ctx.sum(y * y)), yn[...])


class _SPNSpec(_NewtonCommon):
    """Spectral projected Newton (``newton/spn.rs:76-91,139-148``): the
    projected Newton step scaled by the safeguarded Barzilai-Borwein
    scalar; BB update identical to SPG."""

    bounded = True

    def __init__(self, method):
        self.tol = float(method.grad_tol)
        self.lam_min = float(method.lambda_min)
        self.lam_max = float(method.lambda_max)
        self.precond_bb = bool(getattr(method, "precond_bb", False))

    def scratch(self, n, T, dtype):
        return self._base_scratch(n, T, dtype) + [((1, T), dtype)]  # lam

    def init(self, st, X, G, Fv, ctx):
        lam = st[5]
        d0 = ctx.clip(X[...] - G[...]) - X[...]
        l0 = 1.0 / ctx.max(jnp.abs(d0))
        lam[...] = jnp.clip(l0, self.lam_min, self.lam_max)

    def converged(self, st, X, G, Fv, ctx):
        return ctx.pg_inf_norm(X, G) < self.tol

    def direction(self, st, X, G, Fv, active, ctx):
        H, lam = st[0], st[5]
        H[...] = ctx.bhess(X)
        step, ok = self._chol_solve(st, G, ctx)
        step = jnp.where(ok, step, G)
        return ctx.clip(X - lam[...] * step) - X

    def post_step(self, st, active, d, t, X_old, G_old, F_old, X, G, Fv, ctx):
        lam = st[5]
        s = X - X_old
        y = G - G_old
        if self.precond_bb:
            # Newton-metric pair (see SpectralProjectedNewton docstring):
            # the Cholesky factor of H(X_old) from direction() is still in
            # slab 1, so H^{-1} y is two triangular sweeps; lanes whose
            # factor collapsed (flags slab) fall back to the gradient pair
            yt = self._tri_solve(st, y, ctx)
            bad = (st[4][...] > 0.0) | (
                ctx.sum((~jnp.isfinite(yt)).astype(ctx.dtype)) > 0.0)
            y = jnp.where(bad, y, yt)
        sy = ctx.sum(s * y)
        lam_bb = jnp.clip(ctx.sum(s * s) / sy, self.lam_min, self.lam_max)
        # sy > 0 keeps NaN pairs on the lambda_max reset (Rust min/max
        # NaN semantics in the reference do the same)
        lam_new = jnp.where(sy > 0.0, lam_bb,
                            jnp.full((1, ctx.T), self.lam_max, ctx.dtype))
        lam[...] = jnp.where(active, lam_new, lam[...])


# ---------------------------------------------------------------------------
# Line-search specs
# ---------------------------------------------------------------------------


class _NoSearchSpec:
    """Constant t = 1 (nosearch.rs:3-15)."""

    def scratch(self, n, T, dtype):
        return []

    def init(self, st, Fv, ctx):
        pass

    def run(self, st, X, G, Fv, d, active, bval, max_iter_ls, ctx):
        return jnp.ones((1, ctx.T), ctx.dtype)


class _BTSpec:
    """Armijo backtracking, plain (backtracking.rs:28-54) and bounded
    (backtracking_b.rs:24-35: trial projected onto the box, modified Armijo
    ``f - f0 <= (-c1/t)||x_t - x||^2``)."""

    def __init__(self, search, bounded: bool):
        self.c1 = float(search.c1)
        self.beta = float(search.beta)
        self.bounded = bounded

    def scratch(self, n, T, dtype):
        return [((1, T), dtype), ((1, T), jnp.int32)]  # t, done

    def init(self, st, Fv, ctx):
        pass

    def run(self, st, X, G, Fv, d, active, bval, max_iter_ls, ctx):
        ls_t, ls_done = st
        f0 = Fv
        g0d = ctx.sum(G * d)
        ls_t[...] = jnp.ones((1, ctx.T), ctx.dtype)
        ls_done[...] = (~active).astype(jnp.int32)

        def cond(s):
            j, n_act = s
            return (j < max_iter_ls) & (n_act > 0)

        def body(s):
            j, _ = s
            t = ls_t[...]
            done = ls_done[...] > 0
            if self.bounded:
                x_t = ctx.clip(X + t * d)
                f_t = bval(x_t)
                diff = x_t - X
                ok = (f_t - f0 <= (-self.c1 / t) * ctx.sum(diff * diff))
            else:
                f_t = bval(X + t * d)
                ok = (f_t - f0 <= self.c1 * t * g0d)
            ok = ok & jnp.isfinite(f_t)
            keep = done | ok
            ls_t[...] = jnp.where(keep, t, t * self.beta)
            ls_done[...] = keep.astype(jnp.int32)
            return (j + 1, jnp.sum((~keep).astype(jnp.int32), dtype=jnp.int32))

        lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
        return ls_t[...]


class _GLLSpec:
    """GLL non-monotone Armijo with the safeguarded quadratic-interpolation
    trial update (gll_quadratic.rs:62-93); the f-history ring lives in
    scratch and persists across outer iterations, as in the unfused state."""

    def __init__(self, search):
        self.c1 = float(search.c1)
        self.m = int(search.m)
        self.sigma1 = float(search.sigma1)
        self.sigma2 = float(search.sigma2)

    def scratch(self, n, T, dtype):
        return [((self.m, T), dtype),   # fhist
                ((1, T), dtype),        # t
                ((1, T), jnp.int32)]    # done

    def init(self, st, Fv, ctx):
        fhist, _, _ = st
        fhist[...] = jnp.full((self.m, ctx.T), -jnp.inf, ctx.dtype)

    def run(self, st, X, G, Fv, d, active, bval, max_iter_ls, ctx):
        fhist, ls_t, ls_done = st
        # append f(x_k) to the ring (gll_quadratic.rs:62); shift-not-ring
        for p in range(self.m - 1):
            fhist[p] = fhist[p + 1]
        fhist[self.m - 1] = Fv[0]
        f_max = ctx.max(fhist[...])  # the consts-safe reducer, like every
        # other axis-0 reduction in this file (plain jnp.max risks the
        # replicated-layout accumulator Mosaic cannot lower)

        f0 = Fv
        g0d = ctx.sum(G * d)
        ls_t[...] = jnp.ones((1, ctx.T), ctx.dtype)
        ls_done[...] = (~active).astype(jnp.int32)

        def cond(s):
            j, n_act = s
            return (j < max_iter_ls) & (n_act > 0)

        def body(s):
            j, _ = s
            t = ls_t[...]
            done = ls_done[...] > 0
            f_t = bval(X + t * d)
            ok = (f_t - f_max <= self.c1 * t * g0d) & jnp.isfinite(f_t)
            # reference trial update (gll_quadratic.rs:78-93), IDENTICAL to
            # linesearch/gll.py: quadratic interpolant accepted only inside
            # the (absolute sigma1, relative sigma2*t) window, halved
            # otherwise.  A relative-clip variant (clip(t_tmp, s1*t, s2*t))
            # was measured to LIMIT-CYCLE under the non-monotone test on
            # stiff quadratics (GD+GLL conv 0.0 vs 1.0, round-3 hw sweep):
            # the clipped-up trials keep re-inflating f while f_max stays
            # poisoned by past spikes.
            t_half = t * 0.5
            t_tmp = -0.5 * t * t * g0d / (f_t - f0 - t * g0d)
            t_quad = jnp.where(
                (t_tmp > self.sigma1) & (t_tmp < self.sigma2 * t),
                t_tmp, t_tmp * 0.5)
            t_next = jnp.where(t <= 0.1, t_half, t_quad)
            # lockup guard (same as the unfused path): an overflowed f_t
            # gives t_tmp ~ +-0 whose halving freezes t at 0 forever
            t_next = jnp.where(
                jnp.isfinite(t_next) & (t_next > 0.0), t_next, t_half)
            keep = done | ok
            ls_t[...] = jnp.where(keep, t, t_next)
            ls_done[...] = keep.astype(jnp.int32)
            return (j + 1, jnp.sum((~keep).astype(jnp.int32), dtype=jnp.int32))

        lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
        return ls_t[...]


class _MTSpec:
    """Moré-Thuente strong-Wolfe search as a fused tile spec — the same
    masked scalar dataflow as ``linesearch/morethuente.py`` with per-lane
    scalars on (1, T) rows (corrected interval update only; a
    ``reference_quirks=True`` search falls back to the XLA path).  Needs
    trial-point GRADIENTS, so it evaluates through ``ctx.bvg`` (two evals
    per trial at t and tl, plus one at tu — lockstep lanes pay the case-4
    eval unconditionally, exactly like the vmapped ``lax.cond``->select).

    Bounded variant (``morethuente_b.rs:185-205``): ``t_max`` capped at the
    per-coordinate max feasible step, kept as a running minimum across
    line-search calls within the solve (persistent scratch row)."""

    def __init__(self, search, bounded: bool):
        self.c1 = float(search.c1)
        self.c2 = float(search.c2)
        self.t_min0 = float(search.t_min)
        self.t_max0 = float(search.t_max)
        self.delta = float(search.delta)
        self.bounded = bounded
        self.approx_wolfe = bool(getattr(search, "approx_wolfe", False))
        self.aw_eps = float(getattr(search, "aw_eps", 1e-6))

    def scratch(self, n, T, dtype):
        # rows: 0=t 1=tl 2=tu 3=modified 4=int_conv 5=done 6=t_min 7=t_max
        slots = [((8, T), dtype)]
        if self.bounded:
            slots.append(((1, T), dtype))   # running t_max across calls
        return slots

    def init(self, st, Fv, ctx):
        if self.bounded:
            st[1][...] = jnp.full((1, ctx.T), self.t_max0, ctx.dtype)

    def run(self, st, X, G, Fv, d, active, bval, max_iter_ls, ctx):
        from optimization_solvers_tpu.core.numerics import (
            rust_clamp, rust_max, rust_min)
        from optimization_solvers_tpu.linesearch.base import strong_wolfe
        from optimization_solvers_tpu.linesearch.morethuente import (
            _cubic_minimizer, _quadratic_minimizer_1, _quadratic_minimizer_2,
            _update_interval)

        mt = st[0]
        dtype, T = ctx.dtype, ctx.T
        c1 = jnp.asarray(self.c1, dtype)
        c2 = jnp.asarray(self.c2, dtype)
        delta = jnp.asarray(self.delta, dtype)

        t_min = jnp.full((1, T), self.t_min0, dtype)
        if self.bounded:
            run_tmax = st[1]
            cap = ctx.max_feasible_step(X, d)
            run_tmax[...] = jnp.minimum(run_tmax[...], cap)
            t_max = run_tmax[...]
        else:
            t_max = jnp.full((1, T), self.t_max0, dtype)

        f0 = Fv
        g0d = ctx.sum(G * d)

        mt[0] = rust_min(rust_max(jnp.ones((1, T), dtype), t_min), t_max)[0]
        mt[1] = t_min[0]
        mt[2] = t_max[0]
        mt[3] = jnp.zeros((T,), dtype)
        mt[4] = jnp.zeros((T,), dtype)
        mt[5] = (~active)[0].astype(dtype)
        mt[6] = t_min[0]
        mt[7] = t_max[0]

        def phi(t):
            f_t, g_t = ctx.bvg(X + t * d)
            return f_t, ctx.sum(g_t * d)

        def psi_of(phi_f, phi_g, t):
            return phi_f - f0 - c1 * t * g0d, phi_g - c1 * g0d

        def cond(s):
            i, n_go = s
            return (i < max_iter_ls) & (n_go > 0)

        def body(s):
            i, _ = s
            t = mt[0][None, :]
            tl = mt[1][None, :]
            tu = mt[2][None, :]
            modified = mt[3][None, :] > 0
            int_conv = mt[4][None, :] > 0
            done = mt[5][None, :] > 0

            phi_t_f, phi_t_g = phi(t)
            swc = strong_wolfe(c1, c2, f0, phi_t_f, g0d, phi_t_g, t)
            if self.approx_wolfe:
                # Hager-Zhang T2 acceptance (mirrors the unfused
                # MoreThuente.approx_wolfe; see its field docstring)
                awc = (
                    ((2.0 * self.c1 - 1.0) * g0d >= phi_t_g)
                    & (phi_t_g >= c2 * g0d)
                    & (phi_t_f <= f0 + self.aw_eps * jnp.abs(f0))
                    & (t > 0.0)
                )
                swc = swc | awc
            finish = swc | int_conv | (t == tl) | (t == tu)

            psi_t_f, psi_t_g = psi_of(phi_t_f, phi_t_g, t)
            modified = modified | ((psi_t_f <= 0.0) & (phi_t_g > 0.0))

            phi_tl_f, phi_tl_g = phi(tl)
            psi_tl_f, psi_tl_g = psi_of(phi_tl_f, phi_tl_g, tl)

            f_l = jnp.where(modified, phi_tl_f, psi_tl_f)
            g_l = jnp.where(modified, phi_tl_g, psi_tl_g)
            f_c = jnp.where(modified, phi_t_f, psi_t_f)
            g_c = jnp.where(modified, phi_t_g, psi_t_g)

            case1 = f_c > f_l
            case2 = (~case1) & (g_c * g_l < 0.0)
            case3 = (~case1) & (~case2) & (jnp.abs(g_c) <= jnp.abs(g_l))
            case4 = ~(case1 | case2 | case3)

            tc = _cubic_minimizer(tl, t, f_l, f_c, g_l, g_c)
            tq = _quadratic_minimizer_1(tl, t, f_l, f_c, g_l)
            ts = _quadratic_minimizer_2(tl, t, g_l, g_c)

            t1 = jnp.where(jnp.abs(tc - tl) < jnp.abs(tq - tl), tc,
                           0.5 * (tq + tc))
            t2 = jnp.where(jnp.abs(tc - t) >= jnp.abs(ts - t), tc, ts)
            t_plus = jnp.where(jnp.abs(tc - t) < jnp.abs(ts - t), tc, ts)
            t3 = jnp.where(
                t > tl,
                rust_min(t_plus, t + delta * (tu - t)),
                rust_max(t_plus, t + delta * (tu - t)),
            )

            # case-4 extra eval at tu, lockstep (all lanes pay it)
            phi_tu_f, phi_tu_g = phi(tu)
            psi_tu_f, psi_tu_g = psi_of(phi_tu_f, phi_tu_g, tu)
            f_u = jnp.where(modified, phi_tu_f, psi_tu_f)
            g_u = jnp.where(modified, phi_tu_g, psi_tu_g)
            t4 = _cubic_minimizer(tu, t, f_c, f_u, g_c, g_u)
            t4 = jnp.where(case4 & ~finish, t4, t)

            t_new = jnp.where(case1, t1,
                              jnp.where(case2, t2,
                                        jnp.where(case3, t3, t4)))
            t_new = rust_clamp(t_new, mt[6][None, :], mt[7][None, :])
            # force-progress safeguard — keep in sync with
            # linesearch/morethuente.py (MINPACK dcsrch semantics):
            # extrapolate while unbracketed, bisect once bracketed
            no_prog = (t_new == tl) | (t_new == tu) | ~jnp.isfinite(t_new)
            fallback = jnp.where(jnp.isfinite(tu), 0.5 * (tl + tu), 2.0 * t)
            t_new = jnp.where(
                no_prog,
                rust_clamp(fallback, mt[6][None, :], mt[7][None, :]),
                t_new)

            # corrected MT: interval revised at the EVALUATED t
            tl_new, tu_new, conv_new = _update_interval(
                f_l, f_c, g_c, tl, t, tu)

            keep = finish | done
            mt[0] = jnp.where(keep, t, t_new)[0]
            mt[1] = jnp.where(keep, tl, tl_new)[0]
            mt[2] = jnp.where(keep, tu, tu_new)[0]
            mt[3] = modified[0].astype(dtype)
            # Mosaic cannot lower a select over i1 vectors (i8->i1 trunc);
            # select between float 0/1 encodings instead
            mt[4] = jnp.where(keep, int_conv.astype(dtype),
                              conv_new.astype(dtype))[0]
            mt[5] = (done | finish)[0].astype(dtype)
            n_go = jnp.sum((mt[5] == 0.0).astype(jnp.int32),
                           dtype=jnp.int32)
            return (i + 1, n_go)

        lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
        return mt[0][None, :]


class _DcsrchSpec:
    """MINPACK-2 ``dcsrch`` strong-Wolfe search (``linesearch/dcsrch.py:
    StrongWolfe`` — the search the Fortran L-BFGS-B uses, reached by the
    reference through ``setulb_``, ``lbfgsb.rs:36-57``) as a fused tile
    spec: the same per-lane scalar dataflow on (1, T) rows, reusing the
    unfused ``_dcstep`` verbatim (it is pure elementwise jnp).  One
    gradient-bearing trial eval per loop trip through ``ctx.bvg``.
    ``StrongWolfe(bounded=True)`` caps the max step at the per-coordinate
    distance to the box boundary (the L-BFGS-B ``stpmx``)."""

    def __init__(self, search):
        self.c1 = float(search.c1)
        self.c2 = float(search.c2)
        self.xtol = float(search.xtol)
        self.stp_min = float(search.stp_min)
        self.stp_max = float(search.stp_max)
        self.bounded = bool(search.bounded)
        self.xtrapl = float(search.xtrapl)
        self.xtrapu = float(search.xtrapu)

    def scratch(self, n, T, dtype):
        # rows: 0=stp 1=stx 2=fx 3=dx 4=sty 5=fy 6=dy 7=brackt 8=stage1
        #       9=width 10=width1 11=stmin 12=stmax 13=done 14=stpmax_g
        return [((15, T), dtype)]

    def init(self, st, Fv, ctx):
        pass

    def run(self, st, X, G, Fv, d, active, bval, max_iter_ls, ctx):
        from optimization_solvers_tpu.linesearch.dcsrch import _dcstep

        ws = st[0]
        dtype, T = ctx.dtype, ctx.T
        c2 = jnp.asarray(self.c2, dtype)

        f0 = Fv
        ginit = ctx.sum(G * d)
        gtest = self.c1 * ginit

        stpmax_g = jnp.full((1, T), self.stp_max, dtype)
        if self.bounded:
            stpmax_g = jnp.minimum(stpmax_g, ctx.max_feasible_step(X, d))
        stpmin_g = jnp.full((1, T), self.stp_min, dtype)

        stp0 = jnp.clip(jnp.ones((1, T), dtype), stpmin_g, stpmax_g)
        descent = ginit < 0.0
        stp0 = jnp.where(descent, stp0, jnp.zeros((1, T), dtype))
        width0 = stpmax_g - stpmin_g

        ws[0] = stp0[0]
        ws[1] = jnp.zeros((T,), dtype)           # stx
        ws[2] = f0[0]                            # fx
        ws[3] = ginit[0]                         # dx
        ws[4] = jnp.zeros((T,), dtype)           # sty
        ws[5] = f0[0]                            # fy
        ws[6] = ginit[0]                         # dy
        ws[7] = jnp.zeros((T,), dtype)           # brackt (0/1)
        ws[8] = jnp.ones((T,), dtype)            # stage1 (0/1)
        ws[9] = width0[0]
        ws[10] = (width0 / 0.5)[0]
        ws[11] = jnp.zeros((T,), dtype)          # stmin
        ws[12] = (stp0 + self.xtrapu * stp0)[0]  # stmax
        # MINPACK 'INITIAL G >= 0' guard: non-descent lanes exit with t=0
        ws[13] = ((~active) | ~descent)[0].astype(dtype)
        ws[14] = stpmax_g[0]

        def phi(t):
            f_t, g_t = ctx.bvg(X + t * d)
            return f_t, ctx.sum(g_t * d)

        def cond(s):
            i, n_go = s
            return (i < max_iter_ls) & (n_go > 0)

        def body(s):
            i, _ = s
            stp = ws[0][None, :]
            stx = ws[1][None, :]
            fx = ws[2][None, :]
            dx = ws[3][None, :]
            sty = ws[4][None, :]
            fy = ws[5][None, :]
            dy = ws[6][None, :]
            brackt = ws[7][None, :] > 0
            stage1 = ws[8][None, :] > 0
            width = ws[9][None, :]
            width1 = ws[10][None, :]
            stmin = ws[11][None, :]
            stmax = ws[12][None, :]
            done = ws[13][None, :] > 0
            smax_g = ws[14][None, :]

            f, g = phi(stp)
            ftest = f0 + stp * gtest

            stage1_n = stage1 & ~((f <= ftest) & (g >= 0.0))

            wolfe = (f <= ftest) & (jnp.abs(g) <= c2 * (-ginit))
            small = brackt & (stmax - stmin <= self.xtol * stmax)
            at_max = (stp == smax_g) & (f <= ftest) & (g <= gtest)
            at_min = (stp == stpmin_g) & ((f > ftest) | (g >= gtest))
            out_of_interval = brackt & ((stp <= stmin) | (stp >= stmax))
            finish = wolfe | small | at_max | at_min | out_of_interval

            use_mod = stage1_n & (f <= fx) & (f > ftest)
            fm = jnp.where(use_mod, f - stp * gtest, f)
            fxm = jnp.where(use_mod, fx - stx * gtest, fx)
            fym = jnp.where(use_mod, fy - sty * gtest, fy)
            gm = jnp.where(use_mod, g - gtest, g)
            gxm = jnp.where(use_mod, dx - gtest, dx)
            gym = jnp.where(use_mod, dy - gtest, dy)

            stx_n, fx_n, dx_n, sty_n, fy_n, dy_n, stp_n, brackt_n = _dcstep(
                stx, fxm, gxm, sty, fym, gym, stp, fm, gm,
                brackt, stmin, stmax)

            fx_n = jnp.where(use_mod, fx_n + stx_n * gtest, fx_n)
            fy_n = jnp.where(use_mod, fy_n + sty_n * gtest, fy_n)
            dx_n = jnp.where(use_mod, dx_n + gtest, dx_n)
            dy_n = jnp.where(use_mod, dy_n + gtest, dy_n)

            bisect = brackt_n & (jnp.abs(sty_n - stx_n) >= 0.66 * width1)
            stp_n = jnp.where(bisect, stx_n + 0.5 * (sty_n - stx_n), stp_n)
            width1_n = jnp.where(brackt_n, width, width1)
            width_n = jnp.where(brackt_n, jnp.abs(sty_n - stx_n), width)

            stmin_n = jnp.where(brackt_n, jnp.fmin(stx_n, sty_n),
                                stp_n + self.xtrapl * (stp_n - stx_n))
            stmax_n = jnp.where(brackt_n, jnp.fmax(stx_n, sty_n),
                                stp_n + self.xtrapu * (stp_n - stx_n))
            stp_n = jnp.clip(stp_n, stpmin_g, smax_g)

            give_up = (brackt_n & ((stp_n <= stmin_n)
                                   | (stp_n >= stmax_n))) | (
                brackt_n & (stmax_n - stmin_n <= self.xtol * stmax_n))
            stp_n = jnp.where(give_up, stx_n, stp_n)

            frozen = done | finish
            ws[0] = jnp.where(frozen, stp, stp_n)[0]
            ws[1] = jnp.where(frozen, stx, stx_n)[0]
            ws[2] = jnp.where(frozen, fx, fx_n)[0]
            ws[3] = jnp.where(frozen, dx, dx_n)[0]
            ws[4] = jnp.where(frozen, sty, sty_n)[0]
            ws[5] = jnp.where(frozen, fy, fy_n)[0]
            ws[6] = jnp.where(frozen, dy, dy_n)[0]
            # Mosaic: select between float 0/1 encodings, never i1 vectors
            ws[7] = jnp.where(frozen, ws[7][None, :],
                              (brackt | brackt_n).astype(dtype))[0]
            ws[8] = jnp.where(frozen, ws[8][None, :],
                              stage1_n.astype(dtype))[0]
            ws[9] = jnp.where(frozen, width, width_n)[0]
            ws[10] = jnp.where(frozen, width1, width1_n)[0]
            ws[11] = jnp.where(frozen, stmin, stmin_n)[0]
            ws[12] = jnp.where(frozen, stmax, stmax_n)[0]
            ws[13] = frozen[0].astype(dtype)
            n_go = jnp.sum((ws[13] == 0.0).astype(jnp.int32),
                           dtype=jnp.int32)
            return (i + 1, n_go)

        lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
        # exhaustion (never finished) returns the best step found (stx)
        done = ws[13][None, :] > 0
        return jnp.where(done, ws[0][None, :], ws[1][None, :])


class _HZSpec:
    """Hager-Zhang (CG_DESCENT approximate-Wolfe) as a fused tile spec —
    the flattened bracket/bisect/secant state machine of
    ``linesearch/hager_zhang.py`` with per-lane scalars on (1, T) rows;
    one gradient-bearing trial eval per loop trip through ``ctx.bvg``.
    Bounded variant caps the bracketing expansion at the per-coordinate
    max feasible step."""

    _BRACKET, _BISECT, _SECANT = 0.0, 1.0, 2.0

    def __init__(self, search, bounded: bool):
        self.delta = float(search.delta)
        self.sigma = float(search.sigma)
        self.eps = float(search.eps)
        self.theta = float(search.theta)
        self.gamma = float(search.gamma)
        self.rho = float(search.rho)
        self.bounded = bounded

    def scratch(self, n, T, dtype):
        # rows: 0=a 1=da 2=b 3=c 4=mode 5=t_best 6=f_best 7=shrink 8=done
        #       9=t_max
        return [((10, T), dtype)]

    def init(self, st, Fv, ctx):
        pass

    def run(self, st, X, G, Fv, d, active, bval, max_iter_ls, ctx):
        hz = st[0]
        dtype, T = ctx.dtype, ctx.T
        delta = jnp.asarray(self.delta, dtype)
        sigma = jnp.asarray(self.sigma, dtype)
        theta = jnp.asarray(self.theta, dtype)
        gamma = jnp.asarray(self.gamma, dtype)
        rho = jnp.asarray(self.rho, dtype)
        tiny = float(jnp.finfo(dtype).tiny)
        big = float(jnp.finfo(dtype).max)

        if self.bounded:
            t_max = ctx.max_feasible_step(X, d)       # (1, T) min over coords
        else:
            t_max = jnp.full((1, T), jnp.inf, dtype)

        f0 = Fv
        d0 = ctx.sum(G * d)
        f_eps = f0 + self.eps * jnp.abs(f0)

        hz[0] = jnp.zeros((T,), dtype)                # a
        hz[1] = d0[0]                                 # phi'(a)
        hz[2] = jnp.full((T,), big, dtype)            # b
        t1 = jnp.minimum(jnp.ones((1, T), dtype), t_max)
        hz[3] = t1[0]                                 # c (first trial)
        hz[4] = jnp.full((T,), self._BRACKET, dtype)  # mode
        hz[5] = t1[0]                                 # t_best fallback
        hz[6] = jnp.full((T,), big, dtype)            # f_best
        hz[7] = jnp.full((T,), big, dtype)            # shrink_ref
        hz[8] = (~active)[0].astype(dtype)            # done
        hz[9] = t_max[0]

        def cond(s):
            i, n_go = s
            return (i < max_iter_ls) & (n_go > 0)

        def body(s):
            i, _ = s
            a = hz[0][None, :]
            da_ = hz[1][None, :]
            b = hz[2][None, :]
            c = hz[3][None, :]
            mode = hz[4][None, :]
            t_best = hz[5][None, :]
            f_best = hz[6][None, :]
            shrink_ref = hz[7][None, :]
            done = hz[8][None, :] > 0
            t_cap = hz[9][None, :]

            fc, gvec = ctx.bvg(X + c * d)
            dc = ctx.sum(gvec * d)
            wolfe = (fc - f0 <= delta * c * d0) & (dc >= sigma * d0)
            approx = ((dc <= (2.0 * delta - 1.0) * d0)
                      & (dc >= sigma * d0) & (fc <= f_eps))
            ok = wolfe | approx
            ok = ok | ((c >= t_cap) & (dc < 0.0) & (fc <= f_eps))
            better = (fc < f_best) & (c > 0.0)
            t_best = jnp.where(ok, c, jnp.where(better, c, t_best))
            f_best = jnp.where(better, fc, f_best)

            to_secant = dc >= 0.0
            advance = (~to_secant) & (fc <= f_eps)
            to_bisect = (~to_secant) & (fc > f_eps)

            a_new = jnp.where(advance, c, a)
            da_new = jnp.where(advance, dc, da_)
            b_new = jnp.where(to_secant | to_bisect, c, b)

            grow = jnp.minimum(rho * c, t_cap)
            bis = (1.0 - theta) * a_new + theta * b_new
            denom = dc - da_new
            sec = jnp.where(jnp.abs(denom) > tiny,
                            (a_new * dc - c * da_new) / denom, bis)
            width = b_new - a_new
            stalled = width > gamma * shrink_ref
            sec = jnp.where((sec <= a_new) | (sec >= b_new) | stalled,
                            0.5 * (a_new + b_new), sec)
            shrink_new = width

            next_mode = jnp.where(
                to_secant, self._SECANT,
                jnp.where(to_bisect, self._BISECT, mode))
            in_bracket_phase = (mode == self._BRACKET) & advance
            c_new = jnp.where(
                in_bracket_phase, grow,
                jnp.where(next_mode == self._SECANT, sec, bis))

            frozen = done | ok
            hz[0] = jnp.where(frozen, a, a_new)[0]
            hz[1] = jnp.where(frozen, da_, da_new)[0]
            hz[2] = jnp.where(frozen, b, b_new)[0]
            hz[3] = jnp.where(frozen, c, c_new)[0]
            hz[4] = jnp.where(frozen, mode, next_mode)[0]
            hz[5] = t_best[0]
            hz[6] = f_best[0]
            hz[7] = jnp.where(frozen, shrink_ref, shrink_new)[0]
            hz[8] = frozen[0].astype(dtype)
            n_go = jnp.sum((hz[8] == 0.0).astype(jnp.int32),
                           dtype=jnp.int32)
            return (i + 1, n_go)

        lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
        return hz[5][None, :]


# ---------------------------------------------------------------------------
# Spec dispatch
# ---------------------------------------------------------------------------


def _build_specs(method, line_search):
    """Map public solver/search config objects to tile-level specs; returns
    ``None`` if the combo has no fused form (caller falls back)."""
    from optimization_solvers_tpu import linesearch as ls
    from optimization_solvers_tpu.solvers import (
        newton, nonlinear_cg, quasi_newton, steepest)

    from optimization_solvers_tpu.solvers import lbfgs as lbfgs_mod

    mspec = None
    if isinstance(method, lbfgs_mod.LBFGS):
        mspec = _LBFGSSpec(method)
    elif isinstance(method, quasi_newton.QuasiNewtonB):
        mspec = _QNBSpec(method)
    elif isinstance(method, quasi_newton.QuasiNewton):
        mspec = _QNSpec(method)
    elif isinstance(method, newton.SpectralProjectedNewton):
        mspec = _SPNSpec(method)
    elif isinstance(method, newton.ProjectedNewton):
        mspec = _PNSpec(method)
    elif isinstance(method, newton.Newton):
        mspec = _NewtonSpec(method)
    elif isinstance(method, steepest.SpectralProjectedGradient):
        mspec = _SPGSpec(method)
    elif isinstance(method, steepest.ProjectedGradientDescent):
        mspec = _PGDSpec(method)
    elif isinstance(method, steepest.GradientDescent):
        mspec = _GDSpec(method)
    elif isinstance(method, steepest.CoordinateDescent):
        mspec = _CDSpec(method)
    elif isinstance(method, steepest.PnormDescent):
        if method.inverse_p is None:
            return None
        mspec = _PnormSpec(method)
    elif isinstance(method, nonlinear_cg.NonlinearCG):
        mspec = _NCGSpec(method)
    if mspec is None:
        return None

    if isinstance(line_search, ls.BackTrackingB):
        lspec = _BTSpec(line_search, bounded=True)
    elif isinstance(line_search, ls.BackTracking):
        lspec = _BTSpec(line_search, bounded=False)
    elif isinstance(line_search, ls.GLLQuadratic):
        lspec = _GLLSpec(line_search)
    elif isinstance(line_search, ls.MoreThuenteB):
        if line_search.reference_quirks:
            return None   # bug-for-bug mode stays on the XLA path
        lspec = _MTSpec(line_search, bounded=True)
    elif isinstance(line_search, ls.MoreThuente):
        if line_search.reference_quirks:
            return None
        lspec = _MTSpec(line_search, bounded=False)
    elif isinstance(line_search, ls.HagerZhangB):
        lspec = _HZSpec(line_search, bounded=True)
    elif isinstance(line_search, ls.HagerZhang):
        lspec = _HZSpec(line_search, bounded=False)
    elif isinstance(line_search, ls.StrongWolfe):
        lspec = _DcsrchSpec(line_search)
    elif isinstance(line_search, ls.NoSearch):
        lspec = _NoSearchSpec()
    else:
        return None
    if getattr(lspec, "bounded", False) and not mspec.bounded:
        return None  # BackTrackingB needs bounds
    return mspec, lspec


def fused_supported(method, line_search) -> bool:
    """True if (method, line_search) has a fused whole-solve kernel here."""
    return _build_specs(method, line_search) is not None


# ---------------------------------------------------------------------------
# Kernel skeleton + host wrapper
# ---------------------------------------------------------------------------


def _make_kernel(f, const_1d, n_mconsts, mspec, lspec, n, T, max_iter,
                 max_iter_ls, dtype, bounded):
    n_consts = len(const_1d)

    def kernel(x0_ref, *rest):
        i = 0
        lo_ref = up_ref = None
        if bounded:
            lo_ref, up_ref = rest[0], rest[1]
            i = 2
        const_refs = rest[i:i + n_consts]
        i += n_consts
        mconst_refs = rest[i:i + n_mconsts]
        i += n_mconsts
        x_out, f_out, it_out, st_out = rest[i:i + 4]
        i += 4
        X, G, Fv, iters, actm = rest[i:i + 5]
        i += 5
        n_ls = len(lspec.scratch(n, T, dtype))
        ls_refs = list(rest[i:i + n_ls])
        i += n_ls
        m_refs = list(rest[i:])

        cvals, caxes = _load_consts(const_refs, const_1d, T)
        bvg = _batched_value_and_grad(f, cvals, caxes)
        bval = _batched_value(f, cvals, caxes)

        # the round-1 "replicated-layout accumulator" lowering failure that
        # forced halving-tree reductions came from LANE-resident consts.
        # With 1-D consts shipped (k, 1) (sublane-resident, _pack_consts)
        # plain reductions DO lower and run again — but a round-4 probe
        # measured their Mosaic compile at ~10x the tree's (~2-3 min vs
        # ~13 s per consts combo through the remote-compile tunnel), for
        # no measurable runtime difference, so the tree stays for every
        # consts-bearing kernel
        ctx = _Ctx(n, T, dtype,
                   lo_ref[0] if bounded else None,
                   up_ref[0] if bounded else None,
                   safe_reduce=(n_consts + n_mconsts) > 0)
        ctx.method_consts = [r[...] for r in mconst_refs]
        ctx.bvg = bvg   # (n, T) -> ((1, T), (n, T)); Wolfe-family searches
                        # need trial-point gradients, not just values
        if getattr(mspec, "needs_hessian", False):
            ctx.bhess = _batched_hessian(f, cvals, caxes)

        X[...] = ctx.clip(x0_ref[0]) if mspec.bounded else x0_ref[0]
        fv, gv = bvg(X[...])
        Fv[...] = fv
        G[...] = gv
        iters[...] = jnp.zeros((1, T), jnp.int32)
        mspec.init(m_refs, X, G, Fv, ctx)
        lspec.init(ls_refs, Fv, ctx)

        def active_mask():
            return (jnp.isfinite(Fv[...])
                    & ~mspec.converged(m_refs, X[...], G[...], Fv[...], ctx))

        # end-of-body mask == next trip's entry mask (state only changes
        # inside the body): cache it in a scratch row instead of
        # re-evaluating the (possibly pg-norm-bearing) convergence test at
        # body entry
        def store_active():
            mask = active_mask()
            actm[...] = mask.astype(dtype)
            return jnp.sum(mask.astype(jnp.int32)) > 0

        def body(carry):
            i_, _go = carry
            active = actm[...] > 0.5

            d = mspec.direction(m_refs, X[...], G[...], Fv[...], active, ctx)
            t = lspec.run(ls_refs, X[...], G[...], Fv[...], d, active, bval,
                          max_iter_ls, ctx)

            X_new = X[...] + t * d
            if mspec.bounded:
                # d is a box-feasible direction (projection arithmetic), so
                # this clip is an exactness guard, not a semantic change
                X_new = ctx.clip(X_new)
            f_new, g_new = bvg(X_new)

            X_old = X[...]
            G_old = G[...]
            F_old = Fv[...]
            X[...] = jnp.where(active, X_new, X[...])
            Fv[...] = jnp.where(active, f_new, Fv[...])
            G[...] = jnp.where(active, g_new, G[...])
            mspec.post_step(m_refs, active, d, t, X_old, G_old, F_old,
                            X[...], G[...], Fv[...], ctx)
            iters[...] = iters[...] + active.astype(jnp.int32)

            return (i_ + 1, store_active())

        lax.while_loop(lambda c: (c[0] < max_iter) & c[1], body,
                       (jnp.int32(0), store_active()))

        finite = jnp.isfinite(Fv[...])
        conv = mspec.converged(m_refs, X[...], G[...], Fv[...], ctx)
        # precedence matches the unfused driver (_result) except the
        # documented converged-at-budget deviation: non-converged lanes at
        # the budget report MAX_ITER_REACHED even if non-finite
        status = jnp.where(
            conv & finite, jnp.int32(Status.CONVERGED),
            jnp.where(iters[...] >= max_iter,
                      jnp.int32(Status.MAX_ITER_REACHED),
                      jnp.where(~finite, jnp.int32(Status.OUT_OF_DOMAIN),
                                jnp.int32(Status.MAX_ITER_REACHED))),
        )
        x_out[0] = X[...]
        f_out[...] = Fv[...]
        it_out[...] = iters[...]
        st_out[...] = status

    return kernel


def _pallas_solve(f, x0, lower, upper, consts, mspec, lspec, max_iter,
                  max_iter_ls, tile, interpret, vmem_limit_bytes):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = x0.shape
    dtype = x0.dtype
    T = tile
    bounded = mspec.bounded
    mconsts = tuple(jnp.asarray(c, dtype) for c in mspec.const_arrays())

    xT = x0.T.reshape(1, n, B)
    inputs = [xT]
    in_specs = [pl.BlockSpec((1, n, T), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM)]
    if bounded:
        # bounds: shared (n,) replicated across lanes, or PER-LANE (B, n)
        # boxes (round 4) — the kernel body sees an (n, T) block either way
        if jnp.ndim(lower) == 2:
            loT = jnp.asarray(lower, dtype).T.reshape(1, n, B)
            upT = jnp.asarray(upper, dtype).T.reshape(1, n, B)
            bspec = pl.BlockSpec((1, n, T), lambda b: (0, 0, b),
                                 memory_space=pltpu.VMEM)
        else:
            loT = jnp.broadcast_to(
                jnp.asarray(lower, dtype)[:, None], (n, T)).reshape(1, n, T)
            upT = jnp.broadcast_to(
                jnp.asarray(upper, dtype)[:, None], (n, T)).reshape(1, n, T)
            bspec = pl.BlockSpec((1, n, T), lambda b: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        inputs += [loT, upT]
        in_specs += [bspec, bspec]
    consts_p, const_1d = _pack_consts(consts)
    for c in consts_p + mconsts:
        inputs.append(c)
        in_specs.append(
            pl.BlockSpec(c.shape, lambda b, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM))

    kernel = _make_kernel(
        f, const_1d, len(mconsts), mspec, lspec, n, T, max_iter,
        max_iter_ls, dtype, bounded,
    )
    scratch = [
        pltpu.VMEM((n, T), dtype),       # X
        pltpu.VMEM((n, T), dtype),       # G
        pltpu.VMEM((1, T), dtype),       # Fv
        pltpu.VMEM((1, T), jnp.int32),   # iters
        pltpu.VMEM((1, T), dtype),       # actm (cached active mask)
    ]
    scratch += [pltpu.VMEM(shape, dt)
                for shape, dt in lspec.scratch(n, T, dtype)]
    scratch += [pltpu.VMEM(shape, dt)
                for shape, dt in mspec.scratch(n, T, dtype)]

    extra = {}
    if vmem_limit_bytes is not None and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes)

    x_out, f_out, it_out, st_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
        grid=(B // T,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, n, T), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda b: (0, b), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **extra,
    )(*inputs)
    return x_out[0].T, f_out[0], it_out[0], st_out[0]


@functools.partial(
    jax.jit,
    static_argnames=("method", "line_search", "f", "max_iter", "max_iter_ls",
                     "tile", "interpret", "vmem_limit_bytes"),
)
def fused_minimize(
    method,
    line_search,
    f: Callable,
    x0: jax.Array,                 # (B, n)
    lower: jax.Array = None,       # (n,) shared or (B, n) per-lane;
                                   # bounded methods only
    upper: jax.Array = None,
    consts: tuple = (),            # problem-data arrays: f(x, *consts)
    *,
    max_iter: int = 1000,
    max_iter_ls: int = 32,
    tile: int = 256,
    interpret: bool = False,
    vmem_limit_bytes: int = None,
) -> SolveResult:
    """Batched whole-solve fused kernel for (method, line_search).

    ``method`` / ``line_search`` are the SAME public config objects the
    unfused :func:`solvers.minimize` takes (they are frozen dataclasses,
    hence valid static args).  ``B`` is padded up to a multiple of ``tile``
    internally.  Raises ``ValueError`` for unsupported combos — check with
    :func:`fused_supported` first.
    """
    specs = _build_specs(method, line_search)
    if specs is None:
        raise ValueError(
            f"no fused kernel for ({type(method).__name__}, "
            f"{type(line_search).__name__})")
    mspec, lspec = specs
    if mspec.bounded and (lower is None or upper is None):
        raise ValueError(f"{type(method).__name__} requires bounds")

    B, n = x0.shape
    if hasattr(mspec, "preferred_tile"):
        tile = mspec.preferred_tile(n, tile)
    if hasattr(mspec, "vmem_limit"):
        vmem_limit_bytes = mspec.vmem_limit(n, tile, vmem_limit_bytes)
    pad = (-B) % tile
    if pad:
        x0 = jnp.concatenate([x0, jnp.broadcast_to(x0[:1], (pad, n))], axis=0)
        if lower is not None and jnp.ndim(lower) == 2:
            # per-lane boxes pad with their row 0 alongside x0
            lower = jnp.concatenate(
                [lower, jnp.broadcast_to(lower[:1], (pad, n))], axis=0)
            upper = jnp.concatenate(
                [upper, jnp.broadcast_to(upper[:1], (pad, n))], axis=0)

    x_fin, f_fin, it_fin, st_fin = _pallas_solve(
        f, x0, lower, upper, tuple(consts), mspec, lspec, max_iter,
        max_iter_ls, tile, interpret, vmem_limit_bytes,
    )
    if pad:
        x_fin, f_fin = x_fin[:B], f_fin[:B]
        it_fin, st_fin = it_fin[:B], st_fin[:B]
        if lower is not None and jnp.ndim(lower) == 2:
            lower, upper = lower[:B], upper[:B]   # un-pad per-lane boxes
    f_host = (lambda x: f(x, *consts)) if consts else f
    _, g_fin = jax.vmap(jax.value_and_grad(f_host))(x_fin)
    pg = batched_pg_inf_norm(x_fin, g_fin, lower, upper)
    # STALLED re-label (quasi-Newton s/y-stall at a non-KKT exit) happens
    # HERE rather than in-kernel: it is a pure function of the exit point,
    # which the host side already has — same helper as the unfused driver
    from optimization_solvers_tpu.solvers.driver import apply_stall_status

    bounds = None if lower is None else (lower, upper)
    st_fin = apply_stall_status(st_fin, method, x_fin, f_fin, g_fin, pg,
                                bounds)
    return SolveResult(x_fin, f_fin, g_fin, it_fin, st_fin, pg_norm=pg)
