"""Fused Pallas TPU kernel: batched box-constrained **truncated Newton-CG**
solves, whole solves resident in VMEM.

Why this exists (VERDICT round-1 item 10, the iteration-count lever): the
~520 lockstep iterations limited-memory quasi-Newton needs on the
Rosenbrock-100 headline are algorithm-intrinsic (BENCH_NOTES "Known
costs") — the next multiple lives in a second-order method.  A truncated
Newton step costs a handful of Hessian-vector products (each ~2 gradient
evaluations via forward-over-reverse AD, traced straight into the kernel)
and needs NO (n, n) storage, so it fits the same (n, T) lane-last VMEM
layout as the L-BFGS kernels while converging in far fewer outer
iterations.

Algorithm (batched, lockstep, per-lane masked):
  * outer loop: projected-gradient stopping test (pgtol) + relative
    f-decrease stall test (factr, dtype-relative — the reference's
    ``setulb_`` semantics, quasi_newton/lbfgsb.rs:139-145);
  * two-metric projection (Bertsekas): coordinates epsilon-active at a
    bound take the steepest-descent direction, free coordinates take the
    CG-approximate Newton direction, so active sets can both grow and
    shrink without (n, n) work;
  * inner CG on the free subspace with the Steihaug negative-curvature
    exit and the Eisenstat-Walker forcing term
    ``||r|| <= min(0.5, sqrt(||g||)) ||g||`` (superlinear local
    convergence without exact solves);
  * projected backtracking Armijo line search on ``P(x + t d)``.

Mosaic rules are as in :mod:`pallas_lbfgs` (scalar-only loop carries,
evolving vectors in VMEM scratch, lane-last layout).  The CG loop carries
only (i, n_still_running); r/p/d live in scratch and per-lane CG scalars
ride (1, T) rows of a small scratch tile.

Reference seams mirrored: stopping/status semantics match
``solvers/lbfgsb.py``; the direction logic is the TPU-native counterpart
of the reference's Newton family (newton/projected_newton.rs:64-80)
generalized to matrix-free form.
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


def _batched_hvp(f: Callable, cvals=(), caxes=()):
    """((n, T), (n, T)) -> (n, T) Hessian-vector product over the lane
    axis: forward-over-reverse, ~2 gradient evaluations per call.
    ``cvals``/``caxes`` as in ``_batched_value_and_grad``."""

    def hvp(x, v, *cs):
        return jax.jvp(lambda xx: jax.grad(f)(xx, *cs), (x,), (v,))[1]

    bh = jax.vmap(hvp, in_axes=(1, 1, *caxes), out_axes=1)
    return lambda X, V: bh(X, V, *cvals)


def _make_kernel(f, const_1d, n, T, pgtol, factr, max_iter, cg_max,
                 max_iter_ls, c1, dtype):
    # must match the XLA twin (solvers/newton_cg.py) exactly: both sides
    # gate Steihaug curvature and the factr stall test on finfo(dtype).eps
    eps_mach = float(jnp.finfo(dtype).eps)
    f_rtol = factr * eps_mach
    inf = float("inf")

    def kernel(x0_ref, lo_ref, up_ref, *rest):
        n_consts = len(const_1d)
        const_refs = rest[:n_consts]
        (x_out, f_out, it_out, st_out,
         X, G, Fv, Fprev, D, R, P, sc, iters, ls_t, ls_done) = \
            rest[n_consts:]
        cvals, caxes = _load_consts(const_refs, const_1d, T)
        bvg = _batched_value_and_grad(f, cvals, caxes)
        bval = _batched_value(f, cvals, caxes)
        bhvp = _batched_hvp(f, cvals, caxes)
        lo = lo_ref[0]                                            # (n, T)
        up = up_ref[0]

        X[...] = jnp.clip(x0_ref[0], lo, up)
        fv, gv = bvg(X[...])
        Fv[...] = fv
        Fprev[...] = jnp.full((1, T), jnp.inf, dtype)
        G[...] = gv
        iters[...] = jnp.zeros((1, T), jnp.int32)

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
            return jnp.isfinite(Fv[...]) & ~done

        def cg_direction(active):
            """Truncated CG on the free subspace into D; returns the
            (n, T) free-coordinate mask used."""
            g = G[...]
            pgn = pg_inf_norm()                                   # (1, T)
            # epsilon-active bound coordinates (two-metric projection):
            # within w of their bound with the gradient pushing outward
            w = jnp.minimum(pgn, 1e-2)
            bound_act = ((X[...] - lo <= w) & (g > 0.0)) | (
                (up - X[...] <= w) & (g < 0.0)
            )
            freem = (~bound_act).astype(dtype)                    # (n, T)

            gF = g * freem
            gn2 = jnp.sum(gF * gF, axis=0, keepdims=True)         # (1, T)
            gn = jnp.sqrt(gn2)
            # Eisenstat-Walker forcing: ||r|| <= eta ||g||,
            # eta = min(0.5, sqrt(||g||))
            eta = jnp.minimum(jnp.sqrt(jnp.maximum(gn, 0.0)),
                              jnp.full((1, T), 0.5, dtype))
            rtol2 = (eta * gn) ** 2

            D[...] = jnp.zeros((n, T), dtype)
            R[...] = gF                       # residual of H d = -g at d=0
            P[...] = -gF
            # sc rows: 0 = rr, 1 = rtol2, 2 = cg_done, 3 = steps taken
            sc[0] = gn2[0]
            sc[1] = rtol2[0]
            sc[2] = (~active | (gn2 <= rtol2))[0].astype(dtype)
            sc[3] = jnp.zeros((T,), dtype)

            def cond(s):
                i, n_go = s
                return (i < cg_max) & (n_go > 0)

            def body(s):
                i, _ = s
                done = sc[2][None, :] > 0                         # (1, T)
                rr = sc[0][None, :]
                p = P[...]
                q = bhvp(X[...], p * freem) * freem
                pq = jnp.sum(p * q, axis=0, keepdims=True)
                pp = jnp.sum(p * p, axis=0, keepdims=True)
                # Steihaug: stop on non-positive curvature; if no step has
                # been taken yet fall back to steepest descent (-gF)
                negc = pq <= eps_mach * pp
                first = sc[3][None, :] == 0.0
                D[...] = jnp.where(
                    ~done & negc & first, -gF, D[...]
                )
                newly_done = ~done & negc
                step = ~done & ~negc
                alpha = jnp.where(step, rr / jnp.where(negc, 1.0, pq), 0.0)
                D[...] = D[...] + alpha * p
                R[...] = R[...] + alpha * q
                rr_new = jnp.sum(R[...] * R[...], axis=0, keepdims=True)
                hit_tol = step & (rr_new <= sc[1][None, :])
                beta = jnp.where(step, rr_new / jnp.maximum(rr, eps_mach),
                                 0.0)
                P[...] = jnp.where(step, -R[...] + beta * p, p)
                sc[0] = jnp.where(step, rr_new, rr)[0]
                sc[2] = (done | newly_done | hit_tol)[0].astype(dtype)
                sc[3] = sc[3] + step[0].astype(dtype)
                n_go = jnp.sum((sc[2] == 0.0).astype(jnp.int32),
                               dtype=jnp.int32)
                return (i + 1, n_go)

            lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

            # epsilon-active coordinates move along -g (they may leave the
            # bound); CG never touched them
            D[...] = jnp.where(freem > 0, D[...], -g)
            # safeguard: a zero direction with pg not converged (all-active
            # degenerate lane) falls back to the projected gradient
            dn = jnp.sum(D[...] * D[...], axis=0, keepdims=True)
            D[...] = jnp.where(dn > 0.0, D[...], -g)
            return freem

        def line_search(active):
            """Projected backtracking Armijo on P(x + t d): sufficient
            decrease measured against g . (P(x + t d) - x) (the bounded
            backtracking model, line_search/backtracking_b.rs:24-50)."""
            f0 = Fv[...]
            ls_t[...] = jnp.ones((1, T), dtype)
            ls_done[...] = (~active).astype(jnp.int32)

            def cond(s):
                i, n_active = s
                return (i < max_iter_ls) & (n_active > 0)

            def body(s):
                i, _ = s
                t = ls_t[...]
                done = ls_done[...] > 0
                xt = jnp.clip(X[...] + t * D[...], lo, up)
                fv_t = bval(xt)
                gstep = jnp.sum(G[...] * (xt - X[...]), axis=0,
                                keepdims=True)
                ok = (fv_t <= f0 + c1 * gstep) & jnp.isfinite(fv_t)
                keep = done | ok
                ls_t[...] = jnp.where(keep, t, t * 0.5)
                ls_done[...] = keep.astype(jnp.int32)
                return (i + 1,
                        jnp.sum((~keep).astype(jnp.int32), dtype=jnp.int32))

            lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
            return ls_t[...]

        def body(carry):
            i, _go = carry
            active = active_mask()
            cg_direction(active)
            t = line_search(active)
            X_new = jnp.clip(X[...] + t * D[...], lo, up)
            f_new, g_new = bvg(X_new)
            ok = (
                jnp.isfinite(f_new)
                & jnp.all(jnp.isfinite(X_new), axis=0, keepdims=True)
            )
            upd = active & ok
            Fprev[...] = jnp.where(upd, Fv[...], Fprev[...])
            X[...] = jnp.where(upd, X_new, X[...])
            Fv[...] = jnp.where(upd, f_new, Fv[...])
            G[...] = jnp.where(upd, g_new, G[...])
            iters[...] = iters[...] + active.astype(jnp.int32)
            go = jnp.sum(active_mask().astype(jnp.int32)) > 0
            return (i + 1, go)

        def cond(carry):
            i, go = carry
            return (i < max_iter) & go

        lax.while_loop(cond, body, (jnp.int32(0), jnp.asarray(True)))

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
            conv & finite,
            jnp.int32(Status.CONVERGED),
            jnp.where(~finite, jnp.int32(Status.OUT_OF_DOMAIN),
                      jnp.int32(Status.MAX_ITER_REACHED)),
        )
        x_out[0] = X[...]
        f_out[...] = Fv[...]
        it_out[...] = iters[...]
        st_out[...] = status

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "f", "pgtol", "factr", "max_iter", "cg_max", "max_iter_ls", "tile",
        "c1", "interpret", "vmem_limit_bytes",
    ),
)
def newton_cg_solve_fused(
    f: Callable,
    x0: jax.Array,                  # (B, n)
    lower: jax.Array,               # (n,)
    upper: jax.Array,               # (n,)
    consts: tuple = (),             # problem-data arrays: f(x, *consts)
    *,
    pgtol: float = 1e-5,
    factr: float = 1e7,
    max_iter: int = 200,
    cg_max: int = 32,
    max_iter_ls: int = 25,
    tile: int = 256,
    c1: float = 1e-4,
    interpret: bool = False,
    vmem_limit_bytes: int = None,
) -> SolveResult:
    """Batched box-constrained truncated Newton-CG with the fused kernel.

    ``B`` is padded up to a multiple of ``tile`` internally.  ``cg_max`` bounds the inner CG
    iterations per Newton step (each costs one Hessian-vector product,
    ~2 gradient evaluations).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = x0.shape
    dtype = x0.dtype
    # pad the batch up to a tile multiple (same contract as fused_minimize:
    # any B is accepted; pad lanes replicate lane 0 and are dropped below)
    pad = (-B) % tile
    if pad:
        x0 = jnp.concatenate([x0, jnp.broadcast_to(x0[:1], (pad, n))], axis=0)
    Bp = B + pad
    T = tile

    xT = x0.T.reshape(1, n, Bp)
    loT = jnp.broadcast_to(lower.astype(dtype)[:, None], (n, T)).reshape(1, n, T)
    upT = jnp.broadcast_to(upper.astype(dtype)[:, None], (n, T)).reshape(1, n, T)

    consts_p, const_1d = _pack_consts(consts)
    kernel = _make_kernel(
        f, const_1d, n, T, pgtol, factr, max_iter, cg_max, max_iter_ls,
        c1, dtype
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
        pltpu.VMEM((n, T), dtype),       # D  (search direction / CG iterate)
        pltpu.VMEM((n, T), dtype),       # R  (CG residual)
        pltpu.VMEM((n, T), dtype),       # P  (CG conjugate direction)
        pltpu.VMEM((4, T), dtype),       # sc (rr, rtol2, cg_done, steps)
        pltpu.VMEM((1, T), jnp.int32),   # iters
        pltpu.VMEM((1, T), dtype),       # ls_t
        pltpu.VMEM((1, T), jnp.int32),   # ls_done
    ]
    x_out, f_out, it_out, st_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ),
        grid=(Bp // T,),
        in_specs=[
            pl.BlockSpec((1, n, T), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, T), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, T), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
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

    x_final = x_out[0].T[:B]
    f_host = (lambda x: f(x, *consts)) if consts else f
    _, g_final = jax.vmap(jax.value_and_grad(f_host))(x_final)
    return SolveResult(
        x_final, f_out[0][:B], g_final, it_out[0][:B], st_out[0][:B],
        pg_norm=batched_pg_inf_norm(x_final, g_final, lower, upper))
