"""Fused Pallas TPU kernel: batched Spectral Projected Gradient solves
(BASELINE config 3: box-constrained batches at fused-kernel speed).

SPG (Birgin-Martinez-Raydan; reference ``steepest_descent/spg.rs``) needs
no curvature history — per iteration: project the Barzilai-Borwein-scaled
gradient step onto the box, run the GLL non-monotone Armijo search, update
the safeguarded BB scalar.  That makes this the lightest member of the
fused-kernel family: per-lane state is x, g, f, the (gll_m, T) objective
history ring, and the BB scalar.

Same Mosaic structure as :mod:`pallas_lbfgs` (lane-last layout, scalar-only
loop carries, scratch-resident state).
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


def _make_kernel(f, const_1d, n, T, tol, lam_min, lam_max, gll_m, c1,
                 max_iter, max_iter_ls, dtype):
    def kernel(x0_ref, lo_ref, up_ref, *rest):
        n_consts = len(const_1d)
        const_refs = rest[:n_consts]
        (x_out, f_out, it_out, st_out,
         X, G, Fv, lam, fhist, iters, ls_t, ls_done) = rest[n_consts:]
        cvals, caxes = _load_consts(const_refs, const_1d, T)
        bvg = _batched_value_and_grad(f, cvals, caxes)
        bval = _batched_value(f, cvals, caxes)
        lo = lo_ref[0]
        up = up_ref[0]

        X[...] = jnp.clip(x0_ref[0], lo, up)
        fv, gv = bvg(X[...])
        Fv[...] = fv
        G[...] = gv
        # lambda_0 = clamp(1 / ||P(x0 - g0) - x0||_inf)  (spg.rs:39-46)
        d0 = jnp.clip(X[...] - G[...], lo, up) - X[...]
        l0 = 1.0 / jnp.max(jnp.abs(d0), axis=0, keepdims=True)
        lam[...] = jnp.clip(l0, lam_min, lam_max)
        fhist[...] = jnp.full((gll_m, T), -jnp.inf, dtype)
        iters[...] = jnp.zeros((1, T), jnp.int32)

        def pg_norm():
            pg = X[...] - jnp.clip(X[...] - G[...], lo, up)
            return jnp.max(jnp.abs(pg), axis=0, keepdims=True)

        def active_mask():
            return jnp.isfinite(Fv[...]) & ~(pg_norm() < tol)

        def body(carry):
            i, _go = carry
            active = active_mask()

            d = jnp.clip(X[...] - lam[...] * G[...], lo, up) - X[...]

            # GLL non-monotone Armijo: history ring shift + append
            for p in range(gll_m - 1):
                fhist[p] = fhist[p + 1]
            fhist[gll_m - 1] = Fv[0]
            f_max = jnp.max(fhist[...], axis=0, keepdims=True)
            g0d = jnp.sum(G[...] * d, axis=0, keepdims=True)

            ls_t[...] = jnp.ones((1, T), dtype)
            ls_done[...] = (~active).astype(jnp.int32)

            def ls_cond(s):
                j, n_act = s
                return (j < max_iter_ls) & (n_act > 0)

            def ls_body(s):
                j, _ = s
                t = ls_t[...]
                done = ls_done[...] > 0
                fv_t = bval(X[...] + t * d)
                ok = (fv_t <= f_max + c1 * t * g0d) & jnp.isfinite(fv_t)
                keep = done | ok
                ls_t[...] = jnp.where(keep, t, t * 0.5)
                ls_done[...] = keep.astype(jnp.int32)
                return (j + 1,
                        jnp.sum((~keep).astype(jnp.int32), dtype=jnp.int32))

            lax.while_loop(ls_cond, ls_body, (jnp.int32(0), jnp.int32(1)))
            t = ls_t[...]

            X_new = X[...] + t * d
            f_new, g_new = bvg(X_new)

            # safeguarded BB scalar (spg.rs:134-143)
            s_vec = X_new - X[...]
            y_vec = g_new - G[...]
            sy = jnp.sum(s_vec * y_vec, axis=0, keepdims=True)
            ss = jnp.sum(s_vec * s_vec, axis=0, keepdims=True)
            lam_bb = jnp.clip(ss / sy, lam_min, lam_max)
            lam_new = jnp.where(sy <= 0.0, jnp.full((1, T), lam_max, dtype),
                                lam_bb)
            lam[...] = jnp.where(active, lam_new, lam[...])

            X[...] = jnp.where(active, X_new, X[...])
            Fv[...] = jnp.where(active, f_new, Fv[...])
            G[...] = jnp.where(active, g_new, G[...])
            iters[...] = iters[...] + active.astype(jnp.int32)

            go = jnp.sum(active_mask().astype(jnp.int32)) > 0
            return (i + 1, go)

        lax.while_loop(lambda c: (c[0] < max_iter) & c[1], body,
                       (jnp.int32(0), jnp.asarray(True)))

        finite = jnp.isfinite(Fv[...])
        conv = pg_norm() < tol
        status = jnp.where(
            conv & finite, jnp.int32(Status.CONVERGED),
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
    static_argnames=("f", "tol", "lam_min", "lam_max", "gll_m", "c1",
                     "max_iter", "max_iter_ls", "tile", "interpret"),
)
def spg_solve_fused(
    f: Callable,
    x0: jax.Array,                  # (B, n)
    lower: jax.Array,               # (n,)
    upper: jax.Array,               # (n,)
    consts: tuple = (),             # problem-data arrays: f(x, *consts)
    *,
    tol: float = 1e-5,
    lam_min: float = 1e-3,
    lam_max: float = 1e3,
    gll_m: int = 10,
    c1: float = 1e-4,
    max_iter: int = 1000,
    max_iter_ls: int = 24,
    tile: int = 256,
    interpret: bool = False,
) -> SolveResult:
    """Batched box-constrained SPG with the fused kernel.  ``B`` must be a
    multiple of ``tile``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = x0.shape
    assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
    dtype = x0.dtype
    T = tile

    xT = x0.T.reshape(1, n, B)
    loT = jnp.broadcast_to(lower.astype(dtype)[:, None], (n, T)).reshape(1, n, T)
    upT = jnp.broadcast_to(upper.astype(dtype)[:, None], (n, T)).reshape(1, n, T)

    consts_p, const_1d = _pack_consts(consts)
    kernel = _make_kernel(
        f, const_1d, n, T, tol, lam_min, lam_max, gll_m, c1, max_iter,
        max_iter_ls, dtype,
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
        pltpu.VMEM((1, T), dtype),       # lam
        pltpu.VMEM((gll_m, T), dtype),   # fhist
        pltpu.VMEM((1, T), jnp.int32),   # iters
        pltpu.VMEM((1, T), dtype),       # ls_t
        pltpu.VMEM((1, T), jnp.int32),   # ls_done
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
    )(xT, loT, upT, *consts_p)

    x_final = x_out[0].T
    f_host = (lambda x: f(x, *consts)) if consts else f
    _, g_final = jax.vmap(jax.value_and_grad(f_host))(x_final)
    return SolveResult(
        x_final, f_out[0], g_final, it_out[0], st_out[0],
        pg_norm=batched_pg_inf_norm(x_final, g_final, lower, upper))
