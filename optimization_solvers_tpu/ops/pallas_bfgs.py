"""Fused Pallas TPU kernel: batched dense BFGS solves (BASELINE config 2:
"BFGS + strong-Wolfe on Rosenbrock-100, batch of 1k random starts").

Each lane carries its dense (n, n) approximate inverse Hessian in VMEM as
a slab of the (n, n, T) scratch tensor; the rank-2 update and the direction
matvec are broadcast outer products / axis-reductions over the lane axis.
VMEM budget is the binding constraint: B-slab = n*n*T*4 bytes (100x100x
tile 8 = 320 KB; keep ``tile * n^2 <= ~1.5M`` floats).  For larger batches
the limited-memory kernel (:mod:`pallas_lbfgs`) is the right tool; this one
exists for dense-QN parity at fused speed.

Same Mosaic structure as the siblings (scalar-only loop carries,
scratch-resident state, value-only Armijo trials with one gradient
evaluation at the accepted point).
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


def _make_kernel(f, const_1d, n, T, tol, max_iter, max_iter_ls, c1, dtype,
                 row_block=16):
    eps = 2.2e-16 if dtype == jnp.float64 else 1.2e-7
    # row-chunked B traversals keep the (rb, n, T) temporaries well under
    # VMEM while the (n, n, T) slab itself stays resident
    row_starts = list(range(0, n, row_block))

    def kernel(x0_ref, *rest):
        n_consts = len(const_1d)
        const_refs = rest[:n_consts]
        (x_out, f_out, it_out, st_out,
         X, G, Fv, Bm, iters, ls_t, ls_done) = rest[n_consts:]
        cvals, caxes = _load_consts(const_refs, const_1d, T)
        bvg = _batched_value_and_grad(f, cvals, caxes)
        bval = _batched_value(f, cvals, caxes)

        X[...] = x0_ref[0]
        fv, gv = bvg(X[...])
        Fv[...] = fv
        G[...] = gv
        # B0 = I per lane: (n, n, T)
        eye = (lax.broadcasted_iota(jnp.int32, (n, n), 0)
               == lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(dtype)
        Bm[...] = jnp.broadcast_to(eye[:, :, None], (n, n, T))
        iters[...] = jnp.zeros((1, T), jnp.int32)

        def active_mask():
            # 2-norm gradient test, like the dense reference family
            # (bfgs.rs:64-76)
            gn = jnp.sqrt(jnp.sum(G[...] * G[...], axis=0, keepdims=True))
            return jnp.isfinite(Fv[...]) & ~(gn < tol)

        def body(carry):
            i, _go = carry
            active = active_mask()

            # d = -B g : contract over axis 1, row-chunked
            g_now = G[...]
            d_rows = []
            for r0 in row_starts:
                rb = min(row_block, n - r0)
                d_rows.append(-jnp.sum(
                    Bm[r0:r0 + rb] * g_now[None, :, :], axis=1))
            d = jnp.concatenate(d_rows, axis=0)                   # (n, T)

            g0d = jnp.sum(G[...] * d, axis=0, keepdims=True)
            f0 = Fv[...]
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
                ok = (fv_t <= f0 + c1 * t * g0d) & jnp.isfinite(fv_t)
                keep = done | ok
                ls_t[...] = jnp.where(keep, t, t * 0.5)
                ls_done[...] = keep.astype(jnp.int32)
                return (j + 1,
                        jnp.sum((~keep).astype(jnp.int32), dtype=jnp.int32))

            lax.while_loop(ls_cond, ls_body, (jnp.int32(0), jnp.int32(1)))
            t = ls_t[...]

            X_new = X[...] + t * d
            f_new, g_new = bvg(X_new)

            s_vec = X_new - X[...]                                # (n, T)
            y_vec = g_new - G[...]
            sy = jnp.sum(s_vec * y_vec, axis=0, keepdims=True)    # (1, T)
            s_norm = jnp.sqrt(jnp.sum(s_vec * s_vec, axis=0, keepdims=True))
            y_norm = jnp.sqrt(jnp.sum(y_vec * y_vec, axis=0, keepdims=True))
            upd = active & (s_norm >= tol) & (y_norm >= tol) & (sy > eps)

            # BFGS inverse update, expanded form (see solvers/quasi_newton):
            # B' = B - rho(s (By)^T + (By) s^T) + (rho^2 yBy + rho) s s^T
            # row-chunked in-place so temporaries stay (rb, n, T)
            By_rows = []
            for r0 in row_starts:
                rb = min(row_block, n - r0)
                By_rows.append(jnp.sum(
                    Bm[r0:r0 + rb] * y_vec[None, :, :], axis=1))
            By = jnp.concatenate(By_rows, axis=0)                  # (n, T)
            yBy = jnp.sum(y_vec * By, axis=0, keepdims=True)
            rho = 1.0 / sy
            coeff = rho * rho * yBy + rho
            s_full = s_vec[None, :, :]
            By_full = By[None, :, :]
            for r0 in row_starts:
                rb = min(row_block, n - r0)
                s_rows = jnp.expand_dims(
                    lax.slice_in_dim(s_vec, r0, r0 + rb, axis=0), 1)
                By_rows_c = jnp.expand_dims(
                    lax.slice_in_dim(By, r0, r0 + rb, axis=0), 1)
                chunk = (
                    Bm[r0:r0 + rb]
                    - rho[None, :, :] * (
                        s_rows * By_full + By_rows_c * s_full
                    )
                    + coeff[None, :, :] * (s_rows * s_full)
                )
                Bm[r0:r0 + rb] = jnp.where(
                    upd[None, :, :], chunk, Bm[r0:r0 + rb]
                )

            X[...] = jnp.where(active, X_new, X[...])
            Fv[...] = jnp.where(active, f_new, Fv[...])
            G[...] = jnp.where(active, g_new, G[...])
            iters[...] = iters[...] + active.astype(jnp.int32)

            go = jnp.sum(active_mask().astype(jnp.int32)) > 0
            return (i + 1, go)

        lax.while_loop(lambda c: (c[0] < max_iter) & c[1], body,
                       (jnp.int32(0), jnp.asarray(True)))

        gn = jnp.sqrt(jnp.sum(G[...] * G[...], axis=0, keepdims=True))
        finite = jnp.isfinite(Fv[...])
        status = jnp.where(
            (gn < tol) & finite, jnp.int32(Status.CONVERGED),
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
    static_argnames=("f", "tol", "max_iter", "max_iter_ls", "tile", "c1",
                     "interpret"),
)
def bfgs_solve_fused(
    f: Callable,
    x0: jax.Array,                  # (B, n)
    consts: tuple = (),
    *,
    tol: float = 1e-5,
    max_iter: int = 500,
    max_iter_ls: int = 24,
    tile: int = 128,
    c1: float = 1e-4,
    interpret: bool = False,
) -> SolveResult:
    """Batched dense-BFGS solves with the fused kernel.

    ``tile`` must be a multiple of 128 (TPU lane width); the per-tile VMEM
    budget is dominated by the (n, n, tile) B slab (~n^2 * tile * 4 bytes:
    n=100, tile=128 -> 5.1 MB), so keep ``n^2 * tile <= ~2.5M`` floats."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = x0.shape
    assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
    dtype = x0.dtype
    T = tile

    xT = x0.T.reshape(1, n, B)
    consts_p, const_1d = _pack_consts(consts)
    kernel = _make_kernel(
        f, const_1d, n, T, tol, max_iter, max_iter_ls, c1, dtype
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
        pltpu.VMEM((n, n, T), dtype),    # Bm
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
    )(xT, *consts_p)

    x_final = x_out[0].T
    f_host = (lambda x: f(x, *consts)) if consts else f
    _, g_final = jax.vmap(jax.value_and_grad(f_host))(x_final)
    return SolveResult(x_final, f_out[0], g_final, it_out[0], st_out[0],
                       pg_norm=batched_pg_inf_norm(x_final, g_final))
