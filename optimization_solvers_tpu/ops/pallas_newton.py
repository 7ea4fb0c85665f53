"""Pallas TPU kernel: fused batched Cholesky factorization + triangular
solves for the Newton-family direction (reference analogue: the nalgebra
``hessian.cholesky().unwrap().solve(g)`` at ``projected_newton.rs:75`` /
``spn.rs:86``, SURVEY.md §2.4 item 2).

One kernel invocation per batch element does factorize + forward + back
substitution entirely in VMEM: H is read from HBM once and the step vector
written once, where the XLA path (factor, then two triangular-solve ops)
round-trips the factor through HBM between ops.

The factorization is expressed as ``n`` masked full-matrix rank-1 updates
(right-looking, column ``j`` normalized then the strictly-trailing block
downdated).  That is ~3x the FLOPs of a tight scalar Cholesky but every op
is a full-width VPU vector op — the right trade on TPU for the n <= 512
matrices this family targets (the reference's problems are O(100)-dim).

``cholesky_solve_fused`` is the dispatch point: Pallas on TPU, the same
masked algorithm as plain jnp elsewhere (bitwise-identical math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _chol_factor_masked(A: jax.Array) -> jax.Array:
    """Right-looking masked Cholesky of an (n, n) SPD matrix; returns the
    lower factor (upper triangle zeroed)."""
    n = A.shape[-1]
    row_ids = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    vec_ids = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(j, A):
        pivot = jnp.sqrt(A[j, j])
        col = A[:, j] / pivot
        col = jnp.where(vec_ids > j, col, 0.0)
        col = col.at[j].set(pivot)
        trailing = (row_ids > j) & (col_ids > j)
        A = A - jnp.where(trailing, col[:, None] * col[None, :], 0.0)
        A = A.at[:, j].set(col)
        return A

    A = lax.fori_loop(0, n, body, A)
    return jnp.where(row_ids >= col_ids, A, 0.0)


def _solve_lower_masked(L: jax.Array, b: jax.Array) -> jax.Array:
    """Forward substitution ``L y = b`` via n masked dot-axpy steps."""
    n = L.shape[-1]

    def body(i, y):
        yi = (b[i] - jnp.sum(L[i, :] * y)) / L[i, i]
        return y.at[i].set(yi)

    return lax.fori_loop(0, n, body, jnp.zeros_like(b))


def _solve_upper_masked(L: jax.Array, b: jax.Array) -> jax.Array:
    """Back substitution ``L^T x = b`` (given the lower factor)."""
    n = L.shape[-1]

    def body(k, x):
        i = n - 1 - k
        xi = (b[i] - jnp.sum(L[:, i] * x)) / L[i, i]
        return x.at[i].set(xi)

    return lax.fori_loop(0, n, body, jnp.zeros_like(b))


def _chol_solve_one(h: jax.Array, g: jax.Array) -> jax.Array:
    L = _chol_factor_masked(h)
    return _solve_upper_masked(L, _solve_lower_masked(L, g))


def _newton_kernel(h_ref, g_ref, out_ref):
    h = h_ref[0]
    g = g_ref[0]
    out_ref[0] = _chol_solve_one(h, g)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_solve_pallas(h: jax.Array, g: jax.Array, *, interpret: bool = False
                          ) -> jax.Array:
    """Batched fused ``H^{-1} g`` via one Pallas program per batch element.

    ``h``: (B, n, n) SPD, ``g``: (B, n).  Unbatched inputs are promoted.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = h.ndim == 2
    if squeeze:
        h, g = h[None], g[None]
    B, n, _ = h.shape

    out = pl.pallas_call(
        _newton_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n), h.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(h, g)
    return out[0] if squeeze else out


def cholesky_solve_masked(h: jax.Array, g: jax.Array) -> jax.Array:
    """Plain-XLA version of the same masked algorithm (any backend)."""
    if h.ndim == 2:
        return _chol_solve_one(h, g)
    return jax.vmap(_chol_solve_one)(h, g)
