"""Pallas TPU kernel: fused dense quasi-Newton update + direction matvec
(SURVEY.md §2.4: "fused rank-1/rank-2 update + matvec kernels").

The dense QN iteration is HBM-bandwidth bound on its (n, n) inverse-Hessian
approximation.  Split into XLA ops the iteration costs three full passes
over B per step (matvec ``B y``, the rank-1/rank-2 update producing ``B'``,
and next iteration's direction matvec ``B' g``).  This kernel does all
three with B resident in VMEM: one HBM read of B, one write of B', the
direction falling out for free.

Supports the four update rules of the reference family (``bfgs.rs:114-124``,
``dfp.rs:114-120``, ``broyden.rs:114-118``, ``sr1_b.rs:143-147``) with the
same degenerate-pair skip semantics (``bfgs.rs:104-112``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_KINDS = ("bfgs", "dfp", "broyden", "sr1")


def _update_math(kind: str, B, s, y, g, skip):
    """Shared math: returns (B', B' g).  ``B`` is (n, n); vectors (n,)."""
    f32 = jnp.float32 if B.dtype != jnp.float64 else jnp.float64
    By = jnp.dot(B, y, preferred_element_type=f32).astype(B.dtype)
    sy = jnp.sum(s * y)
    if kind == "bfgs":
        rho = 1.0 / sy
        yBy = jnp.sum(y * By)
        Bn = (
            B
            - rho * (s[:, None] * By[None, :] + By[:, None] * s[None, :])
            + (rho * rho * yBy + rho) * (s[:, None] * s[None, :])
        )
    elif kind == "dfp":
        yBy = jnp.sum(y * By)
        Bn = B + (s[:, None] * s[None, :]) / sy - (By[:, None] * By[None, :]) / yBy
    elif kind == "broyden":
        Bts = jnp.dot(B.T, s, preferred_element_type=f32).astype(B.dtype)
        Bn = B + ((s - By)[:, None] * Bts[None, :]) / sy
    elif kind == "sr1":
        shy = s - By
        Bn = B + (shy[:, None] * shy[None, :]) / jnp.sum(shy * y)
    else:  # pragma: no cover
        raise ValueError(kind)
    Bn = jnp.where(skip, B, Bn)
    Bg = jnp.dot(Bn, g, preferred_element_type=f32).astype(B.dtype)
    return Bn, Bg


def _make_kernel(kind: str, tol: float):
    def kernel(B_ref, s_ref, y_ref, g_ref, Bn_ref, Bg_ref):
        s = s_ref[0]
        y = y_ref[0]
        # degenerate-pair skip computed in-kernel (an SMEM flag input breaks
        # the pallas_call vmap rule: its (1,) block can't tile under the
        # prepended batch grid axis)
        skip = (jnp.sqrt(jnp.sum(s * s)) < tol) | (
            jnp.sqrt(jnp.sum(y * y)) < tol
        )
        Bn, Bg = _update_math(kind, B_ref[0], s, y, g_ref[0], skip)
        Bn_ref[0] = Bn
        Bg_ref[0] = Bg

    return kernel


@functools.partial(jax.jit, static_argnames=("kind", "tol", "interpret"))
def qn_update_direction_pallas(B, s, y, g, *, tol: float = 1e-8,
                               kind: str = "bfgs", interpret: bool = False):
    """Batched fused QN step: ``(B, s, y, g) -> (B', B' g)``.

    ``B``: (batch, n, n); vectors (batch, n).  A degenerate correction pair
    (``||s|| < tol`` or ``||y|| < tol``) freezes the update for that
    instance (``bfgs.rs:104-112``); the direction matvec still runs.
    Unbatched inputs are promoted.  Also composes with ``jax.vmap``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert kind in _KINDS
    squeeze = B.ndim == 2
    if squeeze:
        B, s, y, g = B[None], s[None], y[None], g[None]
    nb, n, _ = B.shape

    vec_spec = pl.BlockSpec((1, n), lambda b: (b, 0), memory_space=pltpu.VMEM)
    Bn, Bg = pl.pallas_call(
        _make_kernel(kind, tol),
        out_shape=(
            jax.ShapeDtypeStruct((nb, n, n), B.dtype),
            jax.ShapeDtypeStruct((nb, n), B.dtype),
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec,
        ),
        interpret=interpret,
    )(B, s, y, g)
    return (Bn[0], Bg[0]) if squeeze else (Bn, Bg)


def qn_update_direction_ref(B, s, y, g, skip, *, kind: str = "bfgs"):
    """Plain-XLA reference of the fused step (any backend, any batch rank)."""
    if B.ndim == 2:
        return _update_math(kind, B, s, y, g, skip)
    return jax.vmap(lambda b_, s_, y_, g_, k_: _update_math(kind, b_, s_, y_, g_, k_)
                    )(B, s, y, g, skip)
