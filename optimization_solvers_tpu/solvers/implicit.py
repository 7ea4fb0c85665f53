"""Differentiable solves: gradients *through* the argmin via the implicit
function theorem.

A capability the reference cannot express (its oracles are opaque Rust
closures): here the objective is traced JAX code, so the minimizer
``x*(params) = argmin_x f(x, params)`` can expose exact parameter gradients
without differentiating through the solver iterations:

    dx*/dparams = -(d2f/dx2)^{-1} (d2f/dparams dx)      (IFT at dL/dx = 0)

Useful for bilevel optimization, hyperparameter learning, and
model-predictive pipelines where a solve sits inside a larger jitted
computation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def make_implicit_solver(f: Callable, solve_fn: Callable):
    """Build a differentiable ``x_star(params, x0)``.

    ``f(x, params) -> scalar`` is the objective; ``solve_fn(params, x0) ->
    x_star_array`` runs any solver in this framework (its iterations are
    NOT differentiated — only the fixed point matters).

    The backward pass solves one linear system with the objective Hessian
    at the solution and one VJP of the gradient w.r.t. ``params``.
    Assumes the solution is interior (unconstrained or inactive bounds) and
    the Hessian is nonsingular there.
    """
    grad_x = jax.grad(f, argnums=0)

    @jax.custom_vjp
    def x_star(params, x0):
        return solve_fn(params, x0)

    def fwd(params, x0):
        x = solve_fn(params, x0)
        return x, (x, params)

    def bwd(residuals, v):
        x, params = residuals
        H = jax.jacfwd(grad_x, argnums=0)(x, params)        # (n, n), symmetric
        w = jnp.linalg.solve(H, v)
        _, vjp_params = jax.vjp(lambda p: grad_x(x, p), params)
        (g_params,) = vjp_params(-w)
        # x0 only selects the basin; no gradient flows through it
        return g_params, jnp.zeros_like(x)

    x_star.defvjp(fwd, bwd)
    return x_star


def make_implicit_solver_bounded(
    f: Callable,
    solve_fn: Callable,
    bounds_fn: Callable,
    active_tol: float = None,
):
    """Differentiable *box-constrained* solves: KKT-based, active-set aware.

    Extends :func:`make_implicit_solver` past interior solutions.  For
    ``x*(p) = argmin_{l(p) <= x <= u(p)} f(x, p)`` the KKT conditions under
    strict complementarity split the coordinates at the solution:

      * active at a bound (``x*_i = l_i`` with ``g_i > 0``, or ``x*_i = u_i``
        with ``g_i < 0``): locally ``x*_i(p) = bound_i(p)`` — the sensitivity
        is the bound's own derivative (zero for constant bounds);
      * free: ``g_F(x_F, x_A(p), p) = 0`` gives, by the IFT,
        ``dx_F/dp = -H_FF^{-1} (dg_F/dp + H_FA db_A/dp)``.

    The backward pass is mask-based (no gathers, static shapes, vmap-safe):
    one linear solve with the Hessian restricted to the free block (identity
    on active rows/cols), one VJP through ``grad f`` w.r.t. params, and one
    VJP through ``bounds_fn`` carrying the active-coordinate cotangents.

    Args:
      f: objective ``f(x, params) -> scalar``.
      solve_fn: ``(params, x0) -> x_star`` running any bounded solver in this
        framework (iterations are not differentiated).
      bounds_fn: ``params -> (lower, upper)``.  For bounds that do not depend
        on params, close over constants — their cotangent is then discarded
        by JAX automatically.
      active_tol: absolute tolerance for detecting a coordinate at its bound
        (default ``50 * eps`` of the iterate dtype, scaled by the bound
        magnitude).
    """
    grad_x = jax.grad(f, argnums=0)

    @jax.custom_vjp
    def x_star(params, x0):
        return solve_fn(params, x0)

    def fwd(params, x0):
        x = solve_fn(params, x0)
        return x, (x, params)

    def bwd(residuals, v):
        x, params = residuals
        lower, upper = bounds_fn(params)
        dtype = x.dtype
        if active_tol is None:
            tol = 50.0 * float(jnp.finfo(dtype).eps)
        else:
            tol = active_tol
        scale = 1.0 + jnp.abs(x)
        at_lower = jnp.abs(x - lower) <= tol * scale
        at_upper = jnp.abs(x - upper) <= tol * scale
        g = grad_x(x, params)
        # strictly active by complementarity; a zero multiplier (weakly
        # active) coordinate behaves as free, which is the correct limit
        active = (at_lower & (g > 0.0)) | (at_upper & (g < 0.0))
        free = ~active
        fmask = free.astype(dtype)

        H = jax.jacfwd(grad_x, argnums=0)(x, params)
        # identity on active rows/cols keeps shapes static and the solve exact
        Hm = H * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
        w = jnp.linalg.solve(Hm, v * fmask) * fmask          # w_F, 0 on A

        # params cotangent through g_F(x, p) = 0
        _, vjp_params = jax.vjp(lambda p: grad_x(x, p), params)
        (g_params,) = vjp_params(-w)

        # bound cotangent: active coords follow their bound, and the free
        # block feels them through H_FA (u_H = H @ w gives H_AF w_F on A)
        u_H = H @ w
        bound_cot = jnp.where(active, v - u_H, jnp.zeros_like(v))
        _, vjp_bounds = jax.vjp(bounds_fn, params)
        (b_params,) = vjp_bounds(
            (
                jnp.where(at_lower, bound_cot, jnp.zeros_like(v)),
                jnp.where(at_upper & ~at_lower, bound_cot, jnp.zeros_like(v)),
            )
        )
        g_params = jax.tree_util.tree_map(jnp.add, g_params, b_params)
        # x0 only selects the basin; no gradient flows through it
        return g_params, jnp.zeros_like(x)

    x_star.defvjp(fwd, bwd)
    return x_star
