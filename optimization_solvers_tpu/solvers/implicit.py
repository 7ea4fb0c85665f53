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
