"""Differentiating THROUGH a box-constrained solve (KKT-aware implicit
function theorem): gradients of the constrained argmin w.r.t. problem
parameters, exact even when bounds are active — a capability the reference
cannot express (its oracles are opaque closures)."""
from common import *

import numpy as np

from optimization_solvers_tpu.solvers.lbfgsb import (
    LbfgsbConfig, lbfgsb_minimize)

n = 5
lo, hi = jnp.full((n,), -1.0), jnp.full((n,), 1.0)
f = lambda x, p: 0.5 * jnp.sum((x - p) ** 2)   # x*(p) = clip(p, -1, 1)


def solve_fn(p, x0):
    return lbfgsb_minimize(
        make_oracle(lambda x: f(x, p)), x0, lo, hi,
        LbfgsbConfig(pgtol=1e-12, factr=0.0, max_iter=200)).x


x_star = solvers.make_implicit_solver_bounded(f, solve_fn, lambda p: (lo, hi))

p = jnp.array([0.5, 2.0, -3.0, 0.9, 0.0])     # coords 1, 2 pin at the box
x0 = jnp.zeros((n,))
print("x*(p)      =", np.asarray(x_star(p, x0)))

g = jax.grad(lambda p: jnp.sum(x_star(p, x0) ** 2))(p)
print("d||x*||^2/dp =", np.asarray(g))

inside = (np.asarray(p) > -1) & (np.asarray(p) < 1)
expected = 2 * np.clip(np.asarray(p), -1, 1) * inside
assert np.allclose(np.asarray(g), expected, atol=1e-6), (g, expected)
print("active-bound coordinates correctly have zero sensitivity")
