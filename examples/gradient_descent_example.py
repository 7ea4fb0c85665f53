"""Gradient descent + backtracking on f = x^2 + 2y^2
(reference examples/gradient_descent_example.rs)."""
from common import *

f = lambda x: x[0] ** 2 + 2.0 * x[1] ** 2
res = solvers.minimize(
    solvers.GradientDescent(grad_tol=1e-6), ls.BackTracking(c1=1e-4, beta=0.5),
    make_oracle(f), jnp.array([10.0, -10.0]), max_iter=100)
report("gradient_descent", res, f)
check(res, [0.0, 0.0])
