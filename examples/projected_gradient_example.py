"""Projected GD on f = (x-2)^2 + (y-3)^2 with box [0,1]^2:
constrained minimum (1,1), f = 5 (reference examples/projected_gradient_example.rs)."""
from common import *

f = lambda x: (x[0] - 2.0)**2 + (x[1] - 3.0)**2
bounds = (jnp.array([0.0, 0.0]), jnp.array([1.0, 1.0]))
res = solvers.minimize(
    solvers.ProjectedGradientDescent(grad_tol=1e-8), ls.BackTrackingB(),
    make_oracle(f), jnp.array([5.0, 5.0]), bounds=bounds, max_iter=1000)
report("projected_gradient", res, f)
check(res, [1.0, 1.0], f_star=5.0, f_tol=1e-8)
