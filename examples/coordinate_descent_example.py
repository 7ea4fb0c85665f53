"""Gauss-Southwell coordinate descent on f = x^2 + 2y^2 + 3z^2
(reference examples/coordinate_descent_example.rs)."""
from common import *

f = lambda x: x[0]**2 + 2.0*x[1]**2 + 3.0*x[2]**2
res = solvers.minimize(
    solvers.CoordinateDescent(grad_tol=1e-6), ls.BackTracking(),
    make_oracle(f), jnp.array([10.0, -5.0, 4.0]), max_iter=2000)
report("coordinate_descent", res, f)
check(res, [0.0, 0.0, 0.0])
