"""Broyden + More-Thuente on f = x^2 + 3y^2 + 2xy
(reference examples/broyden_example.rs)."""
from common import *

f = lambda x: x[0]**2 + 3.0*x[1]**2 + 2.0*x[0]*x[1]
res = solvers.minimize(
    solvers.Broyden(tol=1e-6), ls.MoreThuente(),
    make_oracle(f), jnp.array([4.0, 3.0]), max_iter=200)
report("broyden", res, f)
check(res, [0.0, 0.0])
