"""BFGS + More-Thuente on f = x^2 + 2y^2 + 3z^2 + xy + yz
(reference examples/bfgs_example.rs)."""
from common import *

f = lambda x: x[0]**2 + 2.0*x[1]**2 + 3.0*x[2]**2 + x[0]*x[1] + x[1]*x[2]
res = solvers.minimize(
    solvers.BFGS(tol=1e-6), ls.MoreThuente(),
    make_oracle(f), jnp.array([10.0, -8.0, 6.0]), max_iter=100)
report("bfgs", res, f)
check(res, [0.0, 0.0, 0.0])
