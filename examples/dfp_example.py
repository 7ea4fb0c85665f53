"""DFP + More-Thuente on f = x^2 + 5y^2 + xy
(reference examples/dfp_example.rs)."""
from common import *

f = lambda x: x[0]**2 + 5.0*x[1]**2 + x[0]*x[1]
res = solvers.minimize(
    solvers.DFP(tol=1e-6), ls.MoreThuente(),
    make_oracle(f), jnp.array([5.0, -5.0]), max_iter=200)
report("dfp", res, f)
check(res, [0.0, 0.0])
