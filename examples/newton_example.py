"""Newton on f = x^2 + y^2 + exp(x^2+y^2), min f = 1 at the origin
(reference examples/newton_example.rs)."""
from common import *

f = lambda x: x[0]**2 + x[1]**2 + jnp.exp(x[0]**2 + x[1]**2)
res = solvers.minimize(
    solvers.Newton(tol=1e-12), ls.MoreThuente(),
    make_oracle(f, with_hessian=True), jnp.array([1.0, 1.5]), max_iter=100)
report("newton", res, f)
check(res, [0.0, 0.0], f_star=1.0)
