"""DFPB on f = x^2 + 4y^2 + xy over [0,1.5]^2
(reference examples/dfp_bounded_example.rs)."""
from common import *

f = lambda x: x[0]**2 + 4.0*x[1]**2 + x[0]*x[1]
bounds = (jnp.array([0.0, 0.0]), jnp.array([1.5, 1.5]))
res = solvers.minimize(
    solvers.DFPB(tol=1e-6), ls.MoreThuenteB(),
    make_oracle(f), jnp.array([1.2, 1.2]), bounds=bounds, max_iter=500)
report("dfp_bounded", res, f)
check(res, [0.0, 0.0])
