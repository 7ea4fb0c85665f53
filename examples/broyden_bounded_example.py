"""BroydenB on f = x^2 + 2y^2 + xy over [0,1]^2
(reference examples/broyden_bounded_example.rs)."""
from common import *

f = lambda x: x[0]**2 + 2.0*x[1]**2 + x[0]*x[1]
bounds = (jnp.array([0.0, 0.0]), jnp.array([1.0, 1.0]))
res = solvers.minimize(
    solvers.BroydenB(tol=1e-6), ls.MoreThuenteB(),
    make_oracle(f), jnp.array([0.8, 0.8]), bounds=bounds, max_iter=500)
report("broyden_bounded", res, f)
check(res, [0.0, 0.0])
