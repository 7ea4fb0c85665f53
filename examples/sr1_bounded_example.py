"""SR1B on f = x^2 + 3y^2 + xy over [-1,1]^2
(reference examples/sr1_bounded_example.rs)."""
from common import *

f = lambda x: x[0]**2 + 3.0*x[1]**2 + x[0]*x[1]
bounds = (jnp.array([-1.0, -1.0]), jnp.array([1.0, 1.0]))
res = solvers.minimize(
    solvers.SR1B(tol=1e-6), ls.MoreThuenteB(),
    make_oracle(f), jnp.array([0.9, 0.9]), bounds=bounds, max_iter=500)
report("sr1_bounded", res, f)
check(res, [0.0, 0.0])
