"""SPG + GLL on f = x^2 + y^2 + exp(x^2+y^2) over [-1,1]^2
(reference examples/spg_example.rs)."""
from common import *

f = lambda x: x[0]**2 + x[1]**2 + jnp.exp(x[0]**2 + x[1]**2)
bounds = (jnp.array([-1.0, -1.0]), jnp.array([1.0, 1.0]))
res = solvers.minimize(
    solvers.SpectralProjectedGradient(grad_tol=1e-6), ls.GLLQuadratic(c1=1e-4, m=10),
    make_oracle(f), jnp.array([0.9, -0.8]), bounds=bounds, max_iter=1000)
report("spg", res, f)
check(res, [0.0, 0.0], f_star=1.0)
