"""P-norm descent with exact preconditioner on f = x^2 + 4y^2
(reference examples/pnorm_descent_example.rs)."""
from common import *

f = lambda x: x[0]**2 + 4.0*x[1]**2
inv_p = jnp.linalg.inv(jnp.array([[2.0, 0.0], [0.0, 8.0]]))
res = solvers.minimize(
    solvers.PnormDescent(grad_tol=1e-6, inverse_p=inv_p), ls.BackTracking(),
    make_oracle(f), jnp.array([15.0, -7.0]), max_iter=100)
report("pnorm_descent", res, f)
check(res, [0.0, 0.0])
