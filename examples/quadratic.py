"""BFGS + More-Thuente on f = x^T M x (reference examples/quadratic.rs:
asserts exact f(x*) == 0 within tolerance)."""
from common import *

M = jnp.array([[1.0, 0.0], [0.0, 90.0]])
f = lambda x: x @ (M @ x)
res = solvers.minimize(
    solvers.BFGS(tol=1e-6), ls.MoreThuente(),
    make_oracle(f), jnp.array([180.0, 152.0]), max_iter=100)
report("quadratic", res, f)
check(res, [0.0, 0.0])
