"""Hager-Zhang (CG_DESCENT) line search: a capability beyond the reference's
six searches.  On a quadratic its secant step is the exact 1-D minimizer, so
gradient descent on the ill-conditioned gamma=90 quadratic converges in a
handful of iterations instead of hundreds with backtracking."""
from common import *

gamma = 90.0
f = lambda x: 0.5 * (x[0] ** 2 + gamma * x[1] ** 2)

res_hz = solvers.minimize(
    solvers.GradientDescent(grad_tol=1e-8), ls.HagerZhang(),
    make_oracle(f), jnp.array([180.0, 152.0]), max_iter=600)
report("gd+hager-zhang", res_hz, f)

res_bt = solvers.minimize(
    solvers.GradientDescent(grad_tol=1e-8), ls.BackTracking(),
    make_oracle(f), jnp.array([180.0, 152.0]), max_iter=600)
print(f"[comparison] backtracking took {int(res_bt.iterations)} iterations, "
      f"Hager-Zhang {int(res_hz.iterations)}")

assert int(res_hz.status) == int(Status.CONVERGED)
assert float(res_hz.f) < 1e-12
assert int(res_hz.iterations) < int(res_bt.iterations)
