"""Scaled (diagonally preconditioned) L-BFGS-B: implicit B0 = theta*diag(d)
via the exact change of variables z = sqrt(d)*x.  On a condition-1e6
quadratic, Jacobi scaling converges in one iteration where plain L-BFGS-B
exhausts its budget.  (The reference's Fortran core hard-codes theta*I.)"""
from common import *

import numpy as np

from optimization_solvers_tpu.solvers.lbfgsb import (
    LbfgsbConfig, lbfgsb_minimize, lbfgsb_minimize_scaled)

n = 50
h = jnp.asarray(np.logspace(0, 6, n))          # Hessian diag: 1 .. 1e6
f = lambda x: 0.5 * jnp.sum(h * x * x)
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.uniform(-2, 2, n))
lo, hi = jnp.full((n,), -3.0), jnp.full((n,), 3.0)
cfg = LbfgsbConfig(m=5, pgtol=1e-6, factr=0.0, max_iter=2000)

r_plain = lbfgsb_minimize(make_oracle(f), x0, lo, hi, cfg)
r_jacobi = lbfgsb_minimize_scaled(make_oracle(f), x0, lo, hi, h, cfg)

print(f"[plain ] f = {float(r_plain.f):.3e}  iterations = {int(r_plain.iterations)}")
print(f"[jacobi] f = {float(r_jacobi.f):.3e}  iterations = {int(r_jacobi.iterations)}")

assert int(r_jacobi.status) == int(Status.CONVERGED)
assert int(r_jacobi.iterations) <= 3
assert float(r_jacobi.f) < 1e-12
