"""L-BFGS-B (device-resident Byrd-Lu-Nocedal-Zhu; replaces the reference's
Fortran setulb_ FFI) on bounded Rosenbrock-25."""
from common import *

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.solvers.lbfgsb import LbfgsbConfig, lbfgsb_minimize

n = 25
res = lbfgsb_minimize(
    make_oracle(problems.rosenbrock()), jnp.full(n, -1.2),
    jnp.full(n, -2.0), jnp.full(n, 2.0),
    LbfgsbConfig(m=10, pgtol=1e-7, factr=10.0, max_iter=1000))
report("lbfgsb", res, problems.rosenbrock())
check(res, jnp.ones(n), x_tol=1e-4, f_tol=1e-8)
