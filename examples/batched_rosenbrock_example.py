"""The capability the single-instance reference lacks: 1024 Rosenbrock-100
instances solved in lockstep with vmapped L-BFGS-B (BASELINE.json headline
config, shrunk to run anywhere)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from optimization_solvers_tpu.core.oracle import make_oracle


import numpy as np
from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.solvers.lbfgsb import LbfgsbConfig, lbfgsb_minimize
from optimization_solvers_tpu.utils import summarize

n, batch = 100, 1024
lower, upper = jnp.full(n, -5.0, jnp.float32), jnp.full(n, 5.0, jnp.float32)
cfg = LbfgsbConfig(m=10, pgtol=1e-5, factr=100.0, max_iter=600)
oracle = make_oracle(problems.rosenbrock())
solve = jax.jit(jax.vmap(lambda x0: lbfgsb_minimize(oracle, x0, lower, upper, cfg)))
x0 = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (batch, n)), jnp.float32)
res = solve(x0)
stats = summarize(res)
print(stats)
assert stats["converged"] == batch
