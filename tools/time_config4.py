"""Quick config-4 timing: lbfgsb_batch_minimize on the 10k-dim bounded
log-sum-exp, B=64 — the same workload as ``bench.py --config 4`` without
the scipy baseline.  Used for A/B runs while optimizing the step."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.solvers.lbfgsb import (
    LbfgsbConfig,
    lbfgsb_batch_minimize,
)

B = int(os.environ.get("C4_B", 64))
n, rows = 10_000, 512
DTYPE = jnp.float32
REPEATS = 3

key = jax.random.PRNGKey(0)
A = (jax.random.normal(key, (rows, n)) / np.sqrt(n)).astype(DTYPE)
b = jnp.linspace(-1.0, 1.0, rows).astype(DTYPE)
oracle = make_oracle(problems.log_sum_exp(A, b))
lower = jnp.full((n,), -1.0, DTYPE)
upper = jnp.full((n,), 1.0, DTYPE)
cfg = LbfgsbConfig(m=10, pgtol=1e-5, factr=1e3, max_iter=200,
                   gcp_chunk=int(os.environ.get("C4_CHUNK", 256)))
solve = jax.jit(lambda x0: lbfgsb_batch_minimize(oracle, x0, lower, upper, cfg))

rng = np.random.RandomState(4)
inputs = [jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)), DTYPE)
          for _ in range(REPEATS + 1)]
r = solve(inputs[0])
_ = np.asarray(r.f).sum()

times = []
for x in inputs[1:]:
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    r = solve(x)
    _ = np.asarray(r.f).sum()
    times.append(time.perf_counter() - t0)

dt = float(np.median(times))
it = np.asarray(r.iterations)
print(json.dumps({
    "device": jax.devices()[0].platform,
    "B": B,
    "batch_time_s": round(dt, 4),
    "solves_per_sec": round(B / dt, 2),
    "converged_fraction": float((np.asarray(r.status) == 1).mean()),
    "median_iterations": float(np.median(it)),
    "max_iterations": int(it.max()),
    "median_f": float(np.median(np.asarray(r.f))),
}))
