"""Config-3 fused-path tile probe: SPG+GLL on the box-constrained
cond-1e3 quadratic, 10,240 lanes, via the generic fused kernel directly
(same workload as ``bench.py --config 3``)."""

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

from optimization_solvers_tpu import linesearch as ls, solvers
from optimization_solvers_tpu.ops.pallas_driver import fused_minimize

B, n = 10_240, 64
DTYPE = jnp.float32
d = jnp.asarray(np.logspace(0, 3, n), DTYPE)


def quad(x, diag):
    return 0.5 * jnp.sum(diag * x * x)


lower = jnp.full((n,), -2.0, DTYPE)
upper = jnp.full((n,), 2.0, DTYPE)
method = solvers.SpectralProjectedGradient(grad_tol=1e-4)

rng = np.random.RandomState(3)
inputs = [jnp.asarray(rng.uniform(-2, 2, (B, n)), DTYPE) for _ in range(4)]

for tile in [int(t) for t in os.environ.get("C3_TILES", "256,512,1024").split(",")]:
    def solve(x):
        return fused_minimize(method, ls.GLLQuadratic(), quad, x,
                              lower=lower, upper=upper, consts=(d,),
                              max_iter=1000, max_iter_ls=30, tile=tile)
    r = solve(inputs[0])
    _ = np.asarray(r.f).sum()
    ts = []
    for x in inputs[1:]:
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        r = solve(x)
        _ = np.asarray(r.f).sum()
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(json.dumps({
        "tile": tile, "solves_per_sec": round(B / dt, 1),
        "converged_fraction": float((np.asarray(r.status) == 1).mean()),
        "median_iterations": float(np.median(np.asarray(r.iterations))),
    }), flush=True)
