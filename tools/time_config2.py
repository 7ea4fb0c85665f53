"""Config-2 generic-QN-kernel tile probe: dense BFGS + MoreThuente on
Rosenbrock-100, 1,024 random starts (the bench.py --config 2 workload),
with the spec's tile cap optionally raised via C2_CAP."""

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
from optimization_solvers_tpu.core import problems
import optimization_solvers_tpu.ops.pallas_driver as drv

B, n = 1024, 100
DTYPE = jnp.float32
CAP = int(os.environ.get("C2_CAP", 128))

_orig = drv._QNSpec.preferred_tile
drv._QNSpec.preferred_tile = lambda self, n_, tile: min(tile, CAP)

f = problems.rosenbrock()
method = solvers.BFGS(tol=1e-5, scale_b0=True, restart_on_degeneracy=True)
search = ls.MoreThuente()

rng = np.random.RandomState(42)
inputs = [jnp.asarray(rng.uniform(-2, 2, (B, n)), DTYPE) for _ in range(4)]


def solve(x):
    return drv.fused_minimize(method, search, f, x, max_iter=600,
                              max_iter_ls=30, tile=CAP)


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
    "tile_cap": CAP, "solves_per_sec": round(B / dt, 1),
    "converged_fraction": float((np.asarray(r.status) == 1).mean()),
    "median_f": float(np.median(np.asarray(r.f))),
}))
