"""Probe: would straggler re-packing (lane sorting) speed the headline?

Runs the headline problem once on the device, pulls per-lane iteration
counts, then computes the tile-iteration cost (sum over tiles of
max-lane-iters, which is what the sequential grid pays) under:
  - the natural random packing (today's behavior)
  - oracle packing (sorted by true iteration count; upper bound)
  - proxy packings: initial f, initial ||g||_inf, initial pg-norm

Measured verdict (round 4, TPU v5e): NEGATIVE — see BENCH_NOTES.md
"Straggler re-packing: negative result".  Per-lane iteration counts are
chaotic in the start point (|corr| <= 0.009 for every cheap proxy), and
even the oracle packing bound is only x1.14 because the iteration
distribution is tight (med 522 / p90 531 / max 562): tiles are limited by
the bulk of the distribution, not by a sortable sparse tail.  Kept as a
tool because the analysis is workload-dependent — a future workload with
a heavy, predictable tail could revisit it.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.ops.pallas_lbfgsb import lbfgsb_solve_fused

N, B, TILE, M = 100, 10_240, 512, 5
PGTOL, FACTR, MAX_ITER = 1e-3, 100.0, 600
DTYPE = jnp.float32

f = problems.rosenbrock()
lower = jnp.full((N,), -5.0, DTYPE)
upper = jnp.full((N,), 5.0, DTYPE)

rng = np.random.RandomState(7)
x0 = jnp.asarray(rng.uniform(-2.0, 2.0, size=(B, N)), DTYPE)

r = lbfgsb_solve_fused(f, x0, lower, upper, m=M, pgtol=PGTOL, factr=FACTR,
                       max_iter=MAX_ITER, tile=TILE)
iters = np.asarray(r.iterations)
print("iters: med", np.median(iters), "mean", iters.mean(),
      "p90", np.percentile(iters, 90), "max", iters.max())

fv, gv = jax.vmap(jax.value_and_grad(f))(x0)
fv = np.asarray(fv); g_inf = np.asarray(jnp.max(jnp.abs(gv), axis=1))
pg = np.asarray(jnp.max(jnp.abs(x0 - jnp.clip(x0 - gv, lower, upper)), axis=1))
# distance-to-nearest-minimizer proxy (Rosenbrock: x*=1; local min x0~-1)
x0n = np.asarray(x0)
d1 = np.linalg.norm(x0n - 1.0, axis=1)


def tile_cost(order):
    it = iters[order].reshape(-1, TILE)
    return int(it.max(axis=1).sum())

base = tile_cost(np.arange(B))
print(f"natural packing : {base} tile-iters (efficiency {iters.sum()/ (base*TILE):.3f})")
for name, key in [("oracle (true iters)", iters),
                  ("init f", fv), ("init |g|inf", g_inf),
                  ("init pg-norm", pg), ("dist to x*=1", d1),
                  ("x[0] sign (locmin?)", -x0n[:, 0])]:
    c = tile_cost(np.argsort(key))
    print(f"{name:22s}: {c} tile-iters  -> x{base/c:.3f} speedup bound")

# correlation diagnostics
for name, key in [("init f", fv), ("|g|inf", g_inf), ("pg", pg), ("d1", d1)]:
    print(f"corr(iters, {name}) = {np.corrcoef(iters, key)[0,1]:+.3f}")
# what drives the tail? look at the slowest 1%
sl = np.argsort(iters)[-102:]
print("slowest-1% lanes: med iters", np.median(iters[sl]),
      "med final f", float(np.median(np.asarray(r.f)[sl])),
      "frac x*~=1", float((np.abs(np.asarray(r.x)[sl, 0] - 1) < 0.5).mean()))
