"""Piece-wise timing of the config-4 L-BFGS-B outer iteration on the real
device: which part of the 10k-dim step burns the ~27 ms/iter batch time?

Times each jitted piece at the config-4 shapes (B=64, n=10k, m=10):
  argsort of the breakpoint keys, the full generalized-Cauchy-point walk,
  middle-matrix build + subspace step, one oracle eval, the dcsrch line
  search, and the full step_fn.  Readback-fenced, median of repeats.
"""

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
from optimization_solvers_tpu.core.types import FuncEval
from optimization_solvers_tpu.solvers import lbfgsb as L

B, n, rows, m = 64, 10_000, 512, 10
DTYPE = jnp.float32

key = jax.random.PRNGKey(0)
A = (jax.random.normal(key, (rows, n)) / np.sqrt(n)).astype(DTYPE)
b = jnp.linspace(-1.0, 1.0, rows).astype(DTYPE)
oracle = make_oracle(problems.log_sum_exp(A, b))
lower = jnp.full((n,), -1.0, DTYPE)
upper = jnp.full((n,), 1.0, DTYPE)
cfg = L.LbfgsbConfig(m=m, pgtol=1e-5, factr=1e3, max_iter=200)

rng = np.random.RandomState(4)
x = jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)), DTYPE)

init_fn, keep_going, step_fn = L.make_lbfgsb_step(oracle, lower, upper, cfg)

# a mid-solve carry: run a few steps so histories are populated
warm = jax.jit(
    lambda x0: jax.vmap(
        lambda c: jax.lax.fori_loop(0, 4, lambda _, cc: step_fn(cc), c)
    )(jax.vmap(init_fn)(x0))
)
carry = warm(x)
jax.block_until_ready(carry)
_ = np.asarray(carry.f).sum()


def timeit(fn, *args, repeats=10):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    ts = []
    for _i in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


results = {}

# 1. full step
full = jax.jit(jax.vmap(step_fn))
results["full_step_ms"] = timeit(full, carry)

# 2. argsort of breakpoint keys alone
def keys_of(c):
    t_break = jnp.where(
        c.g < 0.0,
        (c.x - upper) / c.g,
        jnp.where(c.g > 0.0, (c.x - lower) / c.g, jnp.inf),
    )
    return jnp.where(t_break > 0.0, t_break, jnp.inf)

argsort_piece = jax.jit(lambda c: jnp.argsort(jax.vmap(keys_of)(c), axis=-1))
results["argsort_ms"] = timeit(argsort_piece, carry)

# 3. full cauchy point (includes the argsort + walk)
def cauchy(c):
    Wt, M = L._build_middle(c.hist)
    return L._cauchy_point(c.x, c.g, lower, upper, Wt, M, c.hist.theta)

results["build_middle_plus_cauchy_ms"] = timeit(jax.jit(jax.vmap(cauchy)), carry)

# 4. middle build alone
results["build_middle_ms"] = timeit(
    jax.jit(jax.vmap(lambda c: L._build_middle(c.hist))), carry)

# 5. direction = cauchy + subspace
def direction(c):
    Wt, M = L._build_middle(c.hist)
    xcp, cc, free = L._cauchy_point(c.x, c.g, lower, upper, Wt, M, c.hist.theta)
    return L._subspace_step(c.x, c.g, xcp, cc, free, lower, upper, c.hist, Wt, M)

results["direction_ms"] = timeit(jax.jit(jax.vmap(direction)), carry)

# 6. one oracle eval
results["oracle_eval_ms"] = timeit(jax.jit(jax.vmap(oracle)), carry.x)

# 7. line search given the direction
from optimization_solvers_tpu.linesearch.dcsrch import StrongWolfe

ls = StrongWolfe(c1=cfg.ls_c1, c2=cfg.ls_c2, bounded=True)
d = jax.jit(jax.vmap(direction))(carry)
d = d - carry.x
jax.block_until_ready(d)

def ls_piece(c, dd):
    ev = FuncEval(c.f, c.g)
    t, _ = ls.step_len(oracle, c.x, ev, dd, None, (lower, upper), cfg.max_iter_ls)
    return t

results["linesearch_ms"] = timeit(
    jax.jit(jax.vmap(ls_piece, in_axes=(0, 0))), carry, d)

dev = jax.devices()[0].platform
print(json.dumps({"device": dev, "B": B, "n": n, "m": m, **{k: round(v, 3) for k, v in results.items()}}))
