"""Tall-kernel line-search comparison (round 5, VERDICT item 4): projected
Armijo backtracking vs the in-kernel MINPACK dcsrch strong Wolfe, measured
both ways INTERLEAVED on the config-4 workload (10k-dim bounded LSE) at
the B=256 operating point.

What it settles: the dcsrch mode buys exact iteration-count parity with
the Fortran pairing (tests/test_fused_lbfgsb_tall.py) — this records what
that semantics costs (or saves: dcsrch usually accepts t=1 with ONE
gradient-bearing eval where Armijo pays a value eval + the iterate eval).

Writes TALL_LS_COMPARE.json.  Run on the TPU box (~10 min first compiles).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.ops.pallas_lbfgsb_tall import (
    lbfgsb_solve_fused_tall)

N, ROWS, B, M, TILE = 10_000, 512, 256, 10, 16
REPEATS = 3
DTYPE = jnp.float32


def lse(x, A_, b_):
    z = A_ @ x + b_
    mx = jnp.max(z)
    return mx + jnp.log(jnp.sum(jnp.exp(z - mx)))


def main():
    key = jax.random.PRNGKey(0)
    A = (jax.random.normal(key, (ROWS, N)) / np.sqrt(N)).astype(DTYPE)
    b = jnp.linspace(-1.0, 1.0, ROWS).astype(DTYPE)
    lo = jnp.full((N,), -1.0, DTYPE)
    up = jnp.full((N,), 1.0, DTYPE)

    def mk(lsmode):
        def solve(x):
            return lbfgsb_solve_fused_tall(
                lse, x, lo, up, (A, b), m=M, pgtol=1e-5, factr=1e3,
                max_iter=200, tile=TILE, line_search=lsmode)
        return solve

    solves = {m_: mk(m_) for m_ in ("armijo", "dcsrch")}
    rng = np.random.RandomState(4)
    xs = [jnp.asarray(rng.uniform(-0.5, 0.5, (B, N)), DTYPE)
          for _ in range(REPEATS + 1)]
    for m_, sv in solves.items():
        _ = np.asarray(sv(xs[0]).f).sum()       # compile + warm
    times = {m_: [] for m_ in solves}
    last = {}
    for x in xs[1:]:
        jax.block_until_ready(x)
        for m_, sv in solves.items():           # interleaved
            t0 = time.perf_counter()
            r = sv(x)
            _ = np.asarray(r.f).sum()
            times[m_].append(time.perf_counter() - t0)
            last[m_] = r
    out = {"device": str(jax.devices()[0]).split(":")[0],
           "workload": f"{B}x bounded LSE rows={ROWS} n={N} m={M}"}
    for m_, ts in times.items():
        r = last[m_]
        med = statistics.median(ts)
        out[m_] = {
            "solves_per_sec": round(B / med, 1),
            "wall_s": round(med, 3),
            "median_iterations": float(np.median(np.asarray(r.iterations))),
            "converged_fraction": float((np.asarray(r.status) == 1).mean()),
            "median_final_f": float(np.median(np.asarray(r.f))),
            "gcp_flag_fraction": float(np.asarray(r.gcp_multimodal).mean()),
        }
        print(m_, out[m_], flush=True)
    out["dcsrch_vs_armijo"] = round(
        out["dcsrch"]["solves_per_sec"] / out["armijo"]["solves_per_sec"], 3)
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TALL_LS_COMPARE.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
