"""MXU probe for the tall kernel's oracle matvec (round 5, VERDICT item 3).

The config-4 objective evaluates ``A @ x`` per instance (A: (rows, n)
problem data, shared).  Inside the tall kernel the objective is vmapped
over the T sublane instances, so the eval is a (T, n) x (n, rows)-shaped
contraction — a real matmul that Mosaic MAY route to the MXU (systolic
array) or may lower as VPU multiply-adds.  Which one decides whether
growing ``rows`` is ~free or linear-at-VPU-rate.

Method: time the kernel at fixed forced iteration counts (pgtol=0) for
rows in {64, 512} and two max_iter values; the per-iteration wall
difference per extra row, divided by the known extra MACs, gives the
achieved MAC rate for the matvec increment:

    rate ~ 1.9e12 MAC/s  -> VPU f32 (2 ops/MAC at 3.85e12 ops/s)
    rate >> that         -> MXU engaged

Writes MXU_PROBE_TALL.json.  Run on the TPU box (~5-10 min).
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

N, B, M, TILE = 10_000, 64, 10, 16
DTYPE = jnp.float32
K_LO, K_HI = 1, 21
REPEATS = 3


def lse(x, A_, b_):
    z = A_ @ x + b_
    mx = jnp.max(z)
    return mx + jnp.log(jnp.sum(jnp.exp(z - mx)))


def run_once(rows, max_iter, xs):
    key = jax.random.PRNGKey(0)
    A = (jax.random.normal(key, (rows, N)) / np.sqrt(N)).astype(DTYPE)
    b = jnp.linspace(-1.0, 1.0, rows).astype(DTYPE)
    lo = jnp.full((N,), -1.0, DTYPE)
    up = jnp.full((N,), 1.0, DTYPE)

    def solve(x):
        # pgtol=0 + factr=0: every lane runs exactly max_iter iterations
        return lbfgsb_solve_fused_tall(
            lse, x, lo, up, (A, b), m=M, pgtol=0.0, factr=0.0,
            max_iter=max_iter, tile=TILE)

    r = solve(xs[0])
    _ = np.asarray(r.f).sum()          # compile + fence (relay discipline)
    ts = []
    for x in xs[1:]:
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        r = solve(x)
        _ = np.asarray(r.f).sum()
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    iters = float(np.median(np.asarray(r.iterations)))
    return med, iters


def main():
    rng = np.random.RandomState(4)
    xs = [jnp.asarray(rng.uniform(-0.5, 0.5, (B, N)), DTYPE)
          for _ in range(REPEATS + 1)]
    out = {"device": str(jax.devices()[0]).split(":")[0],
           "n": N, "batch": B, "tile": TILE, "m": M}
    per_iter = {}
    for rows in (64, 512):
        w_lo, _ = run_once(rows, K_LO, xs)
        w_hi, _ = run_once(rows, K_HI, xs)
        per_iter[rows] = (w_hi - w_lo) / (K_HI - K_LO)
        out[f"rows{rows}"] = {
            "wall_lo_s": round(w_lo, 4), "wall_hi_s": round(w_hi, 4),
            "per_outer_iter_ms": round(per_iter[rows] * 1e3, 3)}
        print(rows, out[f"rows{rows}"], flush=True)

    d_rows = 512 - 64
    d_t = per_iter[512] - per_iter[64]
    # oracle evals per outer iteration: 1 gradient-bearing iterate eval +
    # ~1-2 Armijo value trials ~ 2.5; each eval is 2*N MAC per row per
    # instance; tiles run sequentially (B instances total)
    evals = 2.5
    extra_macs = evals * B * 2.0 * N * d_rows
    rate = extra_macs / max(d_t, 1e-12)
    out["delta_per_iter_ms"] = round(d_t * 1e3, 3)
    out["inferred_matvec_mac_per_s"] = float(f"{rate:.3e}")
    out["vpu_f32_mac_per_s"] = 1.925e12
    out["verdict"] = (
        "MXU-engaged" if rate > 4e12 else
        "VPU-rate (matvec not on MXU)" if rate > 0.5e12 else
        "below VPU rate — overhead-dominated, see walls")
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MXU_PROBE_TALL.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
