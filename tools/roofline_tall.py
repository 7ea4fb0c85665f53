"""Roofline / utilization account of the TALL fused L-BFGS-B kernel on the
config-4 workload (10k-dim bounded log-sum-exp, B=64, m=10, tile 16).

Method mirrors tools/roofline_headline.py: grid tiles run sequentially and
each tile's while-loop exits with its slowest lane, so

    wall = dispatch_floor + sum_tiles(tilemax_iters) x per_iter

with the floor bounded by a max_iter=1 run.  The work model is a hand
count of (T, n) vector passes per outer iteration (the kernel's hot unit:
one elementwise op or one lane-axis reduction over the (tile, n) slab).

Pass count per outer iteration (m=10, m2=20; see ops/pallas_lbfgsb_tall.py):

  seg_eval (the bisection probe):           ~8m + 10   = 90 passes
    (w_dot(d) + w_dot(u) at 2 passes per history slot, plus the masked
     G2F / d / u builds)
  bracket init: 2 seg_evals + tb/bounds     ~2 x 90 + 10
  bisection: TRIPS x (seg_eval + seg bounds) TRIPS x ~96
  fallback finalize:                        ~96
  c2 + xcp + masks:                         ~50
  subspace Gram E/Gm/H (masked, m(m+1)/2
    entries x 3 matrices x 2 passes):       ~330
  subspace solve + step + projections:      ~60
  line search (dcsrch-style trials, value
    evals dominated by the A@x matvec --
    MXU work, counted separately):          ~30 VPU passes
  pair update + Gram refresh:               ~50

So per-iteration VPU passes ~ 710 + TRIPS x 96: bisection probes dominate
once TRIPS exceeds ~4.  MXU work per iteration (config 4): the line
search's value evals + the iterate eval = ~3.5 evaluations x 2 x rows x n
MAC = ~3.5 x 2 x 512 x 10k ~ 3.6e7 MAC/instance.

This tool measures per-tile-iteration time at several ``bisect_iters``
caps to (a) locate the share of time in the bisection loop and (b) check
whether a lower cap preserves the trajectory (the fallback finalizer is
exact whenever the bracket's lo segment contains the minimizer).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp

from optimization_solvers_tpu.ops.pallas_lbfgsb_tall import (
    lbfgsb_solve_fused_tall)

N, ROWS, B, M, TILE = 10_000, 512, 64, 10, 16
PGTOL, FACTR, MAX_ITER = 1e-5, 1e3, 200
DTYPE = jnp.float32

key = jax.random.PRNGKey(0)
A = (jax.random.normal(key, (ROWS, N)) / np.sqrt(N)).astype(DTYPE)
b = jnp.linspace(-1.0, 1.0, ROWS).astype(DTYPE)


def lse(x, A_, b_):
    z = A_ @ x + b_
    mx = jnp.max(z)
    return mx + jnp.log(jnp.sum(jnp.exp(z - mx)))


lower = jnp.full((N,), -1.0, DTYPE)
upper = jnp.full((N,), 1.0, DTYPE)
rng = np.random.RandomState(4)
x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N)), DTYPE)


def fence(r):
    return float(np.asarray(r.f).sum())


def run(bisect_iters, max_iter=MAX_ITER):
    return lbfgsb_solve_fused_tall(
        lse, x0, lower, upper, consts=(A, b), m=M, pgtol=PGTOL,
        factr=FACTR, max_iter=max_iter, tile=TILE,
        bisect_iters=bisect_iters)


def timed(fn):
    r = fn()
    fence(r)                      # compile + warm
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn()
        fence(r)
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls)), r


out = {"workload": "config4 lse10k B64 m10 tile16", "caps": {}}

floor_w, _ = timed(lambda: run(40, max_iter=1))
out["dispatch_floor_ms"] = round(floor_w * 1e3, 2)
print(f"dispatch floor: {floor_w*1e3:.1f} ms")

ref_x = None
for cap in (40, 20, 10, 5):
    w, r = timed(lambda c=cap: run(c))
    it = np.asarray(r.iterations)
    tmx = int(it.reshape(-1, TILE).max(axis=1).sum())
    per_iter_us = 1e6 * (w - floor_w) / max(tmx, 1)
    conv = float((np.asarray(r.status) == 1).mean())
    x = np.asarray(r.x)
    if ref_x is None:
        ref_x = x
        dev = 0.0
    else:
        dev = float(np.max(np.abs(x - ref_x)))
    rec = {"wall_ms": round(w * 1e3, 1), "tile_iters": tmx,
           "per_tile_iter_us": round(per_iter_us, 1),
           "solves_per_sec": round(B / w, 1), "conv": conv,
           "med_iters": float(np.median(it)),
           "max_dev_vs_cap40": dev}
    out["caps"][cap] = rec
    print(f"bisect_iters {cap:2d}: {rec}")

# utilization model: passes/iter at the measured trip share
VPU_OPS_PER_SEC = 3.85e12            # v5e f32 VPU peak (8x128x4 @ 0.94 GHz)
ELEMS = TILE * N
t40, t5 = out["caps"][40]["per_tile_iter_us"], out["caps"][5]["per_tile_iter_us"]
out["bisection_share_upper_bound"] = round(1 - t5 / t40, 3) if t40 else None
passes_models = {"fixed_710": 710}
for trips in (5, 10, 15, 20):
    passes_models[f"trips_{trips}"] = 710 + trips * 96
util = {}
for name, passes in passes_models.items():
    ideal_us = passes * ELEMS / VPU_OPS_PER_SEC * 1e6
    util[name] = {"passes": passes, "ideal_us": round(ideal_us, 1),
                  "implied_utilization_at_cap40":
                      round(ideal_us / t40, 3) if t40 else None}
out["utilization_model"] = util
print(json.dumps(util, indent=1))

with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE_TALL.json"), "w") as fh:
    json.dump(out, fh, indent=1)
print("wrote ROOFLINE_TALL.json")

# round 5 (VERDICT item 3): the standing roofline artifact carries BOTH
# kernels — fold this run in as ROOFLINE.json["tall_kernel"] (the headline
# kernel's account stays at the top level, unchanged)
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_rp = os.path.join(_root, "ROOFLINE.json")
try:
    _roof = json.load(open(_rp))
except Exception:
    _roof = {}
_roof["tall_kernel"] = out
with open(_rp, "w") as fh:
    json.dump(_roof, fh, indent=1)
print("merged into ROOFLINE.json['tall_kernel']")
