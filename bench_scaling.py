"""Scaling-efficiency report (BASELINE.md: iterations/s scaling efficiency
>= 80% at 2+ hosts, reported at 1 chip / 1 host / N hosts).

Only one physical TPU chip is reachable in this environment, so the mesh
scaling is demonstrated on the virtual multi-device CPU backend (the same
`shard_map` program that would run over ICI on a pod slice: data-parallel
shards with per-device convergence, zero hot-path collectives).  On real
multi-chip hardware the identical code path applies; with no cross-device
communication in the hot loop the expected efficiency is ~100% minus
stragglers.

Prints one JSON line with the per-mesh-size records.
"""

import json
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.parallel import scaling_report, sharded_lbfgsb_minimize
from optimization_solvers_tpu.solvers.lbfgsb import LbfgsbConfig

N = 32
BATCH = 256


def main():
    oracle = make_oracle(problems.rosenbrock())
    lower = jnp.full(N, -5.0, jnp.float32)
    upper = jnp.full(N, 5.0, jnp.float32)
    cfg = LbfgsbConfig(m=5, pgtol=1e-3, factr=100.0, max_iter=400)
    x0 = jnp.asarray(
        np.random.RandomState(0).uniform(-2, 2, (BATCH, N)), jnp.float32
    )

    def solve_fn(mesh):
        return sharded_lbfgsb_minimize(
            oracle, x0, lower, upper, cfg, mesh=mesh
        )

    records = scaling_report(solve_fn, batch=BATCH, device_counts=[1, 2, 4, 8])
    # Virtual CPU devices SHARE physical cores, so speedup numbers are
    # meaningless here; what this run demonstrates is the absence of added
    # communication/synchronization cost in the shard_map program: total
    # wall time should stay ~flat as the same workload is split over more
    # mesh devices (on real chips the same program scales by device count,
    # as there are no hot-path collectives to pay for).
    base = records[0]["seconds"]
    for r in records:
        r["overhead_vs_single"] = r["seconds"] / base
    print(json.dumps({
        "metric": "lbfgsb_dp_shardmap_overhead",
        "workload": f"{BATCH}x Rosenbrock-{N} L-BFGS-B, shard_map dp",
        "backend": "cpu-virtual-mesh (1 physical TPU chip available; "
                   "virtual devices share cores, so speedup is not "
                   "measurable — overhead_vs_single ~1.0 shows the sharded "
                   "program adds no communication cost)",
        "records": [
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in r.items()} for r in records
        ],
    }))


if __name__ == "__main__":
    main()
