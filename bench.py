"""Headline benchmark: solves/sec on a 10k-instance batched Rosenbrock-100
L-BFGS-B workload (BASELINE.json metric), on whatever accelerator JAX sees.

Two device paths are measured:
  * the fused Pallas solver kernel (whole solves in VMEM) — the headline;
  * optionally (--unfused) the vmapped lax.while_loop driver.

The baseline is the reference's execution model: one instance at a time on
one CPU core through a native L-BFGS-B with analytic gradients (our
clean-room C++ core — the honest stand-in for the Rust crate + Fortran
``setulb_``), at the same pgtol/factr stopping targets.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import statistics
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.solvers.lbfgsb import LbfgsbConfig, lbfgsb_minimize
from optimization_solvers_tpu.ops.pallas_lbfgsb import lbfgsb_solve_fused

import os

N = 100
BATCH = int(os.environ.get("BENCH_BATCH", 10_240))  # multiple of the tile
# VMEM sweet spot (1024 exceeds the 16 MB scoped limit); override to probe
TILE = int(os.environ.get("BENCH_TILE", 512))
M = 5                   # reference default (lbfgsb.rs:91)
PGTOL = 1e-3            # accuracy target for BOTH device and cpu baseline
FACTR = 100.0           # ~1.2e-5 relative-decrease stall guard in f32
MAX_ITER = 600
DTYPE = jnp.float32
REPEATS = 3


def _starts(batch: int) -> np.ndarray:
    rng = np.random.RandomState(42)
    return rng.uniform(-2.0, 2.0, size=(batch, N))


def bench_fused() -> tuple[float, float, float]:
    f = problems.rosenbrock()
    lower = jnp.full((N,), -5.0, DTYPE)
    upper = jnp.full((N,), 5.0, DTYPE)

    def solve(x):
        return lbfgsb_solve_fused(
            f, x, lower, upper, m=M, pgtol=PGTOL, factr=FACTR,
            max_iter=MAX_ITER, tile=TILE,
        )

    r = solve(jnp.asarray(_starts(BATCH), DTYPE))
    jax.block_until_ready((r.x, r.f, r.iterations, r.status))  # compile+warm

    # distinct inputs per repeat: the serving tunnel memoizes repeat
    # dispatches of identical (executable, args) pairs, which would make
    # repeat timings meaningless
    rng = np.random.RandomState(7)
    times = []
    for _ in range(REPEATS):
        x = jnp.asarray(rng.uniform(-2.0, 2.0, size=(BATCH, N)), DTYPE)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        r = solve(x)
        # a device->host readback of the result is the only reliable fence
        # through the serving tunnel (block_until_ready returns early there)
        _ = np.asarray(r.f).sum()
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    return BATCH / dt, float(jnp.median(r.f)), float((r.status == 1).mean())


def bench_unfused() -> tuple[float, float, float]:
    oracle = make_oracle(problems.rosenbrock())
    lower = jnp.full((N,), -5.0, DTYPE)
    upper = jnp.full((N,), 5.0, DTYPE)
    cfg = LbfgsbConfig(m=M, pgtol=PGTOL, factr=FACTR, max_iter=MAX_ITER)
    solve = jax.jit(
        jax.vmap(lambda x0: lbfgsb_minimize(oracle, x0, lower, upper, cfg))
    )
    chunk = 2000  # the relay kills device dispatches longer than ~60s
    x0 = jnp.asarray(_starts(BATCH), DTYPE)
    chunks = [x0[i:i + chunk] for i in range(0, BATCH, chunk)]
    jax.block_until_ready(solve(chunks[0]))
    fs, t0 = [], time.perf_counter()
    for c in chunks:
        r = solve(c)
        fs.append(np.asarray(r.f))  # host readback = execution fence
    dt = time.perf_counter() - t0
    return BATCH / dt, float(np.median(np.concatenate(fs))), 1.0


def bench_cpu_baseline(samples: int = 32) -> float:
    """Reference execution model: sequential single-core native solves,
    analytic gradients, zero cross-language overhead."""
    try:
        from optimization_solvers_tpu.native import bench_rosenbrock_native

        _, _, dt = bench_rosenbrock_native(
            samples, N, m=M, factr=0.0, pgtol=PGTOL, max_iter=MAX_ITER,
        )
        return samples / dt
    except Exception:
        pass
    try:
        from scipy.optimize import fmin_l_bfgs_b
    except ImportError:
        return float("nan")

    def f_np(x):
        return float(np.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                            + (1.0 - x[:-1]) ** 2))

    def g_np(x):
        g = np.zeros_like(x)
        g[:-1] = -400.0 * x[:-1] * (x[1:] - x[:-1] ** 2) - 2.0 * (1.0 - x[:-1])
        g[1:] += 200.0 * (x[1:] - x[:-1] ** 2)
        return g

    x0s = _starts(samples)
    bounds = [(-5.0, 5.0)] * N
    t0 = time.perf_counter()
    for i in range(samples):
        fmin_l_bfgs_b(f_np, x0s[i].copy(), fprime=g_np, bounds=bounds,
                      m=M, factr=FACTR * 5.4e8, pgtol=PGTOL, maxiter=MAX_ITER)
    return samples / (time.perf_counter() - t0)


def main():
    use_unfused = "--unfused" in sys.argv
    bench = bench_unfused if use_unfused else bench_fused
    last = None
    for _ in range(3):  # the remote tunnel throws transient UNAVAILABLEs
        try:
            solves_per_sec, median_f, conv_frac = bench()
            break
        except Exception as exc:
            last = exc
    else:
        raise last
    cpu = bench_cpu_baseline()
    vs = solves_per_sec / cpu if cpu == cpu else None
    print(json.dumps({
        "metric": "solves_per_sec_rosenbrock100_lbfgsb_batch10k",
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "median_final_f": median_f,
        "converged_fraction": conv_frac,
        "baseline_cpu_solves_per_sec": round(cpu, 2),
        "path": "unfused" if use_unfused else "fused_pallas",
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
