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
M = int(os.environ.get("BENCH_M", 5))   # reference default (lbfgsb.rs:91)
PGTOL = 1e-3            # accuracy target for BOTH device and cpu baseline
FACTR = 100.0           # ~1.2e-5 relative-decrease stall guard in f32
MAX_ITER = 600
DTYPE = jnp.float32
# --repeats N (or BENCH_REPEATS) — measured run-to-run spread on the shared
# TPU box is ~±10% (and ±30% for the CPU twin, BENCH_NOTES round 3), so
# records carry median + min/max/MAD over interleaved repeats rather than a
# single draw (VERDICT round-3 item 6)
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))
if "--repeats" in sys.argv:
    REPEATS = int(sys.argv[sys.argv.index("--repeats") + 1])


def _spread(values) -> dict:
    """median / min / max / MAD of a list of per-repeat measurements."""
    med = statistics.median(values)
    return {
        "median": round(med, 2),
        "min": round(min(values), 2),
        "max": round(max(values), 2),
        "mad": round(statistics.median([abs(v - med) for v in values]), 2),
        "repeats": len(values),
    }


def _starts(batch: int) -> np.ndarray:
    rng = np.random.RandomState(42)
    return rng.uniform(-2.0, 2.0, size=(batch, N))


def bench_fused(cpu_samples_per_repeat: int = 8):
    """Headline fused kernel, REPEATS timed runs INTERLEAVED with the CPU
    single-core twin (so box-load drift hits both columns the same way).
    Returns (device solves/s list, cpu solves/s list, median f, conv)."""
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
    sps, cpu_sps = [], []
    for _ in range(REPEATS):
        x = jnp.asarray(rng.uniform(-2.0, 2.0, size=(BATCH, N)), DTYPE)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        r = solve(x)
        # a device->host readback of the result is the only reliable fence
        # through the serving tunnel (block_until_ready returns early there)
        _ = np.asarray(r.f).sum()
        sps.append(BATCH / (time.perf_counter() - t0))
        cpu_sps.append(bench_cpu_baseline(cpu_samples_per_repeat))
    return sps, cpu_sps, float(jnp.median(r.f)), float((r.status == 1).mean())


def bench_unfused() -> tuple[float, float, float]:
    from optimization_solvers_tpu.solvers.lbfgsb import lbfgsb_batch_minimize

    oracle = make_oracle(problems.rosenbrock())
    lower = jnp.full((N,), -5.0, DTYPE)
    upper = jnp.full((N,), 5.0, DTYPE)
    cfg = LbfgsbConfig(m=M, pgtol=PGTOL, factr=FACTR, max_iter=MAX_ITER)
    # lockstep batched driver (one compile, throughput parity with the
    # chunked vmap path: 264 vs 272 solves/s); dispatched in half-batch
    # chunks so a single device dispatch stays well inside the relay's
    # ~60s kill window (~19s each at the measured 265 solves/s)
    solve = jax.jit(
        lambda x0: lbfgsb_batch_minimize(oracle, x0, lower, upper, cfg))
    chunk = BATCH // 2 if BATCH > 2048 else BATCH
    x0 = jnp.asarray(_starts(BATCH), DTYPE)
    _ = np.asarray(solve(x0[:chunk]).f)  # compile+warm; readback = fence
    x1 = jnp.asarray(
        np.random.RandomState(7).uniform(-2.0, 2.0, size=(BATCH, N)), DTYPE)
    fs, sts = [], []
    t0 = time.perf_counter()
    for i in range(0, BATCH, chunk):
        r = solve(x1[i:i + chunk])
        fs.append(np.asarray(r.f))
        sts.append(np.asarray(r.status))
    dt = time.perf_counter() - t0
    fs = np.concatenate(fs)
    sts = np.concatenate(sts)
    return BATCH / dt, float(np.median(fs)), float((sts == 1).mean())


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


# ---------------------------------------------------------------------------
# BASELINE.json configs 1-5: one-command reproducible runs (--config N), each
# emitting one JSON line.  Every config goes through the GENERAL API
# (solvers.minimize / batch_minimize with fused="auto") so the number
# measures what a user of the reference-shaped API actually gets, not a
# hand-picked kernel.  The default (no --config) stays the headline fused
# L-BFGS-B run above.
# ---------------------------------------------------------------------------

# BENCH_SCALE=k divides batch sizes by k (CPU smoke runs of the config set)
SCALE = max(1, int(os.environ.get("BENCH_SCALE", 1)))


def _fence(r):
    """Device->host readback of the result — the only reliable execution
    fence through the serving tunnel."""
    return float(np.asarray(r.f).sum())


def _timed_interleaved(solves, inputs):
    """Interleaved per-repeat wall times for several device solve variants
    over the same distinct pre-staged inputs — box-load drift hits every
    variant equally, with the same fencing discipline as :func:`_timed`.
    Returns ``(times_per_variant, last_result_per_variant)``."""
    times = [[] for _ in solves]
    results = [None] * len(solves)
    for x in inputs:
        jax.block_until_ready(x)
        for i, sv in enumerate(solves):
            t0 = time.perf_counter()
            results[i] = sv(x)
            _fence(results[i])
            times[i].append(time.perf_counter() - t0)
    return times, results


def _timed(solve, inputs):
    """Per-repeat wall times of ``solve`` over distinct pre-staged inputs
    (distinct: the tunnel memoizes repeat dispatches of identical args).
    Returns ``(times, last_result)``; callers record the median plus the
    spread (VERDICT round-3 item 6)."""
    times = []
    r = None
    for x in inputs:
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        r = solve(x)
        _fence(r)
        times.append(time.perf_counter() - t0)
    return times, r


def bench_config1():
    """GD + backtracking on the 100-D convex quadratic (examples/quadratic.rs
    geometry generalized), K sequential single-instance solves through the
    general API — the reference's own execution model, CPU-runnable."""
    from optimization_solvers_tpu import linesearch as ls, solvers
    from optimization_solvers_tpu.solvers.driver import make_solver

    n, K = 100, max(4, 64 // SCALE)
    d = jnp.asarray(np.linspace(1.0, 100.0, n), DTYPE)
    oracle = make_oracle(problems.diag_quadratic(d))
    solve = make_solver(
        solvers.GradientDescent(grad_tol=1e-6), ls.BackTracking(), oracle,
        max_iter=3000)
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.uniform(-5, 5, n), DTYPE) for _ in range(K + 1)]
    _fence(solve(xs[0]))  # compile
    # K independent sequential API calls; dispatch is async, so fence once
    # at the end (serving throughput) and separately time one fenced call
    # (latency)
    t0 = time.perf_counter()
    rs = [solve(x) for x in xs[1:]]
    fs = [float(np.asarray(r.f)) for r in rs]
    sts = [int(r.status) for r in rs]
    dt = time.perf_counter() - t0
    t1 = time.perf_counter()
    _fence(solve(xs[1]))
    latency_ms = (time.perf_counter() - t1) * 1e3

    # single-core numpy twin of the same algorithm (reference execution model)
    d_np = np.asarray(d, np.float64)

    def np_solve(x):
        for _ in range(3000):
            g = d_np * x
            if np.sqrt((g * g).sum()) < 1e-6:
                return
            f0, gd = 0.5 * (x * g).sum(), -(g * g).sum()
            t = 1.0
            for _ in range(40):
                xt = x - t * g
                if 0.5 * (d_np * xt * xt).sum() <= f0 + 1e-4 * t * gd:
                    break
                t *= 0.5
            x = x - t * g

    xs_np = [rng.uniform(-5, 5, n) for _ in range(16)]
    t1 = time.perf_counter()
    for x in xs_np:
        np_solve(x)
    cpu = 16 / (time.perf_counter() - t1)
    return {
        "metric": "config1_gd_backtracking_quadratic100_sequential",
        "value": round(K / dt, 2), "unit": "solves/s",
        "vs_baseline": round(K / dt / cpu, 2),
        "baseline_cpu_solves_per_sec": round(cpu, 2),
        "converged_fraction": float(np.mean(np.asarray(sts) == 1)),
        "median_final_f": float(np.median(fs)),
        "single_solve_latency_ms": round(latency_ms, 2),
        "path": "general_api_minimize",
    }


def bench_config1_tpu():
    """Config-1 on the ACCELERATOR (VERDICT round-2 weak #7): the recorded
    CPU home is right for sequential single tiny solves (the ~30 ms relay
    round-trip floor), but the TPU story must be measured, not asserted —
    single-solve latency through the general API, the fused kernel's
    single-solve latency, and the batch size at which the TPU path
    overtakes the sequential CPU throughput."""
    import subprocess

    from optimization_solvers_tpu import linesearch as ls, solvers
    from optimization_solvers_tpu.solvers.driver import make_solver

    n = 100
    d = jnp.asarray(np.linspace(1.0, 100.0, n), DTYPE)
    oracle = make_oracle(problems.diag_quadratic(d))
    rng = np.random.RandomState(0)

    # (a) sequential single-solve latency, general API on TPU
    solve1 = make_solver(
        solvers.GradientDescent(grad_tol=1e-6), ls.BackTracking(), oracle,
        max_iter=3000)
    xs = [jnp.asarray(rng.uniform(-5, 5, n), DTYPE) for _ in range(9)]
    _fence(solve1(xs[0]))  # compile
    lat = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        _fence(solve1(x))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat_ms = statistics.median(lat)

    # (b) batched throughput at growing B (fused='auto' routes to the
    # generic fused kernel) -> crossover vs the CPU sequential number
    def solve_b(x):
        return solvers.batch_minimize(
            solvers.GradientDescent(grad_tol=1e-6), ls.BackTracking(),
            oracle, x, fused="auto", max_iter=3000)

    curve = {}
    for B in (1, 8, 64, 512, 4096):
        xb = jnp.asarray(rng.uniform(-5, 5, (B, n)), DTYPE)
        ts, r = _timed(solve_b, [
            jnp.asarray(rng.uniform(-5, 5, (B, n)), DTYPE), xb, xb + 0.01])
        curve[B] = round(B / statistics.median(ts), 2)

    # (c) the CPU-home number, measured the same way in a subprocess (the
    # axon sitecustomize pins this process's backend, so re-homing needs a
    # fresh interpreter; bench_config1 flips to CPU via --config 1)
    cpu_jax = None
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--config", "1"],
            capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        cpu_jax = json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        pass
    cpu_sps = cpu_jax["value"] if cpu_jax else float("nan")
    crossover = next((B for B, sps in sorted(curve.items())
                      if sps > cpu_sps), None)
    return {
        "metric": "config1_gd_backtracking_quadratic100_tpu_story",
        "value": curve[4096], "unit": "solves/s",
        "vs_baseline": round(curve[4096] / cpu_jax[
            "baseline_cpu_solves_per_sec"], 2) if cpu_jax else None,
        "tpu_single_solve_latency_ms": round(lat_ms, 2),
        "tpu_batch_solves_per_sec": curve,
        "cpu_sequential_solves_per_sec": cpu_sps,
        "cpu_single_solve_latency_ms": cpu_jax[
            "single_solve_latency_ms"] if cpu_jax else None,
        "crossover_batch_vs_cpu_sequential": crossover,
        "path": "general_api_batch_fused_auto",
    }


def bench_config2():
    """Dense BFGS + More-Thuente (the spec's pairing, BASELINE.json config
    2) on Rosenbrock-100, 1k random starts, through the general API with
    the robustness knobs on; fused='auto' routes to the generic kernel
    with the fused Moré-Thuente search spec.  Reports the strict-tolerance
    stationary fraction (VERDICT round-1 item 3: target >=95%)."""
    from optimization_solvers_tpu import linesearch as ls, solvers

    B, n = 1024 // SCALE, 100
    oracle = make_oracle(problems.rosenbrock())
    method = solvers.QuasiNewton(
        tol=2e-4, update="bfgs", scale_b0=True, restart_on_degeneracy=True)

    def solve(x):
        return solvers.batch_minimize(
            method, ls.MoreThuente(), oracle, x,
            max_iter=1500, max_iter_ls=40)

    rng = np.random.RandomState(42)
    inputs = [jnp.asarray(rng.uniform(-2, 2, (B, n)), DTYPE)
              for _ in range(REPEATS + 1)]
    _fence(solve(inputs[0]))  # compile
    ts, r = _timed(solve, inputs[1:])
    dt = statistics.median(ts)

    f_vals = np.asarray(r.f)
    # stationary = the global minimum or Rosenbrock's local min near x0=-1
    stationary = (f_vals < 1e-6) | (np.abs(f_vals - 3.9866) < 1e-2)
    cpu = _scipy_rosen_bfgs_baseline(n)
    sps = B / dt

    # round 5 (VERDICT item 1): the f32x2 precision stage — df-BFGS polish
    # of the same exits at the REFERENCE tolerance 1e-6 (solvers/df_polish:
    # emulated-f64 oracle + iterate arithmetic from f32 pairs).  This is
    # the strict-tolerance record the r04 config-2 wall (conv 0.107) was
    # about; every certificate is df-accurate stationarity, and the cost
    # factor is the polish wall over the stage-1 wall.
    from optimization_solvers_tpu.solvers.df_polish import df_polish_minimize

    raw_f = problems.rosenbrock()

    def polish(x):
        return df_polish_minimize(raw_f, x, grad_tol=1e-6, max_iter=200)

    exits = [jnp.asarray(solve(x).x) for x in inputs]
    _fence(polish(exits[0]))              # compile + warm
    pts, pres = _timed(polish, exits[1:])
    pdt = statistics.median(pts)
    pst = np.asarray(pres.status)
    f32x2 = {
        "grad_tol": 1e-6,
        "converged_fraction": float((pst == 1).mean()),
        "polish_median_iters": float(np.median(np.asarray(pres.iterations))),
        "polish_wall_s": round(pdt, 4),
        "cost_factor_vs_stage1": round(pdt / dt, 3),
        "solves_per_sec_end_to_end": round(B / (dt + pdt), 2),
        "pg_norm_p99": float(np.percentile(np.asarray(pres.pg_norm), 99)),
    }

    return {
        "metric": "config2_bfgs_morethuente_rosenbrock100_batch1k",
        "value": round(sps, 2), "unit": "solves/s",
        "solves_per_sec_spread": _spread([B / t for t in ts]),
        "vs_baseline": round(sps / cpu, 2) if cpu == cpu else None,
        "baseline_cpu_solves_per_sec": round(cpu, 2),
        "converged_fraction": float((np.asarray(r.status) == 1).mean()),
        # round 4: lanes whose s/y-stall exit fires at pg_norm > tol are
        # labeled STALLED instead of CONVERGED (VERDICT item 5) — on this
        # f32 workload most lanes reach a minimum (stationary_fraction,
        # value-based) but cannot certify pg 2e-4 on the Rosenbrock
        # valley, so the honest split is ~0.11 converged / ~0.88 stalled;
        # the reference reports all of them as plain Ok(()) success
        "stalled_fraction": float((np.asarray(r.status) == 6).mean()),
        "success_fraction_reference_semantics": float(
            np.isin(np.asarray(r.status), (1, 6)).mean()),
        "stationary_fraction": float(stationary.mean()),
        "median_final_f": float(np.median(f_vals)),
        "median_iterations": float(np.median(np.asarray(r.iterations))),
        # strict-tolerance (1e-6) story via precision="f32x2" (round 5)
        "f32x2": f32x2,
        "path": "general_api_fused_auto_morethuente",
    }


def _scipy_rosen_bfgs_baseline(n, samples=8):
    try:
        from scipy.optimize import minimize as sp_minimize
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

    rng = np.random.RandomState(42)
    t0 = time.perf_counter()
    for _ in range(samples):
        sp_minimize(f_np, rng.uniform(-2, 2, n), jac=g_np, method="BFGS",
                    options={"gtol": 2e-4, "maxiter": 1500})
    return samples / (time.perf_counter() - t0)


def _np_spg_baseline(d_np, samples=16, grad_tol=1e-4, max_iter=1000):
    """Single-core numpy twin of SPG + GLL-quadratic on the config-3 box
    quadratic — the reference's execution model (one f64 instance at a
    time), same stopping rule and safeguarded interpolation."""
    n = d_np.shape[0]
    lo, hi = -2.0, 2.0
    rng = np.random.RandomState(3)
    t0 = time.perf_counter()
    for _ in range(samples):
        x = np.clip(rng.uniform(-2, 2, n), lo, hi)
        gv = d_np * x
        fv = 0.5 * (x * gv).sum()
        lam = np.clip(1.0 / np.abs(np.clip(x - gv, lo, hi) - x).max(),
                      1e-3, 1e3)
        hist = [-np.inf] * 10
        for _ in range(max_iter):
            if np.abs(x - np.clip(x - gv, lo, hi)).max() < grad_tol:
                break
            dv = np.clip(x - lam * gv, lo, hi) - x
            hist.pop(0)
            hist.append(fv)
            fmax = max(hist)
            g0d = (gv * dv).sum()
            t = 1.0
            for _ in range(30):
                xt = x + t * dv
                ft = 0.5 * (d_np * xt * xt).sum()
                if ft - fmax <= 1e-4 * t * g0d:
                    break
                t_tmp = -0.5 * t * t * g0d / (ft - fv - t * g0d)
                t_new = t * 0.5 if t <= 0.1 else np.clip(t_tmp, 0.1 * t, 0.9 * t)
                t = t_new if np.isfinite(t_new) else t * 0.5
            x_new = x + t * dv
            g_new = d_np * x_new
            s = x_new - x
            y = g_new - gv
            sy = (s * y).sum()
            lam = 1e3 if sy <= 0 else np.clip((s * s).sum() / sy, 1e-3, 1e3)
            x, gv = x_new, g_new
            fv = 0.5 * (x * gv).sum()
    return samples / (time.perf_counter() - t0)


def bench_config3():
    """SPG + GLL on a box-constrained quadratic (cond 1e3), 10,240-instance
    batch, through the ONE-CALL FRONT END (round 5, VERDICT item 2): the
    main record is the frontend-DEFAULT path — ``policy="fast"`` selects
    the alternating-BB scalar that closes the f32 lambda-cycling tail at
    ~2x throughput AND conv 1.000 — with ``policy="reference"``
    (spg.rs:134-143 exact) measured interleaved as the sub-record."""
    import optimization_solvers_tpu as ost

    B, n = 10_240 // SCALE, 64
    d = jnp.asarray(np.logspace(0, 3, n), DTYPE)

    # problem data rides explicitly (data=...) so the fused kernel can take
    # it as consts operands; a closure capture would force the vmapped path
    def fq(x, diag):
        return 0.5 * jnp.sum(diag * x * x)

    def solve_fast(x):
        return ost.minimize(fq, x, method="spg", bounds=(-2.0, 2.0),
                            data=(d,), tol=1e-4, max_iter=1000,
                            max_iter_ls=30)

    def solve_ref(x):
        return ost.minimize(fq, x, method="spg", bounds=(-2.0, 2.0),
                            data=(d,), tol=1e-4, max_iter=1000,
                            max_iter_ls=30, policy="reference")

    rng = np.random.RandomState(3)
    inputs = [jnp.asarray(rng.uniform(-2, 2, (B, n)), DTYPE)
              for _ in range(REPEATS + 1)]
    _fence(solve_fast(inputs[0]))
    _fence(solve_ref(inputs[0]))
    (ts, ts_ref), (r, r_ref) = _timed_interleaved(
        [solve_fast, solve_ref], inputs[1:])
    dt = statistics.median(ts)
    sps = B / dt
    cpu = _np_spg_baseline(np.asarray(d, np.float64))
    return {
        "metric": "config3_spg_box_quadratic_batch10k",
        "value": round(sps, 2), "unit": "solves/s",
        "solves_per_sec_spread": _spread([B / t for t in ts]),
        "vs_baseline": round(sps / cpu, 2) if cpu == cpu else None,
        "baseline_cpu_solves_per_sec": round(cpu, 2),
        "converged_fraction": float((np.asarray(r.status) == 1).mean()),
        "median_final_f": float(np.median(np.asarray(r.f))),
        "median_iterations": float(np.median(np.asarray(r.iterations))),
        "reference_policy": {
            "solves_per_sec": round(B / statistics.median(ts_ref), 2),
            "solves_per_sec_spread": _spread([B / t for t in ts_ref]),
            "converged_fraction": float(
                (np.asarray(r_ref.status) == 1).mean()),
            "median_iterations": float(
                np.median(np.asarray(r_ref.iterations))),
        },
        "path": "frontend_default_policy_fast_fused_auto",
    }


def bench_config4():
    """L-BFGS-B (m=10) on the bounded 10,000-dim log-sum-exp, 64-instance
    batch on one chip, through the GENERAL API (``ost.minimize``): on TPU
    it auto-routes to the tall-layout fused kernel (instances on sublanes,
    GCP by segment bisection — ops/pallas_lbfgsb_tall.py, round 4); the
    lockstep XLA path is measured alongside as a sub-record.  The
    block-partitioned multi-host variant is
    `parallel.coordinate_sharded_lbfgsb_minimize` (virtual-mesh tests +
    __graft_entry__.dryrun_multichip)."""
    import optimization_solvers_tpu as ost

    n, rows, B = 10_000 // SCALE, 512, 64
    key = jax.random.PRNGKey(0)
    A = (jax.random.normal(key, (rows, n)) / np.sqrt(n)).astype(DTYPE)
    b = jnp.linspace(-1.0, 1.0, rows).astype(DTYPE)
    oracle = make_oracle(problems.log_sum_exp(A, b))
    lower = jnp.full((n,), -1.0, DTYPE)
    upper = jnp.full((n,), 1.0, DTYPE)
    from optimization_solvers_tpu.solvers.lbfgsb import lbfgsb_batch_minimize

    def lse(x, A_, b_):
        z = A_ @ x + b_
        mx = jnp.max(z)
        return mx + jnp.log(jnp.sum(jnp.exp(z - mx)))

    def solve(x):
        return ost.minimize(lse, x, method="lbfgsb", bounds=(-1.0, 1.0),
                            data=(A, b), m=10, pgtol=1e-5, factr=1e3,
                            max_iter=200)

    cfg = LbfgsbConfig(m=10, pgtol=1e-5, factr=1e3, max_iter=200,
                       lockstep_unroll=int(os.environ.get("BENCH_UNROLL", 1)))
    solve_lockstep = jax.jit(
        lambda x0: lbfgsb_batch_minimize(oracle, x0, lower, upper, cfg))

    rng = np.random.RandomState(4)
    inputs = [jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)), DTYPE)
              for _ in range(REPEATS + 1)]
    _fence(solve(inputs[0]))
    _fence(solve_lockstep(inputs[0]))
    (ts, ts_lk), (r, r_lk) = _timed_interleaved(
        [solve, solve_lockstep], inputs[1:])
    dt = statistics.median(ts)
    cpu = _scipy_lse_baseline(np.asarray(A, np.float64),
                              np.asarray(b, np.float64))
    sps = B / dt

    # round 5 (VERDICT item 3): the RECORDED operating point moves to
    # B=512 — at B=64 the ~34 ms relay dispatch floor is ~2/3 of the wall
    # (ROOFLINE.json["tall_kernel"]), so the B=64 number understates the
    # kernel ~2x (measured: 1,136 -> 2,086 -> 2,442 solves/s at
    # 64/256/512).  B=64 stays as a sub-record for cross-round
    # continuity.
    B2 = 512 if SCALE == 1 else max(4, 512 // SCALE)
    inputs2 = [jnp.asarray(rng.uniform(-0.5, 0.5, (B2, n)), DTYPE)
               for _ in range(REPEATS + 1)]
    _fence(solve(inputs2[0]))
    ts2, r2 = _timed(solve, inputs2[1:])
    sps2 = B2 / statistics.median(ts2)

    return {
        "metric": "config4_lbfgsb_lse10k_batch512",
        "value": round(sps2, 2), "unit": "solves/s",
        "batch": B2,
        "solves_per_sec_spread": _spread([B2 / t for t in ts2]),
        "vs_baseline": round(sps2 / cpu, 2) if cpu == cpu else None,
        "baseline_cpu_solves_per_sec": round(cpu, 4),
        "converged_fraction": float((np.asarray(r2.status) == 1).mean()),
        "median_iterations": float(np.median(np.asarray(r2.iterations))),
        "median_final_f": float(np.median(np.asarray(r2.f))),
        "b64": {
            "solves_per_sec": round(sps, 2),
            "solves_per_sec_spread": _spread([B / t for t in ts]),
            "vs_baseline": round(sps / cpu, 2) if cpu == cpu else None,
            "converged_fraction": float(
                (np.asarray(r.status) == 1).mean()),
            "median_iterations": float(
                np.median(np.asarray(r.iterations))),
            "median_final_f": float(np.median(np.asarray(r.f))),
        },
        "lockstep_xla_b64": {
            "solves_per_sec": round(B / statistics.median(ts_lk), 2),
            "solves_per_sec_spread": _spread([B / t for t in ts_lk]),
            "converged_fraction": float(
                (np.asarray(r_lk.status) == 1).mean()),
            "median_iterations": float(
                np.median(np.asarray(r_lk.iterations))),
            "median_final_f": float(np.median(np.asarray(r_lk.f))),
        },
        "path": "general_api_fused_tall_auto",
    }


def _scipy_lse_baseline(A, b, samples=2):
    try:
        from scipy.optimize import fmin_l_bfgs_b
        from scipy.special import logsumexp
    except ImportError:
        return float("nan")
    n = A.shape[1]

    def fg(x):
        z = A @ x + b
        m = z.max()
        e = np.exp(z - m)
        s = e.sum()
        return m + np.log(s), A.T @ (e / s)

    rng = np.random.RandomState(4)
    bounds = [(-1.0, 1.0)] * n
    t0 = time.perf_counter()
    for _ in range(samples):
        fmin_l_bfgs_b(fg, rng.uniform(-0.5, 0.5, n), bounds=bounds, m=10,
                      pgtol=1e-5, factr=1e3, maxiter=200)
    return samples / (time.perf_counter() - t0)


def bench_config5():
    """Projected Newton on a 1024-dim box-constrained quadratic-plus-coupling
    batch (64 instances): the per-iteration cost is the batched (n, n)
    Cholesky riding the MXU — at n=1024 the XLA blocked factorization is the
    right design (BENCH_NOTES round 1)."""
    from optimization_solvers_tpu import linesearch as ls, solvers

    n, B = 1024 // SCALE, max(2, 64 // SCALE)
    d_np = np.linspace(1.0, 10.0, n)
    d = jnp.asarray(d_np, DTYPE)

    def f(x):
        # separable quadratic + smooth coupling => dense SPD Hessian
        return 0.5 * jnp.sum(d * x * x) + 0.1 * jnp.sum(x) ** 2 / n

    # analytic-oracle seam (the reference's own oracle model,
    # func_eval.rs:5-41): value/grad via AD, the constant dense Hessian
    # supplied analytically — the AD hessian would re-derive it every
    # iteration at n forward-over-reverse passes
    from optimization_solvers_tpu.core.oracle import Oracle
    from optimization_solvers_tpu.core.types import FuncEval

    H_const = jnp.diag(d) + (0.2 / n) * jnp.ones((n, n), DTYPE)
    _vg = jax.value_and_grad(f)

    def full(x):
        fv, g = _vg(x)
        return FuncEval(fv, g, H_const)

    oracle = Oracle(full, value_fn=f)
    lower = jnp.full((n,), -2.0, DTYPE)
    upper = jnp.full((n,), 2.0, DTYPE)
    method = solvers.ProjectedNewton(grad_tol=1e-4)

    def solve(x):
        return solvers.batch_minimize(
            method, ls.BackTrackingB(), oracle, x, bounds=(lower, upper),
            max_iter=50)

    rng = np.random.RandomState(5)
    inputs = [jnp.asarray(rng.uniform(-2, 2, (B, n)), DTYPE)
              for _ in range(REPEATS + 1)]
    _fence(solve(inputs[0]))
    ts, r = _timed(solve, inputs[1:])
    dt = statistics.median(ts)

    # round 5 (VERDICT item 5): B=256 operating point — the batch sweep
    # (CONFIG5_ATTRIBUTION.json) peaks there (~2x the B=64 throughput);
    # B=64 underfills the chip on this one-Cholesky workload
    B2 = 256 if SCALE == 1 else max(4, 256 // SCALE)
    inputs2 = [jnp.asarray(rng.uniform(-2, 2, (B2, n)), DTYPE)
               for _ in range(REPEATS + 1)]
    _fence(solve(inputs2[0]))
    ts2, r2 = _timed(solve, inputs2[1:])
    dt2 = statistics.median(ts2)

    # single-core numpy Newton twin (one instance, same iteration count)
    H = np.diag(d_np) + 0.2 / n * np.ones((n, n))
    x = rng.uniform(-2, 2, n)
    med_it = max(1.0, float(np.median(np.asarray(r.iterations))))
    t0 = time.perf_counter()
    g = H @ x
    np.clip(x - np.linalg.solve(H, g), -2.0, 2.0)
    per_it = time.perf_counter() - t0
    cpu = 1.0 / (per_it * med_it)
    sps = B / dt

    # round 5 (VERDICT item 5): non-degenerate companion — the quadratic
    # converges in ONE Newton step, so the main record barely exercises
    # the solver loop.  A log-barrier-regularized quadratic (x-dependent
    # analytic Hessian) runs a real multi-iteration Newton loop on the
    # same (B, n, n) Cholesky core.
    mu = 0.05

    def fb(x):
        return (0.5 * jnp.sum(d * x * x) + 0.1 * jnp.sum(x) ** 2 / n
                - mu * jnp.sum(jnp.log(4.0 - x * x)))

    _vgb = jax.value_and_grad(fb)

    def fullb(x):
        fv, g = _vgb(x)
        hd = d + 2.0 * mu * (4.0 + x * x) / ((4.0 - x * x) ** 2)
        Hx = jnp.diag(hd) + (0.2 / n) * jnp.ones((n, n), DTYPE)
        return FuncEval(fv, g, Hx)

    oracle_b = Oracle(fullb, value_fn=fb)

    def solve_b(x):
        return solvers.batch_minimize(
            method, ls.BackTrackingB(), oracle_b, x,
            bounds=(lower, upper), max_iter=50)

    # starts hugging the barrier walls: Newton needs several damped steps
    # before the quadratic basin (median_iterations > 1 by construction)
    inputs_b = [jnp.asarray(rng.uniform(-1.97, 1.97, (B, n)), DTYPE)
                for _ in range(REPEATS + 1)]
    _fence(solve_b(inputs_b[0]))
    tbs, rb = _timed(solve_b, inputs_b[1:])
    dtb = statistics.median(tbs)
    companion = {
        "workload": "log-barrier-regularized quadratic (analytic "
                    "x-dependent Hessian), same (B, n, n) Cholesky core",
        "solves_per_sec": round(B / dtb, 2),
        "solves_per_sec_spread": _spread([B / t for t in tbs]),
        "median_iterations": float(np.median(np.asarray(rb.iterations))),
        "converged_fraction": float((np.asarray(rb.status) == 1).mean()),
        "median_final_f": float(np.median(np.asarray(rb.f))),
    }

    sps2 = B2 / dt2
    return {
        "metric": "config5_projected_newton_n1024_batch256",
        "value": round(sps2, 2), "unit": "solves/s",
        "batch": B2,
        "solves_per_sec_spread": _spread([B2 / t for t in ts2]),
        "vs_baseline": round(sps2 / cpu, 2) if cpu == cpu else None,
        "baseline_cpu_solves_per_sec": round(cpu, 2),
        "converged_fraction": float((np.asarray(r2.status) == 1).mean()),
        "median_iterations": max(1.0, float(
            np.median(np.asarray(r2.iterations)))),
        "b64": {
            "solves_per_sec": round(sps, 2),
            "solves_per_sec_spread": _spread([B / t for t in ts]),
            "vs_baseline": round(sps / cpu, 2) if cpu == cpu else None,
            "converged_fraction": float(
                (np.asarray(r.status) == 1).mean()),
            "median_iterations": med_it,
        },
        "companion_barrier": companion,
        "path": "general_api_lockstep_xla",
    }


_CONFIG_BENCHES = {1: bench_config1, 2: bench_config2, 3: bench_config3,
                   4: bench_config4, 5: bench_config5,
                   6: bench_config1_tpu}  # --config 6: config-1 TPU story


def main():
    if "--config" in sys.argv:
        idx = int(sys.argv[sys.argv.index("--config") + 1])
        if idx == 1:
            # config 1 is the reference's CPU-runnable anchor (single tiny
            # instances, sequential): its home is the CPU backend — on TPU
            # through the serving tunnel every solve pays ~30 ms dispatch
            # round-trip, which measures the relay, not the framework
            jax.config.update("jax_platforms", "cpu")
        bench_fn = _CONFIG_BENCHES[idx]
        last = None
        for _ in range(3):  # transient tunnel UNAVAILABLEs
            try:
                rec = bench_fn()
                break
            except Exception as exc:
                last = exc
        else:
            raise last
        rec["device"] = jax.devices()[0].device_kind
        print(json.dumps(rec))
        return
    use_unfused = "--unfused" in sys.argv
    last = None
    for _ in range(3):  # the remote tunnel throws transient UNAVAILABLEs
        try:
            if use_unfused:
                sps_one, median_f, conv_frac = bench_unfused()
                sps, cpu_sps = [sps_one], [bench_cpu_baseline()]
            else:
                sps, cpu_sps, median_f, conv_frac = bench_fused()
            break
        except Exception as exc:
            last = exc
    else:
        raise last
    dev = _spread(sps)
    cpu = _spread(cpu_sps)
    vs = dev["median"] / cpu["median"] if cpu["median"] == cpu["median"] else None
    print(json.dumps({
        "metric": "solves_per_sec_rosenbrock100_lbfgsb_batch10k",
        "value": dev["median"],
        "unit": "solves/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "median_final_f": median_f,
        "converged_fraction": conv_frac,
        "baseline_cpu_solves_per_sec": cpu["median"],
        # run-to-run spread over interleaved device/CPU repeats: deltas
        # inside the MAD band are noise, not progress (BENCH_NOTES round 3)
        "solves_per_sec_spread": dev,
        "baseline_cpu_spread": cpu,
        "path": "unfused" if use_unfused else "fused_pallas",
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
