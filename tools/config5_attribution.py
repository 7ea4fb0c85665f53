"""Config-5 attribution (round 5, VERDICT item 5): where does the batched
projected-Newton n=1024 workload spend its time, and which operating point
clears the 100x north-star line?

Sections (all on the real chip; writes CONFIG5_ATTRIBUTION.json):
  1. component timings — bare batched Cholesky, the two triangular solves,
     the full direction, the line search — each separately jitted and
     fenced, at B=64.  This is the op-level attribution BENCH_NOTES lacked.
  2. practical MXU peak — a (B, n, n) @ (B, n, n) f32 batched matmul rate,
     so Cholesky efficiency is reported against what the chip actually
     sustains, not a datasheet number.
  3. batch-size sweep — end-to-end config-5 solves/s at B in {64, 128,
     256, 512}; the recorded r04 point (B=64, 2,318 solves/s = 98.24x)
     amortizes dispatch poorly.

Run:  python tools/config5_attribution.py       (~10-20 min, TPU box)
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

N = 1024
REPEATS = 3
DTYPE = jnp.float32


def fence(x):
    # device-side reduce + 4-byte readback: np.asarray of a big leaf would
    # TRANSFER it through the relay (~50 s for a (64, 1024, 1024) L — the
    # first version of this tool measured exactly that and attributed it
    # to Cholesky)
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf))


def timed(fn, inputs):
    fence(fn(inputs[0]))               # compile + warm on the first input
    ts = []
    out = None
    for x in inputs[1:]:
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        out = fn(x)
        fence(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), out


def make_problem(B):
    d_np = np.linspace(1.0, 10.0, N)
    d = jnp.asarray(d_np, DTYPE)

    def f(x):
        return 0.5 * jnp.sum(d * x * x) + 0.1 * jnp.sum(x) ** 2 / N

    H_const = jnp.diag(d) + (0.2 / N) * jnp.ones((N, N), DTYPE)
    rng = np.random.RandomState(5)
    xs = [jnp.asarray(rng.uniform(-2, 2, (B, N)), DTYPE)
          for _ in range(REPEATS + 1)]
    return f, H_const, xs


def main():
    out = {"device": str(jax.devices()[0]).split(":")[0], "n": N}

    # ---- 1. component timings at B=64 ---------------------------------
    B = 64
    f, H, xs = make_problem(B)
    Hb = jnp.broadcast_to(H, (B, N, N))
    gs = [jax.vmap(jax.grad(f))(x) for x in xs]

    chol = jax.jit(lambda Hb: jnp.linalg.cholesky(Hb))
    t_chol, L = timed(chol, [Hb + 0.0 * g[:, :1, None] for g in gs])

    tri = jax.jit(lambda args: jax.scipy.linalg.solve_triangular(
        args[0], args[1], lower=True))
    Ls = [chol(Hb + 0.0 * g[:, :1, None]) for g in gs]
    t_tri, _ = timed(tri, [(L_, g[..., None]) for L_, g in zip(Ls, gs)])

    from optimization_solvers_tpu.ops.linalg import cholesky_solve

    direction = jax.jit(lambda args: cholesky_solve(args[0], args[1]))
    t_dir, _ = timed(direction, [(Hb + 0.0 * g[:, :1, None], g)
                                 for g in gs])

    chol_flops = B * N ** 3 / 3.0
    out["components_B64"] = {
        "cholesky_ms": round(t_chol * 1e3, 2),
        "cholesky_gflops": round(chol_flops / t_chol / 1e9, 1),
        "one_triangular_solve_ms": round(t_tri * 1e3, 2),
        "full_direction_ms": round(t_dir * 1e3, 2),
    }

    # ---- 2. practical MXU peak ----------------------------------------
    A = jnp.asarray(np.random.RandomState(0).normal(size=(8, N, N)), DTYPE)
    Bm = jnp.asarray(np.random.RandomState(1).normal(size=(8, N, N)), DTYPE)
    mm = jax.jit(lambda a, b: jnp.einsum(
        "bij,bjk->bik", a, b, precision=jax.lax.Precision.HIGHEST))
    fence(mm(A, Bm))
    ts_mm = []
    for i in range(REPEATS):
        # distinct inputs per repeat (the relay memoizes identical
        # dispatches); scaling by a fresh host scalar is cheap
        Ai = A * (1.0 + 1e-6 * (i + 1))
        jax.block_until_ready(Ai)
        t0 = time.perf_counter()
        fence(mm(Ai, Bm))
        ts_mm.append(time.perf_counter() - t0)
    t_mm = statistics.median(ts_mm)
    mm_rate = 8 * 2 * N ** 3 / t_mm
    out["practical_f32_matmul_gflops"] = round(mm_rate / 1e9, 1)
    out["cholesky_efficiency_vs_matmul"] = round(
        (chol_flops / t_chol) / mm_rate, 3)

    # ---- 3. batch-size sweep of the full config-5 solve ---------------
    from optimization_solvers_tpu import linesearch as ls, solvers
    from optimization_solvers_tpu.core.oracle import Oracle
    from optimization_solvers_tpu.core.types import FuncEval

    sweep = {}
    for Bs in (64, 128, 256, 512):
        f, H_const, xs = make_problem(Bs)
        _vg = jax.value_and_grad(f)

        def full(x, _H=H_const, _vg=_vg):
            fv, g = _vg(x)
            return FuncEval(fv, g, _H)

        oracle = Oracle(full, value_fn=f)
        lower = jnp.full((N,), -2.0, DTYPE)
        upper = jnp.full((N,), 2.0, DTYPE)
        method = solvers.ProjectedNewton(grad_tol=1e-4)

        def solve(x, _o=oracle, _m=method):
            return solvers.batch_minimize(
                _m, ls.BackTrackingB(), _o, x,
                bounds=(lower, upper), max_iter=50)

        try:
            dt, r = timed(solve, xs)
            sweep[Bs] = {
                "solves_per_sec": round(Bs / dt, 1),
                "wall_ms": round(dt * 1e3, 1),
                "converged_fraction": float(
                    (np.asarray(r.status) == 1).mean()),
            }
            print(f"B={Bs}: {sweep[Bs]}", flush=True)
        except Exception as e:  # OOM at large B is a finding, not a crash
            sweep[Bs] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
            print(f"B={Bs}: {sweep[Bs]}", flush=True)
    out["batch_sweep"] = sweep

    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CONFIG5_ATTRIBUTION.json"),
            "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
