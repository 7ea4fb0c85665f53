"""Real-TPU validation of the f32x2 (double-float) precision stage.

Three questions only hardware can answer (the CPU suite compiles through a
different XLA backend whose algebraic simplifier we already had to defend
against — core/df.py ``launder_constants``):

  1. Does the df jaxpr interpreter keep ~1e-13 gradient accuracy through
     the TPU compiler?  (vs f32 autodiff on-chip, with CPU-x64 ground
     truth computed host-side)
  2. Does the config-2 pipeline (fused f32 BFGS+MT solve -> df polish)
     reach converged_fraction >= 0.9 at grad_tol 1e-6 on-chip?
  3. What does the polish stage cost relative to the f32 bulk solve?

Writes DF_TPU_PROBE.json at the repo root.  Run on the TPU box:
    python tools/df_tpu_probe.py          # ~5-10 min (first compiles)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optimization_solvers_tpu.core import df                      # noqa: E402
from optimization_solvers_tpu.core.df_interp import (             # noqa: E402
    df_value_and_grad)


def rosen(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                   + (1.0 - x[:-1]) ** 2)


def fence(tree):
    """Force device completion via readback (CLAUDE.md: block_until_ready
    returns early through the relay)."""
    return jax.tree.map(lambda a: np.asarray(a), tree)


def main():
    out = {"device": str(jax.devices()[0]).split(":")[0],
           "backend": jax.default_backend()}
    rng = np.random.RandomState(0)
    n = 100

    # --- 1. interpreter accuracy on-chip --------------------------------
    x64 = rng.uniform(-2, 2, (64, n))
    xdf = df.from_f64(x64)
    x64r = df.to_f64(xdf)                   # representable ground point
    vg = jax.jit(jax.vmap(df_value_and_grad(rosen, jnp.zeros(n, jnp.float32))))
    t0 = time.time()
    fv, gv = fence(vg(xdf))
    out["interp_compile_run_s"] = round(time.time() - t0, 1)
    # f64 ground truth host-side: analytic Rosenbrock gradient in numpy
    def grad_np(x):
        g = np.zeros_like(x)
        t = x[:, 1:] - x[:, :-1] ** 2
        g[:, 1:] += 200.0 * t
        g[:, :-1] += -400.0 * t * x[:, :-1] - 2.0 * (1.0 - x[:, :-1])
        return g
    g_true = grad_np(np.asarray(x64r, np.float64))
    df_g = np.asarray(gv.hi, np.float64) + np.asarray(gv.lo, np.float64)
    out["df_grad_max_abs_err_on_tpu"] = float(np.max(np.abs(df_g - g_true)))
    g32 = np.asarray(jax.jit(jax.vmap(jax.grad(rosen)))(
        jnp.asarray(x64r, jnp.float32)), np.float64)
    out["f32_grad_max_abs_err_on_tpu"] = float(np.max(np.abs(g32 - g_true)))
    print("interp:", json.dumps(out), flush=True)

    # --- 2+3. config-2-class pipeline on-chip ---------------------------
    import optimization_solvers_tpu as ost

    B = 1024
    x0 = jnp.asarray(rng.uniform(-2, 2, (B, n)), jnp.float32)
    t0 = time.time()
    r = ost.minimize(rosen, x0, method="bfgs", tol=1e-4, max_iter=2000)
    r = jax.tree.map(lambda a: a if a is None else np.asarray(a), r)
    stage1_s = time.time() - t0
    out["stage1_wall_s_incl_compile"] = round(stage1_s, 1)
    t0 = time.time()
    r2 = ost.minimize(rosen, x0, method="bfgs", tol=1e-4, max_iter=2000)
    r2 = jax.tree.map(lambda a: a if a is None else np.asarray(a), r2)
    out["stage1_wall_s"] = round(time.time() - t0, 3)
    out["stage1_success"] = float(np.mean(np.isin(r.status, (1, 6))))

    from optimization_solvers_tpu.solvers.df_polish import df_polish_minimize
    t0 = time.time()
    res = fence(df_polish_minimize(rosen, jnp.asarray(r.x), grad_tol=1e-6,
                                   max_iter=200))
    out["polish_wall_s_incl_compile"] = round(time.time() - t0, 1)
    t0 = time.time()
    res = fence(df_polish_minimize(rosen, jnp.asarray(r.x), grad_tol=1e-6,
                                   max_iter=200))
    out["polish_wall_s"] = round(time.time() - t0, 3)
    st = np.asarray(res.status)
    out["polish_converged_fraction"] = float(np.mean(st == 1))
    out["polish_median_iters"] = float(np.median(res.iterations))
    out["polish_p90_iters"] = float(np.percentile(res.iterations, 90))
    # true-f64 certificate check, host-side analytic gradient
    xf = np.asarray(res.x.hi, np.float64) + np.asarray(res.x.lo, np.float64)
    g_t = grad_np(xf)
    pg_true = np.max(np.abs(g_t), axis=1)
    out["true_pg_max_over_certified"] = float(
        pg_true[st == 1].max()) if (st == 1).any() else None
    out["cost_factor_polish_vs_stage1"] = round(
        out["polish_wall_s"] / max(out["stage1_wall_s"], 1e-9), 2)

    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "DF_TPU_PROBE.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
