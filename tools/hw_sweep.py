"""Hardware sweep: compile + run EVERY fused (method, search) combo of the
generic kernel (ops/pallas_driver.py) on the real TPU with a small
workload; report pass/fail per combo.

Interpret-mode tests CANNOT catch Mosaic lowering failures (i1 vector
carries, bool selects, replicated-layout reductions, ...), so run this
after any kernel/spec change:

    python tools/hw_sweep.py        # ~10-40 min of remote compiles cold;
                                    # fast when /tmp/jax_cache is warm
"""
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

from optimization_solvers_tpu import linesearch as ls, solvers
from optimization_solvers_tpu.ops.pallas_driver import fused_minimize

DT = jnp.float32
print("device:", jax.devices()[0].device_kind, flush=True)
N, B = 16, 256
d = jnp.asarray(np.linspace(1.0, 40.0, N), DT)

def quad(x, dd):
    return 0.5 * jnp.sum(dd * x * x)

lo = jnp.full(N, -1.5, DT)
hi = jnp.full(N, 2.5, DT)
x0 = jnp.asarray(np.random.RandomState(0).uniform(-1.4, 2.4, (B, N)), DT)

COMBOS = [
    ("GD+BT", solvers.GradientDescent(grad_tol=1e-4), ls.BackTracking(), False),
    ("GD+GLL", solvers.GradientDescent(grad_tol=1e-4), ls.GLLQuadratic(), False),
    ("GD+MT", solvers.GradientDescent(grad_tol=1e-4), ls.MoreThuente(), False),
    ("CD+BT", solvers.CoordinateDescent(grad_tol=1e-4), ls.BackTracking(), False),
    ("PGD+BTB", solvers.ProjectedGradientDescent(grad_tol=1e-4), ls.BackTrackingB(), True),
    ("SPG+GLL", solvers.SpectralProjectedGradient(grad_tol=1e-4), ls.GLLQuadratic(), True),
    ("NCG-pr+BT", solvers.NonlinearCG(grad_tol=1e-4, variant="pr+"), ls.BackTracking(), False),
    ("BFGS+BT", solvers.BFGS(tol=1e-5), ls.BackTracking(), False),
    ("BFGS+MT", solvers.BFGS(tol=1e-5), ls.MoreThuente(), False),
    ("DFP+BT", solvers.DFP(tol=1e-5), ls.BackTracking(), False),
    # Broyden+NoSearch WARNs (conv 0, med_f inf) BY DESIGN: the undamped
    # Broyden update diverges on this cond-40 quadratic on the unfused
    # reference-semantics path too (measured identical) — the sweep keeps
    # the combo for Mosaic lowering coverage of the no-search fast path
    ("Broyden+NoSearch", solvers.Broyden(tol=1e-5), ls.NoSearch(), False),
    ("BFGSB+BTB", solvers.BFGSB(tol=1e-5), ls.BackTrackingB(), True),
    ("BFGSB+MTB", solvers.BFGSB(tol=1e-5), ls.MoreThuenteB(), True),
    ("SR1B+BTB", solvers.SR1B(tol=1e-5), ls.BackTrackingB(), True),
    ("LBFGS+MT", solvers.LBFGS(tol=1e-4, m=5), ls.MoreThuente(), False),
    # opt-in T2 acceptance (closes the f32 near-minimum MT livelock)
    ("LBFGS+MT-aw", solvers.LBFGS(tol=1e-4, m=5), ls.MoreThuente(approx_wolfe=True), False),
    ("LBFGS+HZ", solvers.LBFGS(tol=1e-4, m=5), ls.HagerZhang(), False),
    # fused MINPACK dcsrch (the Fortran L-BFGS-B's own search)
    ("LBFGS+SW", solvers.LBFGS(tol=1e-4, m=5), ls.StrongWolfe(), False),
    ("BFGSB+SWB", solvers.BFGSB(tol=1e-5), ls.StrongWolfe(bounded=True), True),
    ("BFGSB+HZB", solvers.BFGSB(tol=1e-5), ls.HagerZhangB(), True),
    ("LBFGS+BT", solvers.LBFGS(tol=1e-4, m=5), ls.BackTracking(), False),
    ("Newton+NoSearch", solvers.Newton(tol=1e-8), ls.NoSearch(), False),
    ("PN+BTB", solvers.ProjectedNewton(grad_tol=1e-4), ls.BackTrackingB(), True),
    # SPN reports WARN conv ~0.79 here: the unfused (reference-semantics)
    # path measures the same 0.785, and f64 the same again — the
    # reference's gradient-metric BB scalar freezes at the inverse
    # Rayleigh quotient of the Newton ray (geometric rate 1-lambda needs
    # >300 iters at cond 40).  An algorithm property, not a kernel or
    # precision bug; see SpectralProjectedNewton.precond_bb.
    ("SPN+BTB", solvers.SpectralProjectedNewton(grad_tol=1e-4), ls.BackTrackingB(), True),
    # opt-in Newton-metric BB pair: lambda -> 1, converges in ~2 iters
    ("SPN-pbb+BTB", solvers.SpectralProjectedNewton(grad_tol=1e-4, precond_bb=True), ls.BackTrackingB(), True),
    # mixed finite/+-inf bounds: covers Mosaic lowering of infinite bound
    # operands (the XLA chunked Cauchy walk had a NaN bug in exactly this
    # geometry, BENCH_NOTES round 2)
    # opt-in alternating BB1/BB2 (config-3 tail cycling-breaker, round 4)
    ("SPG-abb+GLL", solvers.SpectralProjectedGradient(grad_tol=1e-4, bb_variant="alternate"), ls.GLLQuadratic(), True),
    ("SPG+GLL-mixedinf", solvers.SpectralProjectedGradient(grad_tol=1e-4), ls.GLLQuadratic(), "mixedinf"),
    ("BFGSB+BTB-mixedinf", solvers.BFGSB(tol=1e-5), ls.BackTrackingB(), "mixedinf"),
]

lo_mixed = lo.at[jnp.arange(0, N, 3)].set(-jnp.inf)
hi_mixed = hi.at[jnp.arange(1, N, 3)].set(jnp.inf)

ok = fail = 0
for name, m, s, bounded in COMBOS:
    args = (m, s, quad, x0)
    kw = dict(consts=(d,), max_iter=300, max_iter_ls=30, tile=128)
    if bounded == "mixedinf":
        kw.update(lower=lo_mixed, upper=hi_mixed)
    elif bounded:
        kw.update(lower=lo, upper=hi)
    t0 = time.perf_counter()
    try:
        r = fused_minimize(*args, **kw)
        # success-class = CONVERGED or STALLED (the QN family's honest
        # re-label of the reference's s/y-stall Ok(()) exit, round 4) —
        # the sweep checks kernels LOWER and solve, not KKT certification
        conv = float(np.isin(np.asarray(r.status), (1, 6)).mean())
        medf = float(np.median(np.asarray(r.f)))
        dt = time.perf_counter() - t0
        tag = "OK " if conv > 0.95 else "WARN"
        print(f"{tag} {name}: conv {conv:.2f} med_f {medf:.2e} "
              f"({dt:.0f}s)", flush=True)
        ok += 1
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:150]}", flush=True)
        fail += 1
# per-lane (B, n) boxes through the dedicated L-BFGS-B kernel (round 4
# batch-axis capability): each lane must land on its own box corner
try:
    from optimization_solvers_tpu.ops.pallas_lbfgsb import lbfgsb_solve_fused

    rngpl = np.random.RandomState(2)
    Bpl = 128
    lo_pl = jnp.asarray(rngpl.uniform(-2.0, -1.0, (Bpl, N)), DT)
    hi_pl = jnp.asarray(rngpl.uniform(0.2, 1.2, (Bpl, N)), DT)
    x_pl = jnp.asarray(rngpl.uniform(-0.5, 0.1, (Bpl, N)), DT)

    def quad_sh(x, dd):
        return 0.5 * jnp.sum(dd * (x - 1.5) ** 2)

    t0 = time.perf_counter()
    r = lbfgsb_solve_fused(quad_sh, x_pl, lo_pl, hi_pl, consts=(d,),
                           m=5, pgtol=1e-5, factr=10.0, max_iter=200,
                           tile=128)
    expect = np.clip(1.5, np.asarray(lo_pl), np.asarray(hi_pl))
    okx = float(np.abs(np.asarray(r.x) - expect).max())
    conv = float((np.asarray(r.status) == 1).mean())
    dt_ = time.perf_counter() - t0
    tag = "OK " if conv > 0.95 and okx < 1e-4 else "WARN"
    print(f"{tag} LBFGSB-perlane: conv {conv:.2f} max|x-x*| {okx:.2e} "
          f"({dt_:.0f}s)", flush=True)
    ok += 1
except Exception as e:
    print(f"FAIL LBFGSB-perlane: {type(e).__name__}: {str(e)[:150]}",
          flush=True)
    fail += 1

# the diagonally-preconditioned (scaled) fused wrapper: its sqrt-scale
# rides the consts path as a 1-D array since the consts layout fix
# (round 4) — this is the entry that historically had HW-only layout
# failures (replicated-layout reduction, round 1), so sweep it
try:
    from optimization_solvers_tpu.ops.pallas_lbfgsb import (
        lbfgsb_solve_fused_scaled)

    t0 = time.perf_counter()
    r = lbfgsb_solve_fused_scaled(
        quad, x0[:128], lo, hi, d, consts=(d,), m=5, pgtol=1e-5,
        factr=10.0, max_iter=300, tile=128)
    conv = float((np.asarray(r.status) == 1).mean())
    medf = float(np.median(np.asarray(r.f)))
    dt = time.perf_counter() - t0
    tag = "OK " if conv > 0.95 else "WARN"
    print(f"{tag} LBFGSB-scaled: conv {conv:.2f} med_f {medf:.2e} "
          f"({dt:.0f}s)", flush=True)
    ok += 1
except Exception as e:
    print(f"FAIL LBFGSB-scaled: {type(e).__name__}: {str(e)[:150]}",
          flush=True)
    fail += 1

# dedicated kernels outside the generic driver: the tall-layout large-n
# L-BFGS-B (round 4; segment-bisection GCP) on a bound-active geometry
try:
    from optimization_solvers_tpu.ops.pallas_lbfgsb_tall import (
        lbfgsb_solve_fused_tall)

    t0 = time.perf_counter()
    r = lbfgsb_solve_fused_tall(
        quad, x0[:16], lo, hi, consts=(d,), m=5, pgtol=1e-6, factr=10.0,
        max_iter=300, tile=8)
    conv = float(np.isin(np.asarray(r.status), (1,)).mean())
    medf = float(np.median(np.asarray(r.f)))
    dt = time.perf_counter() - t0
    tag = "OK " if conv > 0.95 else "WARN"
    print(f"{tag} TALL-LBFGSB: conv {conv:.2f} med_f {medf:.2e} ({dt:.0f}s)",
          flush=True)
    ok += 1
except Exception as e:
    print(f"FAIL TALL-LBFGSB: {type(e).__name__}: {str(e)[:150]}", flush=True)
    fail += 1

# round 5: the tall kernel's in-kernel dcsrch strong-Wolfe mode (the
# Fortran pairing) — interpret mode cannot catch its Mosaic lowering
try:
    from optimization_solvers_tpu.ops.pallas_lbfgsb_tall import (
        lbfgsb_solve_fused_tall)

    t0 = time.perf_counter()
    r = lbfgsb_solve_fused_tall(
        quad, x0[:16], lo, hi, consts=(d,), m=5, pgtol=1e-6, factr=10.0,
        max_iter=300, tile=8, line_search="dcsrch")
    conv = float(np.isin(np.asarray(r.status), (1,)).mean())
    medf = float(np.median(np.asarray(r.f)))
    flagged = float(np.asarray(r.gcp_multimodal).mean())
    dt = time.perf_counter() - t0
    tag = "OK " if conv > 0.95 else "WARN"
    print(f"{tag} TALL-LBFGSB-dcsrch: conv {conv:.2f} med_f {medf:.2e} "
          f"gcp_flags {flagged:.2f} ({dt:.0f}s)", flush=True)
    ok += 1
except Exception as e:
    print(f"FAIL TALL-LBFGSB-dcsrch: {type(e).__name__}: {str(e)[:150]}",
          flush=True)
    fail += 1

print(f"SWEEP-DONE ok={ok} fail={fail}", flush=True)
