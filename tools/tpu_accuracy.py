"""TPU accuracy-parity study (reference-tolerance anchors on real TPU f32).

The reference crate's correctness anchors are f64 CPU runs asserting
``|f(x_final) - f*| < 1e-6`` (``/root/reference/examples/quadratic.rs:43``,
``src/steepest_descent/gradient_descent.rs:86-179``).  This tool runs the
same anchor problems through THIS framework's batched kernels on whatever
device JAX sees (the real TPU chip in f32 by default; ``--cpu`` re-runs the
set on CPU x64 for the comparison column) and records, per anchor, the
achieved ``|f - f*|`` and whether the reference tolerance was hit.

Results land in ``tpu_accuracy_<backend>.json``; ``--write-doc`` merges the
TPU and CPU JSONs into ``docs/tpu_accuracy.md``.

Run on the TPU box:

    python tools/tpu_accuracy.py                # f32 on the real chip
    python tools/tpu_accuracy.py --cpu          # x64 CPU twin
    python tools/tpu_accuracy.py --write-doc    # emit the markdown table
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_TOL = 1e-6  # the reference's assert threshold (quadratic.rs:43)


def build_anchors(jnp, solvers, ls):
    """The reference anchor set: every examples/*.rs objective plus the
    gradient_descent.rs gamma-90 test pair.  Each entry: (name, f, x0,
    bounds, f*, method, search, max_iter)."""
    e = jnp.exp

    def gamma90(x):
        return 0.5 * (x[0] ** 2 + 90.0 * x[1] ** 2)

    def expbowl(x):
        return x[0] ** 2 + x[1] ** 2 + e(x[0] ** 2 + x[1] ** 2)

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    A = [
        # gradient_descent.rs:86-179 test pair (tol 1e-12 in the reference;
        # grad_tol here is the f32-feasible equivalent)
        ("gd_bt_gamma90", gamma90, [180.0, 152.0], None, 0.0,
         solvers.GradientDescent(grad_tol=1e-6), ls.BackTracking(c1=1e-4),
         2000),
        ("gd_mt_gamma90", gamma90, [180.0, 152.0], None, 0.0,
         solvers.GradientDescent(grad_tol=1e-6), ls.MoreThuente(), 2000),
        # examples/*.rs anchors
        ("gradient_descent", lambda x: x[0] ** 2 + 2.0 * x[1] ** 2,
         [10.0, -10.0], None, 0.0,
         solvers.GradientDescent(grad_tol=1e-6),
         ls.BackTracking(c1=1e-4), 500),
        ("coordinate_descent",
         lambda x: x[0] ** 2 + 2.0 * x[1] ** 2 + 3.0 * x[2] ** 2,
         [10.0, -5.0, 4.0], None, 0.0,
         solvers.CoordinateDescent(grad_tol=1e-6), ls.BackTracking(), 4000),
        ("pnorm_descent", lambda x: x[0] ** 2 + 4.0 * x[1] ** 2,
         [15.0, -7.0], None, 0.0,
         solvers.PnormDescent(
             grad_tol=1e-6,
             inverse_p=jnp.linalg.inv(
                 jnp.array([[2.0, 0.0], [0.0, 8.0]]))),
         ls.BackTracking(), 500),
        ("newton_exp", expbowl, [1.0, 1.5], None, 1.0,
         solvers.Newton(tol=1e-6), ls.MoreThuente(), 200),
        ("bfgs",
         lambda x: (x[0] ** 2 + 2.0 * x[1] ** 2 + 3.0 * x[2] ** 2
                    + x[0] * x[1] + x[1] * x[2]),
         [10.0, -8.0, 6.0], None, 0.0,
         solvers.BFGS(tol=1e-6), ls.MoreThuente(), 300),
        ("dfp", lambda x: x[0] ** 2 + 5.0 * x[1] ** 2 + x[0] * x[1],
         [5.0, -5.0], None, 0.0,
         solvers.DFP(tol=1e-6), ls.MoreThuente(), 400),
        ("broyden", lambda x: x[0] ** 2 + 3.0 * x[1] ** 2 + 2.0 * x[0] * x[1],
         [4.0, 3.0], None, 0.0,
         solvers.Broyden(tol=1e-6), ls.MoreThuente(), 400),
        ("quadratic_M90", lambda x: x @ (jnp.array(
            [[1.0, 0.0], [0.0, 90.0]]) @ x),
         [180.0, 152.0], None, 0.0,
         solvers.BFGS(tol=1e-6), ls.MoreThuente(), 300),
        ("projected_gradient",
         lambda x: (x[0] - 2.0) ** 2 + (x[1] - 3.0) ** 2,
         [5.0, 5.0], ([0.0, 0.0], [1.0, 1.0]), 5.0,
         solvers.ProjectedGradientDescent(grad_tol=1e-6),
         ls.BackTrackingB(), 1000),
        ("spg_expbowl", expbowl, [0.9, -0.8],
         ([-1.0, -1.0], [1.0, 1.0]), 1.0,
         solvers.SpectralProjectedGradient(grad_tol=1e-6),
         ls.GLLQuadratic(c1=1e-4, m=10), 1500),
        ("spn_expbowl", expbowl, [0.9, -0.8],
         ([-1.0, -1.0], [1.0, 1.0]), 1.0,
         solvers.SpectralProjectedNewton(grad_tol=1e-6),
         ls.BackTrackingB(), 1500),
        # the opt-in Newton-metric BB pair (PARITY.md L3): same anchor,
        # shows the lambda-freeze fix also certifies the f32 stop
        ("spn_expbowl_pbb", expbowl, [0.9, -0.8],
         ([-1.0, -1.0], [1.0, 1.0]), 1.0,
         solvers.SpectralProjectedNewton(grad_tol=1e-6, precond_bb=True),
         ls.BackTrackingB(), 1500),
        ("bfgs_bounded",
         lambda x: x[0] ** 2 + 2.0 * x[1] ** 2 + x[0] * x[1],
         [1.5, 1.5], ([0.0, 0.0], [2.0, 2.0]), 0.0,
         solvers.BFGSB(tol=1e-6), ls.MoreThuenteB(), 800),
        ("sr1_bounded",
         lambda x: x[0] ** 2 + 3.0 * x[1] ** 2 + x[0] * x[1],
         [0.9, 0.9], ([-1.0, -1.0], [1.0, 1.0]), 0.0,
         solvers.SR1B(tol=1e-6), ls.MoreThuenteB(), 800),
        ("dfp_bounded",
         lambda x: x[0] ** 2 + 4.0 * x[1] ** 2 + x[0] * x[1],
         [1.2, 1.2], ([0.0, 0.0], [1.5, 1.5]), 0.0,
         solvers.DFPB(tol=1e-6), ls.MoreThuenteB(), 800),
        ("broyden_bounded",
         lambda x: x[0] ** 2 + 2.0 * x[1] ** 2 + x[0] * x[1],
         [0.8, 0.8], ([0.0, 0.0], [1.0, 1.0]), 0.0,
         solvers.BroydenB(tol=1e-6), ls.MoreThuenteB(), 800),
        ("lbfgs_rosen16", rosen, [-1.2] * 16, None, 0.0,
         solvers.LBFGS(tol=1e-6, m=5), ls.HagerZhang(), 2000),
    ]
    return A


def run_backend(cpu_x64: bool):
    import jax

    if cpu_x64:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import jax.numpy as jnp
    import numpy as np

    from optimization_solvers_tpu import linesearch as ls, solvers
    from optimization_solvers_tpu.core.oracle import make_oracle
    from optimization_solvers_tpu.core.types import Status
    from optimization_solvers_tpu.ops.pallas_driver import fused_supported
    from optimization_solvers_tpu.solvers.driver import batch_minimize
    from optimization_solvers_tpu.solvers.lbfgsb import (
        LbfgsbConfig, lbfgsb_minimize)
    from optimization_solvers_tpu.ops.pallas_lbfgsb import lbfgsb_solve_fused

    dev = jax.devices()[0]
    backend = "cpu_x64" if cpu_x64 else str(dev.platform)
    dtype = jnp.float64 if cpu_x64 else jnp.float32
    B = 8  # lanes (replicated x0; fused kernels pad to their tile)

    records = []
    for (name, f, x0l, bounds, f_star, method, search,
         max_iter) in build_anchors(jnp, solvers, ls):
        x0 = jnp.asarray(x0l, dtype)
        n = x0.shape[0]
        xb = jnp.broadcast_to(x0, (B, n))
        b = None
        if bounds is not None:
            b = (jnp.asarray(bounds[0], dtype), jnp.asarray(bounds[1], dtype))
        needs_h = getattr(method, "needs_hessian", False)
        oracle = make_oracle(f, with_hessian=needs_h)
        fused = fused_supported(method, search)
        t0 = time.time()
        try:
            res = batch_minimize(
                method, search, oracle, xb, bounds=b,
                fused="auto" if fused else False, max_iter=max_iter)
            path = "fused" if (fused and not cpu_x64) else "lockstep_xla"
        except Exception as exc:  # record, don't abort the sweep
            records.append(dict(name=name, backend=backend, error=str(exc)))
            print(f"[{backend}] {name}: ERROR {exc}", flush=True)
            continue
        f0 = float(np.asarray(res.f)[0])  # readback fences the device
        wall = time.time() - t0
        err = abs(f0 - f_star)
        rec = dict(
            name=name, backend=backend, n=n,
            method=type(method).__name__, search=type(search).__name__,
            path=path,
            status=Status(int(np.asarray(res.status)[0])).name,
            iterations=int(np.asarray(res.iterations)[0]),
            f_err=err, hit_ref_tol=bool(err < REF_TOL),
            pg_norm=float(np.asarray(res.pg_norm)[0])
            if res.pg_norm is not None else None,
            wall_s=round(wall, 2),
        )
        records.append(rec)
        print(f"[{backend}] {name}: f_err={err:.3e} "
              f"{'HIT' if rec['hit_ref_tol'] else 'miss'} "
              f"({rec['status']}, {rec['iterations']} it, {path})",
              flush=True)

    # L-BFGS-B anchor (dedicated kernel; the reference's Fortran FFI twin)
    name = "lbfgsb_rosen25"
    rosen = build_anchors(jnp, solvers, ls)[-1][1]
    n = 25
    x0 = jnp.full((n,), -1.2, dtype)
    lo = jnp.full((n,), -2.0, dtype)
    hi = jnp.full((n,), 2.0, dtype)
    t0 = time.time()
    if cpu_x64:
        res = lbfgsb_minimize(
            make_oracle(rosen), x0, lo, hi,
            LbfgsbConfig(m=10, pgtol=1e-7, factr=10.0, max_iter=1000))
        f0 = float(np.asarray(res.f))
        it = int(np.asarray(res.iterations))
        st = Status(int(np.asarray(res.status))).name
        pg = float(np.asarray(res.pg_norm))
        path = "xla_single"
    else:
        res = lbfgsb_solve_fused(
            rosen, jnp.broadcast_to(x0, (B, n)), lo, hi,
            m=10, pgtol=1e-6, factr=10.0, max_iter=1000, tile=8)
        f0 = float(np.asarray(res.f)[0])
        it = int(np.asarray(res.iterations)[0])
        st = Status(int(np.asarray(res.status)[0])).name
        pg = float(np.asarray(res.pg_norm)[0])
        path = "fused"
    err = abs(f0 - 0.0)
    records.append(dict(
        name=name, backend=backend, n=n, method="Lbfgsb", search="dcsrch",
        path=path, status=st, iterations=it, f_err=err,
        hit_ref_tol=bool(err < REF_TOL), pg_norm=pg,
        wall_s=round(time.time() - t0, 2)))
    print(f"[{backend}] {name}: f_err={err:.3e} "
          f"{'HIT' if err < REF_TOL else 'miss'} ({st}, {it} it, {path})",
          flush=True)

    # frontend-default certification pass (round 4, VERDICT item 4): the
    # rows that hit the VALUE tolerance but burned their budget certifying
    # the f64-strength grad_tol=1e-6 must CONVERGE under the front end's
    # dtype-aware default tol (1e-4 for f32 x0; frontend.py)
    import optimization_solvers_tpu as ost

    anchors = {a[0]: a for a in build_anchors(jnp, solvers, ls)}
    by_name = {r["name"]: r for r in records if "name" in r}
    fe_cases = [
        ("spn_expbowl", "spn", {}),
        ("spn_expbowl_pbb", "spn", {"precond_bb": True}),
        ("lbfgs_rosen16", "lbfgs", {"m": 5}),
    ]
    for name, fe_method, opts in fe_cases:
        _, f, x0l, bounds, f_star, _, _, max_iter = anchors[name]
        xb = jnp.broadcast_to(jnp.asarray(x0l, dtype),
                              (B, len(x0l)))
        kw = dict(max_iter=max_iter, **opts)
        if bounds is not None:
            kw["bounds"] = (jnp.asarray(bounds[0], dtype),
                            jnp.asarray(bounds[1], dtype))
        res = ost.minimize(f, xb, method=fe_method, **kw)
        st = Status(int(np.asarray(res.status)[0])).name
        err = abs(float(np.asarray(res.f)[0]) - f_star)
        if name in by_name:
            by_name[name]["frontend_default_status"] = st
            by_name[name]["frontend_default_f_err"] = err
            by_name[name]["frontend_default_iterations"] = int(
                np.asarray(res.iterations)[0])
        print(f"[{backend}] {name} via frontend defaults: {st} "
              f"f_err={err:.3e} "
              f"({int(np.asarray(res.iterations)[0])} it)", flush=True)

    # f32x2 strict-tolerance certification pass (round 5, VERDICT item 1):
    # the f64-grade grad_tol=1e-6 certificate on the f32 backend via the
    # double-float polish (precision="f32x2"; docs/f32x2.md) — the
    # resolution of this doc's round-4 "pg ~ 2e-4 certification wall"
    if not cpu_x64:
        for name, m_, opts in [("lbfgs_rosen16", "bfgs", {})]:
            _, f, x0l, bounds, f_star, _, _, max_iter = anchors[name]
            xb = jnp.broadcast_to(jnp.asarray(x0l, dtype), (B, len(x0l)))
            kw = dict(max_iter=max_iter, precision="f32x2", **opts)
            if bounds is not None:
                kw["bounds"] = (jnp.asarray(bounds[0], dtype),
                                jnp.asarray(bounds[1], dtype))
            res = ost.minimize(f, xb, method=m_, **kw)
            st = Status(int(np.asarray(res.status)[0])).name
            err = abs(float(np.asarray(res.f)[0]) - f_star)
            pgv = float(np.asarray(res.pg_norm)[0])
            if name in by_name:
                by_name[name]["f32x2_status"] = st
                by_name[name]["f32x2_pg_norm"] = pgv
                by_name[name]["f32x2_f_err"] = err
            print(f"[{backend}] {name} via precision=f32x2: {st} "
                  f"pg={pgv:.2e} f_err={err:.3e}", flush=True)

    out = os.path.join(REPO, f"tpu_accuracy_{'cpu' if cpu_x64 else 'tpu'}.json")
    with open(out, "w") as fh:
        json.dump(dict(backend=backend, device=str(dev),
                       dtype=str(dtype.__name__), records=records), fh,
                  indent=1)
    print("wrote", out)


def write_doc():
    rows = {}
    meta = {}
    for kind in ("tpu", "cpu"):
        p = os.path.join(REPO, f"tpu_accuracy_{kind}.json")
        if not os.path.exists(p):
            print(f"missing {p} — run the {kind} pass first")
            return
        d = json.load(open(p))
        meta[kind] = d
        for r in d["records"]:
            rows.setdefault(r["name"], {})[kind] = r

    lines = [
        "# TPU accuracy parity (reference anchors, f32 vs f64)",
        "",
        "Per-anchor record of the reference crate's correctness anchors "
        "(`/root/reference/examples/*.rs`, `gradient_descent.rs:86-179`; "
        "each asserts `|f - f*| < 1e-6` in f64) run through this "
        "framework's kernels on the REAL TPU in f32 "
        f"(`{meta['tpu']['device']}`) and on CPU x64.  Generated by "
        "`python tools/tpu_accuracy.py` (+ `--cpu`, `--write-doc`).",
        "",
        "| anchor | method + search | path (TPU) | TPU f32 `\\|f-f*\\|` | hit 1e-6 | CPU x64 `\\|f-f*\\|` | hit 1e-6 | TPU status / iters |",
        "|---|---|---|---|---|---|---|---|",
    ]
    n_hit = n_tot = 0
    for name, d in rows.items():
        t, c = d.get("tpu", {}), d.get("cpu", {})
        if "error" in t or "error" in c:
            lines.append(f"| {name} | — | — | ERROR | — | ERROR | — | "
                         f"{t.get('error', c.get('error'))} |")
            continue
        n_tot += 1
        n_hit += bool(t["hit_ref_tol"])
        st = f"{t['status']} / {t['iterations']}"
        if "frontend_default_status" in t:
            # round-4 dtype-aware frontend default (tol 1e-4 in f32):
            # same anchor certified inside the budget
            st += (f" (frontend defaults: {t['frontend_default_status']}"
                   f" / {t['frontend_default_iterations']})")
        lines.append(
            f"| {name} | {t['method']} + {t['search']} | {t['path']} "
            f"| {t['f_err']:.2e} | {'**yes**' if t['hit_ref_tol'] else 'no'} "
            f"| {c['f_err']:.2e} | {'yes' if c['hit_ref_tol'] else 'no'} "
            f"| {st} |")
    lines += [
        "",
        f"**{n_hit}/{n_tot} anchors hit the reference 1e-6 tolerance on "
        "TPU f32.**  Misses are discussed below.",
        "",
    ]
    x2 = [(nm, d["tpu"]) for nm, d in rows.items()
          if "f32x2_status" in d.get("tpu", {})]
    if x2:
        lines += [
            "Round-5 resolution of the certification wall: the SAME f32 "
            "chip certifies the f64-grade `grad_tol 1e-6` via "
            "`precision=\"f32x2\"` (double-float polish, docs/f32x2.md):",
            "",
        ]
        for nm, t in x2:
            lines.append(
                f"- `{nm}`: {t['f32x2_status']}, pg_norm "
                f"{t['f32x2_pg_norm']:.2e}, `|f-f*|` "
                f"{t['f32x2_f_err']:.2e}")
        lines.append("")
    out = os.path.join(REPO, "docs", "tpu_accuracy.md")
    body = "\n".join(lines)
    if os.path.exists(out):
        # keep any hand-written discussion below the marker
        old = open(out).read()
        marker = "<!-- discussion -->"
        if marker in old:
            body = body + marker + old.split(marker, 1)[1]
        else:
            body = body + marker + "\n"
    else:
        body = body + "<!-- discussion -->\n"
    with open(out, "w") as fh:
        fh.write(body)
    print("wrote", out)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="CPU x64 pass")
    ap.add_argument("--write-doc", action="store_true")
    args = ap.parse_args()
    if args.write_doc:
        write_doc()
    else:
        run_backend(cpu_x64=args.cpu)
