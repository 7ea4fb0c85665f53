"""One-call front end: ``optimization_solvers_tpu.minimize(f, x0, ...)``.

A convenience entry in the spirit of ``scipy.optimize.minimize`` for users
switching from the reference crate (whose universal entry point is the
solver-object ``minimize`` template, ``/root/reference/src/ls_solver.rs:66``)
or from SciPy: pick a method by NAME, hand in a plain scalar objective, get
a :class:`~optimization_solvers_tpu.core.types.SolveResult`.

- ``x0`` with a leading batch axis (2-D) routes through
  :func:`solvers.batch_minimize` — on TPU, supported (method, search)
  combos run as fused whole-solve Pallas kernels; 1-D ``x0`` runs the
  single-instance driver.
- ``method="lbfgsb"`` routes to the dedicated Byrd-Lu-Nocedal-Zhu
  backends (the reference's Fortran-FFI capability).
- pass ``data=(...)`` for problem-data arrays (``f(x, *data)``) so the
  objective can cross the fused-kernel boundary.

Example::

    import optimization_solvers_tpu as ost
    res = ost.minimize(lambda x: (x ** 2).sum(), x0, method="bfgs")
    res = ost.minimize(rosen, x0_batch, method="lbfgsb",
                       bounds=(lo, hi), tol=1e-6)
"""

from __future__ import annotations

import dataclasses
import weakref

import jax.numpy as jnp


def _method_and_search(name, tol, options):
    from optimization_solvers_tpu import linesearch as ls, solvers

    def opt(cls, **defaults):
        # cls may be a frozen dataclass or a factory function (BFGS/DFP/
        # Broyden wrap QuasiNewton): build first, then overlay options
        # that name fields of the resulting config
        inst = cls(**defaults)
        fields = set(type(inst).__dataclass_fields__)
        kw = {k: options[k] for k in list(options) if k in fields}
        return dataclasses.replace(inst, **kw) if kw else inst

    name = name.lower().replace("-", "_").replace(" ", "_")
    table = {
        # name: (method factory, default search, bounded)
        "gd": (lambda: opt(solvers.GradientDescent, grad_tol=tol),
               ls.BackTracking(), False),
        "cd": (lambda: opt(solvers.CoordinateDescent, grad_tol=tol),
               ls.BackTracking(), False),
        "pgd": (lambda: opt(solvers.ProjectedGradientDescent, grad_tol=tol),
                ls.BackTrackingB(), True),
        "pnorm": (lambda: opt(solvers.PnormDescent, grad_tol=tol),
                  ls.BackTracking(), False),
        "spg": (lambda: opt(solvers.SpectralProjectedGradient, grad_tol=tol),
                ls.GLLQuadratic(), True),
        "newton": (lambda: opt(solvers.Newton, tol=tol),
                   ls.MoreThuente(), False),
        "pn": (lambda: opt(solvers.ProjectedNewton, grad_tol=tol),
               ls.BackTrackingB(), True),
        "spn": (lambda: opt(solvers.SpectralProjectedNewton, grad_tol=tol),
                ls.BackTrackingB(), True),
        "bfgs": (lambda: opt(solvers.BFGS, tol=tol),
                 ls.MoreThuente(), False),
        "dfp": (lambda: opt(solvers.DFP, tol=tol), ls.MoreThuente(), False),
        "broyden": (lambda: opt(solvers.Broyden, tol=tol),
                    ls.MoreThuente(), False),
        "bfgsb": (lambda: opt(solvers.BFGSB, tol=tol),
                  ls.MoreThuenteB(), True),
        "dfpb": (lambda: opt(solvers.DFPB, tol=tol),
                 ls.MoreThuenteB(), True),
        "broydenb": (lambda: opt(solvers.BroydenB, tol=tol),
                     ls.MoreThuenteB(), True),
        "sr1b": (lambda: opt(solvers.SR1B, tol=tol),
                 ls.MoreThuenteB(), True),
        "ncg": (lambda: opt(solvers.NonlinearCG, grad_tol=tol),
                ls.BackTracking(), False),
        "lbfgs": (lambda: opt(solvers.LBFGS, tol=tol),
                  ls.HagerZhang(), False),
    }
    aliases = {"gradient_descent": "gd", "coordinate_descent": "cd",
               "projected_gradient": "pgd", "projected_newton": "pn",
               "nonlinear_cg": "ncg", "l_bfgs": "lbfgs"}
    name = aliases.get(name, name)
    if name not in table:
        raise ValueError(
            f"unknown method {name!r}; choose from "
            f"{sorted(table) + ['lbfgsb', 'newton_cg']}")
    return (name,) + table[name]


# policy="fast" per-method config overlays: each is an opt-in variant this
# repo measured to dominate the reference update on both speed AND
# success fraction (BENCH_NOTES round 4; docs/tpu_accuracy.md):
#   spg  alternate-BB   2.17x throughput, conv 0.985 -> 1.000 (config 3)
#   spn  precond_bb     median 2 iterations vs ~2000 (reference BB freeze)
# A user-passed option always wins over the overlay.
_FAST_METHOD_OVERLAY = {
    "spg": {"bb_variant": "alternate"},
    "spn": {"precond_bb": True},
}


# objective -> {probe key: verdict}; weak keys so dynamically-created
# objectives are not pinned forever (id-reuse-safe, like the driver's
# _FUSED_PROBED)
_FUSED_LBFGSB_PROBED: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _fused_lbfgsb_route(f, x0, lower, upper, consts, cfg, tile,
                        tall: bool = False):
    """Dedicated fused-kernel route for the batched lbfgsb method, with the
    same outer-jit safety the driver's generic route has: when called under
    an outer ``jax.jit`` a kernel-compile failure would surface at the
    OUTER compile where no try/except here can catch it, so under a tracer
    the kernel is AOT compile-probed first.  Returns ``None`` to send the
    caller to the lockstep XLA path.

    ``tall=True`` targets the large-n tall-layout kernel
    (:func:`ops.pallas_lbfgsb_tall.lbfgsb_solve_fused_tall`, instances on
    sublanes) instead of the lane-last whole-solve kernel."""
    import jax

    if tall:
        from optimization_solvers_tpu.ops.pallas_lbfgsb_tall import (
            lbfgsb_solve_fused_tall as _solve)
    else:
        from optimization_solvers_tpu.ops.pallas_lbfgsb import (
            lbfgsb_solve_fused as _solve)

    B, n = x0.shape
    pad = (-B) % tile
    if pad and jnp.ndim(lower) == 2:   # per-lane boxes pad with row 0 too
        lower = jnp.concatenate(
            [lower, jnp.broadcast_to(lower[:1], (pad, n))], axis=0)
        upper = jnp.concatenate(
            [upper, jnp.broadcast_to(upper[:1], (pad, n))], axis=0)

    tall_kw = {"line_search": cfg.tall_line_search} if tall else {}

    def run(xb_, lo_, up_, cs):
        return _solve(
            f, xb_, lo_, up_, consts=cs, m=cfg.m, pgtol=cfg.pgtol,
            factr=cfg.factr, max_iter=cfg.max_iter,
            max_iter_ls=max(cfg.max_iter_ls, 20), tile=tile, c1=cfg.ls_c1,
            **tall_kw)

    if isinstance(x0, jax.core.Tracer):
        def aval(v):
            return jax.ShapeDtypeStruct(jnp.shape(v), jnp.result_type(v))

        pkey = ((B + pad, n), str(jnp.result_type(x0)),
                tuple((jnp.shape(c), str(jnp.result_type(c)))
                      for c in consts),
                cfg.m, cfg.pgtol, cfg.factr, cfg.max_iter,
                max(cfg.max_iter_ls, 20), tile, cfg.ls_c1, tall,
                cfg.tall_line_search if tall else None,
                int(jnp.ndim(lower)))
        try:
            cache = _FUSED_LBFGSB_PROBED.setdefault(f, {})
        except TypeError:       # non-weakref-able callable: probe per call
            cache = {}
        verdict = cache.get(pkey)
        if verdict is None:
            try:
                jax.jit(run).lower(
                    jax.ShapeDtypeStruct((B + pad, n), jnp.result_type(x0)),
                    aval(lower), aval(upper),
                    tuple(aval(c) for c in consts)).compile()
                verdict = True
            except Exception:
                verdict = False
            cache[pkey] = verdict
        if not verdict:
            return None
    xb = x0 if not pad else jnp.concatenate(
        [x0, jnp.broadcast_to(x0[:1], (pad, n))], axis=0)
    try:
        r = run(xb, lower, upper, consts)
    except Exception:
        return None  # eager path: fall back to lockstep
    if pad:
        r = jax.tree.map(lambda a: a[:B], r)
    return r


def _minimize_f32x2(f, x0, method, *, bounds, data, tol, max_iter,
                    max_iter_ls, search, policy, polish_max_iter,
                    **options):
    """The ``precision="f32x2"`` pipeline: fast f32 bulk solve at the
    certifiable f32 tolerance, then df-BFGS polish of every lane to the
    strict tolerance (solvers/df_polish.py — see its module docstring for
    why this is the TPU-native answer to the reference's f64)."""
    from optimization_solvers_tpu.core.types import SolveResult
    from optimization_solvers_tpu.solvers.df_polish import df_polish_minimize

    if hasattr(f, "value"):
        raise ValueError(
            "precision='f32x2' needs a raw scalar objective (it is "
            "re-traced into double-float arithmetic); pass the function "
            "rather than an oracle object")
    if tol is None:
        tol = 1e-6          # the reference's f64-grade default
    # stage 1 runs at the f32-certifiable tolerance: pushing the fast path
    # past its ~1e-4 wall only burns its budget on uncertifiable iterations
    stage1_tol = max(float(tol), 1e-4)
    r = minimize(f, x0, method, bounds=bounds, data=data, tol=stage1_tol,
                 max_iter=max_iter, max_iter_ls=max_iter_ls, search=search,
                 policy=policy, **options)
    if tol >= 1e-4:
        return r            # the requested tol was f32-certifiable as-is
    res = df_polish_minimize(
        f, r.x, data=data, bounds=bounds, grad_tol=float(tol),
        max_iter=int(polish_max_iter))
    out = res.to_solve_result()
    return SolveResult(out.x, out.f, out.g,
                       r.iterations + out.iterations, out.status,
                       pg_norm=out.pg_norm, x_lo=out.x_lo)


def minimize(f, x0, method: str = "lbfgs", *, bounds=None, data=(),
             tol: float | None = None, max_iter: int = 1000,
             max_iter_ls=None, search=None, policy: str = "fast",
             precision: str | None = None, polish_max_iter: int = 200,
             **options):
    """Minimize scalar ``f`` from ``x0`` with the named method.

    ``f``: plain scalar objective (``f(x)`` or ``f(x, *data)``) or an
    oracle from :func:`make_oracle`.  ``x0``: (n,) for a single solve,
    (B, n) for a lockstep batch (fused Pallas kernels on TPU when the
    combo supports it).  ``search`` overrides the method's default line
    search.  ``max_iter_ls`` defaults per method family (40 for the
    template methods, 20 for lbfgsb/newton_cg) and is honored verbatim
    when given.  Extra keyword ``options`` are forwarded to the method
    config when its dataclass has the field (e.g. ``m=10`` for
    lbfgs/lbfgsb, ``precond_bb=True`` for spn).

    ``policy`` selects the update-rule defaults (round-5; VERDICT round-4
    weak #1).  ``"fast"`` (the default here) picks the variants this repo
    measured to dominate the reference's update on BOTH speed and success
    fraction: alternate-BB for spg (2.17x, conv 1.000 — BENCH_NOTES round
    4), Newton-preconditioned BB for spn (median 2 vs ~2000 iterations),
    and — for f32 solves whose method defaults to a More-Thuente search —
    the Hager-Zhang approximate-Wolfe acceptance that closes the f32
    value-cancellation livelock.  ``"reference"`` keeps every default
    reference-exact (``spg.rs:134-143`` / ``spn.rs:139-148`` semantics),
    as the solver-object and ``api`` layers always do.  This front end is
    the scipy-style convenience surface, hence fast-by-default; an
    explicit option (e.g. ``bb_variant="bb1"``) or an explicit ``search``
    object always wins over the policy.

    ``precision="f32x2"`` (round-5; the reference's f64 semantics on
    f32-only TPUs, ``number.rs:3``) runs the normal fast f32 path first,
    then POLISHES every lane with a double-float BFGS whose oracle is
    re-evaluated in (hi, lo) f32-pair arithmetic
    (:mod:`~optimization_solvers_tpu.solvers.df_polish`): iterate updates,
    y = g+ - g cancellations, Armijo tests, and the final stationarity
    certificate are all accurate to ~1e-14 relative.  With it, ``tol``
    defaults to the reference's 1e-6 even for f32 ``x0``, and the returned
    ``status``/``pg_norm`` certify at that tolerance (measured true-f64
    validation in tests/test_df_polish.py).  Requires a raw scalar
    objective (it is re-traced); ``polish_max_iter`` bounds the polish
    stage.  f64 ``x0`` ignores the flag (already reference precision).

    ``tol`` (the gradient/stationarity certification threshold) defaults
    DTYPE-AWARE, like ``factr`` below: 1e-6 for f64 ``x0`` (the reference
    tolerance, ``examples/quadratic.rs:43``) but 1e-4 for f32, where
    gradients carry ~1e-7 relative noise so a 1e-6 certificate is not
    generally reachable — solves would burn their whole budget and report
    MAX_ITER_REACHED at an iterate that already meets the reference's
    VALUE tolerance (measured: docs/tpu_accuracy.md "Discussion", whose
    three MAX_ITER anchor rows all CONVERGE at 1e-4).  An explicit ``tol``
    always wins.

    Objective style for the fused TPU path: spell per-instance inner
    products ``jnp.sum(a * b)`` rather than ``a @ b``.  Under the kernel's
    per-lane vmap the ``@`` form becomes a both-operands-batched
    ``dot_general`` that this toolchain's Mosaic remote-compile cannot
    parse — the solve still completes (the compile probe catches it and
    falls back to the lockstep XLA path) but ~90x slower.  Plain
    matrix-vector products against problem data (``A @ x``) fuse fine.

    Batched ``method="lbfgsb"`` also accepts PER-LANE boxes — ``bounds``
    arrays of shape (B, n) — each instance solving within its own box
    (fused kernels take them as tiled operands; the XLA fallback vmaps).
    The batched route uses the fused whole-solve TPU
    kernel when the objective is a raw callable and the VMEM footprint
    fits; that kernel pairs the L-BFGS-B step with a projected Armijo
    backtracking search (value-only) rather than the XLA path's dcsrch
    strong Wolfe, and it honors m/pgtol/factr/max_iter/max_iter_ls/ls_c1
    only — passing a non-default ``ls_c2``, ``rel_pg_stop`` or
    ``verbose`` keeps the solve on the lockstep dcsrch path that honors
    them.
    """
    from optimization_solvers_tpu.core.oracle import make_oracle
    from optimization_solvers_tpu import solvers

    if policy not in ("fast", "reference"):
        raise ValueError(
            f"policy must be 'fast' or 'reference', got {policy!r}")
    if precision not in (None, "f32x2"):
        raise ValueError(
            f"precision must be None or 'f32x2', got {precision!r}")
    x0 = jnp.asarray(x0)
    if precision == "f32x2" and x0.dtype == jnp.float32:
        return _minimize_f32x2(
            f, x0, method, bounds=bounds, data=data, tol=tol,
            max_iter=max_iter, max_iter_ls=max_iter_ls, search=search,
            policy=policy, polish_max_iter=polish_max_iter, **options)
    # the solve runs in x0's dtype: float problem data of a DIFFERENT float
    # dtype would otherwise promote oracle outputs mid-solve (e.g. f32 x0 +
    # f64 consts under x64 -> f64 f/g inside an f32 while-loop carry, a
    # hard trace error in every search).  Integer/bool data passes through.
    data = tuple(jnp.asarray(c) for c in data)
    data = tuple(
        c.astype(x0.dtype)
        if jnp.issubdtype(c.dtype, jnp.floating) and c.dtype != x0.dtype
        else c
        for c in data)
    if tol is None:
        tol = 1e-6 if x0.dtype == jnp.float64 else 1e-4
    batched = x0.ndim == 2
    name = method.lower().replace("-", "_")

    if name in ("lbfgsb", "l_bfgs_b"):
        from optimization_solvers_tpu.solvers.lbfgsb import (
            LbfgsbConfig, lbfgsb_batch_minimize, lbfgsb_minimize)

        n = x0.shape[-1]
        if bounds is None:
            lower = jnp.full((n,), -jnp.inf, x0.dtype)
            upper = jnp.full((n,), jnp.inf, x0.dtype)
        else:
            lo_in = jnp.asarray(bounds[0], x0.dtype)
            up_in = jnp.asarray(bounds[1], x0.dtype)
            if batched and (lo_in.ndim == 2 or up_in.ndim == 2):
                # PER-LANE boxes (a batch-axis capability; the reference
                # is single-instance): both fused kernels take (B, n)
                # bound operands tiled alongside x0
                lower = jnp.broadcast_to(lo_in, x0.shape)
                upper = jnp.broadcast_to(up_in, x0.shape)
            else:
                lower = jnp.broadcast_to(lo_in, (n,))
                upper = jnp.broadcast_to(up_in, (n,))
        cfg_fields = set(LbfgsbConfig.__dataclass_fields__)
        # factr is RELATIVE to the working dtype's machine epsilon (the
        # Fortran convention): the f64-flavored default 1e7 means "stop at
        # ~1.19 relative decrease" in f32 — i.e. immediately.  Default it
        # dtype-aware unless the caller picks a value.
        factr = options.pop(
            "factr", 1e7 if x0.dtype == jnp.float64 else 100.0)
        if policy == "reference" and "tall_line_search" not in options:
            # reference semantics prefer the Fortran pairing: the tall
            # kernel's in-kernel dcsrch (iteration-count parity with the
            # XLA/Fortran backends) measured ~1.6% of the Armijo default
            # (TALL_LS_COMPARE.json) — policy="fast" keeps Armijo
            options["tall_line_search"] = "dcsrch"
        cfg = LbfgsbConfig(
            pgtol=options.pop("pgtol", tol), factr=factr, max_iter=max_iter,
            max_iter_ls=20 if max_iter_ls is None else max_iter_ls,
            **{k: options.pop(k) for k in list(options) if k in cfg_fields})
        if options:
            raise TypeError(f"unknown lbfgsb option(s) {sorted(options)}")
        raw = not hasattr(f, "value")
        oracle = f if not raw else make_oracle(f, data=tuple(data))
        if batched:
            # accelerator route: the dedicated fused whole-solve kernel
            # (~90x the lockstep XLA path on the headline) when the
            # objective is a raw scalar callable; lockstep otherwise or on
            # any kernel-side failure (unfusable objective, VMEM)
            import jax

            B, n = x0.shape
            tile = 512 if B % 512 == 0 else (256 if B >= 256 else B)
            # whole-solve VMEM residency: past ~100 MB the kernel cannot
            # compile (fit check shares the kernel's own footprint helper
            # — the two copies of the formula desynced once, round-4
            # review finding).  The lane-last kernel is also the WRONG
            # layout for large n: its GCP walk is O(segments * n) and a
            # small batch tile wastes lanes — send that class to the
            # tall kernel below instead (n <= 512 keeps the small-n
            # kernel for every previously-routed shape incl. the
            # B >= 128 headline tiles)
            from optimization_solvers_tpu.ops.pallas_lbfgsb import (
                vmem_footprint_bytes as _lane_last_footprint)
            from optimization_solvers_tpu.ops.pallas_lbfgsb_tall import (
                VMEM_BUDGET_BYTES, VMEM_MARGIN, vmem_footprint_bytes)

            small_need = _lane_last_footprint(n, cfg.m, tile, data)
            fits = (small_need * VMEM_MARGIN < VMEM_BUDGET_BYTES
                    and (tile >= 128 or n <= 512))
            # options the kernel does not honor keep the solve on the
            # lockstep dcsrch path (see docstring) instead of silently
            # dropping them
            default = LbfgsbConfig()
            honored = (cfg.ls_c2 == default.ls_c2
                       and cfg.rel_pg_stop == default.rel_pg_stop
                       and cfg.verbose == default.verbose
                       and cfg.curvature_eps == default.curvature_eps)
            if raw and honored and jax.default_backend() == "tpu":
                if fits:
                    r = _fused_lbfgsb_route(f, x0, lower, upper,
                                            tuple(data), cfg, tile)
                    if r is not None:
                        return r
                # large-n class (config 4): the whole-solve lane-last
                # kernel cannot hold its slabs (or wastes lanes), but the
                # tall-layout kernel (instances on sublanes, GCP by
                # segment bisection) can — measured ~3.9x the lockstep
                # XLA path on the 10k-dim bounded log-sum-exp (round 4)
                tall_tile = 16 if B % 16 == 0 and B >= 16 else (
                    8 if B % 8 == 0 else B)
                tall_fits = (vmem_footprint_bytes(n, cfg.m, tall_tile, data)
                             * VMEM_MARGIN < VMEM_BUDGET_BYTES)
                # second choice even when the lane-last route was tried
                # and failed its probe (mid-n shapes): the tall kernel
                # often still fits and beats lockstep
                if tall_fits:
                    r = _fused_lbfgsb_route(f, x0, lower, upper,
                                            tuple(data), cfg,
                                            tall_tile, tall=True)
                    if r is not None:
                        return r
            if jnp.ndim(lower) == 2:
                # per-lane boxes on the XLA path: the lockstep step closes
                # over SHARED bounds, so map them through vmap instead
                return jax.vmap(
                    lambda xi, lo, up: lbfgsb_minimize(
                        oracle, xi, lo, up, cfg))(x0, lower, upper)
            return lbfgsb_batch_minimize(oracle, x0, lower, upper, cfg)
        return lbfgsb_minimize(oracle, x0, lower, upper, cfg)

    if name == "newton_cg":
        from optimization_solvers_tpu.solvers.newton_cg import (
            NewtonCGConfig, newton_cg_batch_minimize, newton_cg_minimize)

        n = x0.shape[-1]
        if bounds is None:
            lower = jnp.full((n,), -jnp.inf, x0.dtype)
            upper = jnp.full((n,), jnp.inf, x0.dtype)
        else:
            lower = jnp.broadcast_to(jnp.asarray(bounds[0], x0.dtype), (n,))
            upper = jnp.broadcast_to(jnp.asarray(bounds[1], x0.dtype), (n,))
        cfg_fields = set(NewtonCGConfig.__dataclass_fields__)
        factr = options.pop(
            "factr", 1e7 if x0.dtype == jnp.float64 else 100.0)
        if max_iter_ls is not None:
            options.setdefault("max_iter_ls", max_iter_ls)
        cfg = NewtonCGConfig(
            pgtol=options.pop("pgtol", tol), factr=factr, max_iter=max_iter,
            **{k: options.pop(k) for k in list(options) if k in cfg_fields})
        if options:
            raise TypeError(f"unknown newton_cg option(s) {sorted(options)}")
        oracle = f if hasattr(f, "value") else make_oracle(f, data=tuple(data))
        fn = newton_cg_batch_minimize if batched else newton_cg_minimize
        return fn(oracle, x0, lower, upper, cfg)

    canon, make_m, default_search, needs_bounds = _method_and_search(
        method, tol, options)
    m = make_m()
    if policy == "fast":
        overlay = {k: v for k, v in _FAST_METHOD_OVERLAY.get(canon, {}).items()
                   if k not in options}
        if overlay:
            m = dataclasses.replace(m, **overlay)
    unknown = set(options) - set(type(m).__dataclass_fields__)
    if unknown:
        raise TypeError(
            f"unknown option(s) {sorted(unknown)} for method {method!r}")
    if getattr(m, "inverse_p", False) is None:
        raise ValueError(
            "method 'pnorm' requires the inverse_p option "
            "(the inverse preconditioner matrix, pnorm_descent.rs:30-37)")
    if max_iter_ls is None:
        max_iter_ls = 40
    s = search if search is not None else default_search
    if (policy == "fast" and search is None and x0.dtype == jnp.float32
            and getattr(s, "approx_wolfe", None) is False):
        # f32 More-Thuente default: add the HZ approximate-Wolfe acceptance
        # (the strong-Wolfe Armijo half is cancellation-undecidable near a
        # minimizer in f32 — MoreThuente.approx_wolfe field docstring)
        s = dataclasses.replace(s, approx_wolfe=True)
    if needs_bounds and bounds is None:
        raise ValueError(f"method {method!r} requires bounds=(lower, upper)")
    if bounds is not None:
        n = x0.shape[-1]
        bounds = (jnp.broadcast_to(jnp.asarray(bounds[0], x0.dtype), (n,)),
                  jnp.broadcast_to(jnp.asarray(bounds[1], x0.dtype), (n,)))
        if not needs_bounds:
            raise ValueError(
                f"method {method!r} is unconstrained; use its bounded "
                "sibling (pgd/spg/pn/spn/bfgsb/dfpb/broydenb/sr1b/lbfgsb) "
                "for box constraints")
    oracle = f if hasattr(f, "value") else make_oracle(
        f, data=tuple(data),
        with_hessian=getattr(m, "needs_hessian", False))
    if batched:
        return solvers.batch_minimize(
            m, s, oracle, x0, bounds=bounds,
            max_iter=max_iter, max_iter_ls=max_iter_ls)
    return solvers.minimize(
        m, s, oracle, x0, bounds=bounds,
        max_iter=max_iter, max_iter_ls=max_iter_ls)
