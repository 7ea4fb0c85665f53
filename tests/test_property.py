"""Property-based line-search invariants (hypothesis): on random SPD
quadratics from random starts, every accepted step must satisfy its
search's acceptance condition, and solver results must be feasible."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import example, given, settings, strategies as st

from optimization_solvers_tpu import linesearch as ls, solvers
from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.numerics import box_projection
from optimization_solvers_tpu.core.oracle import make_oracle

_dim = st.integers(min_value=2, max_value=6)
_seed = st.integers(min_value=0, max_value=10_000)
_logcond = st.floats(min_value=0.0, max_value=4.0)


def _problem(seed, n, logcond):
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(n, n))
    eigs = np.logspace(0, logcond, n)
    Q = jnp.asarray((q * eigs) @ q.T)
    x0 = jnp.asarray(rng.uniform(-5, 5, n))
    return problems.quadratic(Q), x0


@settings(max_examples=25, deadline=None)
@given(_seed, _dim, _logcond)
def test_backtracking_accepts_armijo_point(seed, n, logcond):
    f, x = _problem(seed, n, logcond)
    oracle = make_oracle(f)
    ev = oracle(x)
    d = -ev.g
    search = ls.BackTracking(c1=1e-4, beta=0.5)
    t, _ = search.step_len(oracle, x, ev, d, None, None, 100)
    f_t = float(oracle.value(x + t * d))
    g_dot_d = float(ev.g @ d)
    assert f_t - float(ev.f) <= 1e-4 * float(t) * g_dot_d + 1e-12


@settings(max_examples=25, deadline=None)
@given(_seed, _dim, _logcond)
def test_strong_wolfe_accepts_wolfe_point(seed, n, logcond):
    f, x = _problem(seed, n, logcond)
    oracle = make_oracle(f)
    ev = oracle(x)
    d = -ev.g
    search = ls.StrongWolfe(c1=1e-4, c2=0.9)
    t, _ = search.step_len(oracle, x, ev, d, None, None, 40)
    ev_t = oracle(x + t * d)
    g0d = float(ev.g @ d)
    assert float(ev_t.f) - float(ev.f) <= 1e-4 * float(t) * g0d + 1e-10
    assert abs(float(ev_t.g @ d)) <= 0.9 * abs(g0d) + 1e-10


@settings(max_examples=20, deadline=None)
@given(_seed, _dim)
def test_bounded_solves_stay_feasible_and_converge(seed, n):
    f, x0 = _problem(seed, n, 2.0)
    rng = np.random.RandomState(seed + 1)
    lo = jnp.asarray(np.sort(rng.uniform(-3, 0, n)))
    hi = jnp.asarray(np.sort(rng.uniform(0.5, 3, n)))
    res = solvers.minimize(
        solvers.ProjectedGradientDescent(grad_tol=1e-7),
        ls.BackTrackingB(), make_oracle(f), x0,
        bounds=(lo, hi), max_iter=3000)
    assert bool(jnp.all(res.x >= lo - 1e-12))
    assert bool(jnp.all(res.x <= hi + 1e-12))
    # projected gradient optimality at the returned point when converged
    if int(res.status) == 1:
        pg = res.x - box_projection(res.x - res.g, lo, hi)
        assert float(jnp.max(jnp.abs(pg))) < 1e-6


@settings(max_examples=15, deadline=None)
@given(_seed, _dim)
@example(
    seed=472,
    n=2,
).via('discovered failure')
def test_lbfgsb_matches_native_cpp(seed, n):
    """The JAX and C++ implementations of the same algorithm agree on
    random bounded quadratics."""
    import shutil
    if shutil.which("g++") is None:
        return
    from optimization_solvers_tpu.native import lbfgsb_minimize_native
    from optimization_solvers_tpu.solvers.lbfgsb import (
        LbfgsbConfig, lbfgsb_minimize,
    )

    f, x0 = _problem(seed, n, 2.0)
    rng = np.random.RandomState(seed + 2)
    lo = np.sort(rng.uniform(-3, 0, n))
    hi = np.sort(rng.uniform(0.5, 3, n))
    cfg = LbfgsbConfig(m=5, pgtol=1e-8, factr=10.0, max_iter=500)
    r_jax = lbfgsb_minimize(make_oracle(f), x0, jnp.asarray(lo),
                            jnp.asarray(hi), cfg)

    Q = np.asarray(jax.hessian(f)(jnp.zeros(n)))

    def vg(x):
        return float(0.5 * x @ Q @ x), Q @ x

    x_cpp, f_cpp, _, status = lbfgsb_minimize_native(
        vg, np.asarray(x0), lo, hi, m=5, pgtol=1e-8, factr=10.0,
        max_iter=500)
    assert status == 1 and int(r_jax.status) == 1
    np.testing.assert_allclose(np.asarray(r_jax.x), x_cpp, atol=1e-5)


@settings(max_examples=25, deadline=None)
@given(_seed, _dim, _logcond)
def test_hager_zhang_accepts_wolfe_or_approx_wolfe(seed, n, logcond):
    f, x = _problem(seed, n, logcond)
    oracle = make_oracle(f)
    ev = oracle(x)
    d = -ev.g
    search = ls.HagerZhang()
    t, _ = search.step_len(oracle, x, ev, d, None, None, 50)
    ev_t = oracle(x + t * d)
    g0d = float(ev.g @ d)
    gtd = float(ev_t.g @ d)
    f0, ft = float(ev.f), float(ev_t.f)
    eps_band = ft <= f0 + search.eps * abs(f0) + 1e-12
    wolfe = (ft - f0 <= search.delta * float(t) * g0d + 1e-10) and (
        gtd >= search.sigma * g0d - 1e-10)
    approx = (gtd <= (2 * search.delta - 1) * g0d + 1e-10) and (
        gtd >= search.sigma * g0d - 1e-10) and eps_band
    assert wolfe or approx


@settings(max_examples=20, deadline=None)
@given(_seed, _dim)
def test_hager_zhang_b_feasible(seed, n):
    f, x = _problem(seed, n, 2.0)
    rng = np.random.RandomState(seed + 3)
    lo = jnp.asarray(np.asarray(x) - rng.uniform(0.1, 2.0, n))
    hi = jnp.asarray(np.asarray(x) + rng.uniform(0.1, 2.0, n))
    oracle = make_oracle(f)
    ev = oracle(x)
    d = -ev.g
    t, _ = ls.HagerZhangB().step_len(oracle, x, ev, d, None, (lo, hi), 50)
    x_new = x + t * d
    assert bool(jnp.all(x_new >= lo - 1e-10))
    assert bool(jnp.all(x_new <= hi + 1e-10))


@settings(max_examples=15, deadline=None)
@given(_seed, _dim)
def test_lbfgsb_mixed_infinite_bounds_matches_scipy(seed, n):
    """Random mixed finite/+-inf bound patterns against scipy's (Fortran-
    ancestry) L-BFGS-B — the geometry class where the chunked Cauchy walk
    NaN-poisoned on 0 * inf (BENCH_NOTES round 2)."""
    import pytest

    scipy_opt = pytest.importorskip("scipy.optimize")
    from optimization_solvers_tpu.solvers.lbfgsb import (
        LbfgsbConfig, lbfgsb_minimize,
    )

    f, x0 = _problem(seed, n, 2.0)
    rng = np.random.RandomState(seed + 3)
    lo = np.where(rng.rand(n) < 0.5, -np.inf,
                  np.sort(rng.uniform(-3, 0, n)))
    hi = np.where(rng.rand(n) < 0.5, np.inf,
                  np.sort(rng.uniform(0.5, 3, n)))
    cfg = LbfgsbConfig(m=5, pgtol=1e-9, factr=10.0, max_iter=1000)
    r_jax = lbfgsb_minimize(make_oracle(f), x0, jnp.asarray(lo),
                            jnp.asarray(hi), cfg)
    assert int(r_jax.status) == 1

    Q = np.asarray(jax.hessian(f)(jnp.zeros(n)))

    def fg(x):
        return float(0.5 * x @ Q @ x), Q @ x

    bounds = [(None if not np.isfinite(l) else l,
               None if not np.isfinite(u) else u) for l, u in zip(lo, hi)]
    ref_x, ref_f, _info = scipy_opt.fmin_l_bfgs_b(
        fg, np.asarray(x0, np.float64).copy(), bounds=bounds, m=5,
        pgtol=1e-9, factr=10.0, maxiter=1000)
    # strictly convex quadratic: unique minimizer
    assert abs(float(r_jax.f) - ref_f) < 1e-6 * max(1.0, abs(ref_f))
    np.testing.assert_allclose(np.asarray(r_jax.x), ref_x, atol=1e-4)


@settings(max_examples=10, deadline=None)
@given(_seed, _dim)
def test_bounded_families_mixed_infinite_bounds_kkt(seed, n):
    """Every bounded solver family must stay feasible and satisfy the
    projected-gradient KKT test under random mixed finite/+-inf bound
    patterns (the reference only ever exercises finite boxes)."""
    f, x0 = _problem(seed, n, 1.5)
    rng = np.random.RandomState(seed + 5)
    lo = jnp.asarray(np.where(rng.rand(n) < 0.4, -np.inf,
                              np.sort(rng.uniform(-2, 0, n))))
    hi = jnp.asarray(np.where(rng.rand(n) < 0.4, np.inf,
                              np.sort(rng.uniform(0.3, 2, n))))
    oracle = make_oracle(f, with_hessian=True)

    # kkt=False for the reference-parity bounded QN family: its
    # s/y-too-close exit (bfgs_b.rs:92-104) can report success at a
    # non-KKT point when the projected B-metric step stalls on a bound
    # (observed at seed=50: pg=9.0 after 3 iterations); the
    # restart_on_degeneracy extension restarts as projected steepest
    # descent instead and does reach the KKT point
    cases = [
        (solvers.ProjectedGradientDescent(grad_tol=1e-6),
         ls.BackTrackingB(), True),
        (solvers.SpectralProjectedGradient(grad_tol=1e-6),
         ls.GLLQuadratic(), True),
        (solvers.BFGSB(tol=1e-7), ls.BackTrackingB(), False),
        (solvers.BFGSB(tol=1e-7, restart_on_degeneracy=True),
         ls.BackTrackingB(), True),
        (solvers.SR1B(tol=1e-7), ls.BackTrackingB(), False),
        (solvers.ProjectedNewton(grad_tol=1e-8), ls.BackTrackingB(), True),
    ]
    for method, search, kkt in cases:
        res = solvers.minimize(method, search, oracle, x0,
                               bounds=(lo, hi), max_iter=3000,
                               max_iter_ls=40)
        x = res.x
        assert bool(jnp.all(jnp.isfinite(x))), type(method).__name__
        assert bool(jnp.all(x >= lo - 1e-10)), type(method).__name__
        assert bool(jnp.all(x <= hi + 1e-10)), type(method).__name__
        if kkt and int(res.status) == 1:
            pg = x - box_projection(x - res.g, lo, hi)
            assert float(jnp.max(jnp.abs(pg))) < 1e-4, type(method).__name__


@settings(max_examples=10, deadline=None)
@given(_seed, _dim)
def test_bounded_searches_return_feasible_steps(seed, n):
    """Every box-aware line search must return t >= 0 with x + t d inside
    the box, under random mixed finite/+-inf bound patterns and a
    projected-gradient direction."""
    from optimization_solvers_tpu.linesearch.dcsrch import StrongWolfe

    f, x = _problem(seed, n, 2.0)
    rng = np.random.RandomState(seed + 7)
    lo = jnp.asarray(np.where(rng.rand(n) < 0.4, -np.inf,
                              np.sort(rng.uniform(-2, 0, n))))
    hi = jnp.asarray(np.where(rng.rand(n) < 0.4, np.inf,
                              np.sort(rng.uniform(0.3, 2, n))))
    x = box_projection(x, lo, hi)
    oracle = make_oracle(f)
    ev = oracle(x)
    d = box_projection(x - ev.g, lo, hi) - x

    searches = [
        ls.BackTrackingB(),
        ls.MoreThuenteB(),
        ls.HagerZhangB(),
        StrongWolfe(bounded=True),
    ]
    for search in searches:
        state = (search.init_state(ev)
                 if hasattr(search, "init_state") else None)
        t, _ = search.step_len(oracle, x, ev, d, state, (lo, hi), 40)
        name = type(search).__name__
        t_f = float(t)
        assert np.isfinite(t_f) and t_f >= 0.0, (name, t_f)
        x_new = x + t * d
        assert bool(jnp.all(x_new >= lo - 1e-9)), name
        assert bool(jnp.all(x_new <= hi + 1e-9)), name


# module-scope objective: the fused wrappers jit with ``f`` STATIC, so an
# objective defined inside the test body would be a fresh function object
# per hypothesis example — a full recompile of both interpret-mode kernels
# per example, which is exactly the compile pressure that segfaults the
# jaxlib-0.9.0 XLA-CPU compiler in a long-lived xdist worker (the suite's
# one known flake; CLAUDE.md "Commands")
def _fq_perlane(x, Qm):
    return 0.5 * jnp.sum(x * (Qm @ x))


@settings(max_examples=8, deadline=None)
@given(_seed)
def test_per_lane_bounds_fused_lbfgsb_matches_vmap(seed):
    """Per-lane (B, n) boxes with random mixed finite/+-inf patterns PER
    LANE through the fused L-BFGS-B kernels (round 4): every lane must
    stay feasible in ITS box and match its own single-instance XLA solve
    at tolerance — the geometry class where the chunked Cauchy walk had
    its 0*inf NaN bug (BENCH_NOTES round 2)."""
    from optimization_solvers_tpu.ops.pallas_lbfgsb import lbfgsb_solve_fused
    from optimization_solvers_tpu.ops.pallas_lbfgsb_tall import (
        lbfgsb_solve_fused_tall)
    from optimization_solvers_tpu.solvers.lbfgsb import (
        LbfgsbConfig, lbfgsb_minimize)

    B, n = 4, 6
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(n, n))
    Q = jnp.asarray((q * np.logspace(0, 2, n)) @ q.T)

    fq = _fq_perlane
    lo = jnp.asarray(np.where(rng.rand(B, n) < 0.35, -np.inf,
                              -np.sort(rng.uniform(0.1, 2, (B, n)), axis=1)))
    hi = jnp.asarray(np.where(rng.rand(B, n) < 0.35, np.inf,
                              np.sort(rng.uniform(0.2, 2, (B, n)), axis=1)))
    x0 = jnp.asarray(rng.uniform(-2, 2, (B, n)))
    kw = dict(m=4, pgtol=1e-7, factr=10.0, max_iter=400)
    cfg = LbfgsbConfig(**kw)
    oracle = make_oracle(fq, data=(Q,))
    ref = jax.vmap(lambda xi, l, u: lbfgsb_minimize(oracle, xi, l, u, cfg))(
        x0, lo, hi)
    for solve, tag in ((lbfgsb_solve_fused, "lane-last"),
                       (lbfgsb_solve_fused_tall, "tall")):
        r = solve(fq, x0, lo, hi, consts=(Q,), tile=4, interpret=True, **kw)
        x = np.asarray(r.x)
        assert np.isfinite(x).all(), tag
        assert (x >= np.asarray(lo) - 1e-10).all(), tag
        assert (x <= np.asarray(hi) + 1e-10).all(), tag
        np.testing.assert_allclose(x, np.asarray(ref.x), atol=2e-5,
                                   err_msg=f"{tag} seed={seed}")
