"""Fused Pallas L-BFGS-B kernel tests (interpret mode on CPU), including
cross-checks against the unfused device implementation and active-bound
geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.core.types import Status
from optimization_solvers_tpu.ops.pallas_lbfgsb import lbfgsb_solve_fused
from optimization_solvers_tpu.solvers.lbfgsb import LbfgsbConfig, lbfgsb_minimize


def test_fused_lbfgsb_bounded_rosenbrock():
    f = problems.rosenbrock()
    n = 20
    x0 = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (8, n)))
    res = lbfgsb_solve_fused(
        f, x0, jnp.full(n, -2.0), jnp.full(n, 2.0),
        m=5, pgtol=1e-6, factr=10.0, max_iter=500, tile=8, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    assert float(jnp.median(res.f)) < 1e-10
    np.testing.assert_allclose(res.x, jnp.ones_like(res.x), atol=1e-4)


def test_fused_lbfgsb_active_bounds():
    # min (x-2)^2 + (y-3)^2 s.t. x,y <= 1 -> (1,1), f = 5
    f = problems.shifted_quadratic_2d()
    x0 = jnp.zeros((4, 2)) + jnp.asarray(
        np.random.RandomState(1).uniform(-0.5, 0.5, (4, 2)))
    res = lbfgsb_solve_fused(
        f, x0, jnp.array([-10.0, -10.0]), jnp.array([1.0, 1.0]),
        m=5, pgtol=1e-8, factr=10.0, max_iter=200, tile=4, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 4
    np.testing.assert_allclose(res.x, np.tile([1.0, 1.0], (4, 1)), atol=1e-6)
    np.testing.assert_allclose(res.f, np.full(4, 5.0), atol=1e-6)


def test_fused_lbfgsb_projects_infeasible_start():
    f = problems.example_gd()
    x0 = jnp.asarray([[-10.0, 10.0], [7.0, -3.0]])
    res = lbfgsb_solve_fused(
        f, x0, jnp.array([2.0, 2.0]), jnp.array([5.0, 5.0]),
        m=5, pgtol=1e-8, factr=10.0, max_iter=200, tile=2, interpret=True)
    np.testing.assert_allclose(res.x, np.tile([2.0, 2.0], (2, 1)), atol=1e-8)


def test_fused_lbfgsb_matches_unfused_quality():
    f = problems.rosenbrock()
    n = 12
    lower, upper = jnp.full(n, -1.5), jnp.full(n, 1.5)
    x0 = jnp.asarray(np.random.RandomState(2).uniform(-1.4, 1.4, (4, n)))
    fused = lbfgsb_solve_fused(
        f, x0, lower, upper, m=5, pgtol=1e-7, factr=10.0, max_iter=1000,
        tile=4, interpret=True)
    cfg = LbfgsbConfig(m=5, pgtol=1e-7, factr=10.0, max_iter=1000)
    oracle = make_oracle(f)
    unfused = jax.vmap(
        lambda x: lbfgsb_minimize(oracle, x, lower, upper, cfg))(x0)
    assert int((fused.status == 1).sum()) == 4
    assert int((unfused.status == 1).sum()) == 4
    # both reach the same minimizer at tolerance (different line searches,
    # so iteration counts differ)
    np.testing.assert_allclose(fused.x, unfused.x, atol=1e-4)


def test_fused_lbfgsb_scaled_ill_conditioned():
    # Jacobi scaling makes the cond-1e6 diagonal quadratic a one-iteration
    # problem for the fused kernel too (interpret mode)
    from optimization_solvers_tpu.ops.pallas_lbfgsb import (
        lbfgsb_solve_fused_scaled)

    n, B = 16, 8
    h = jnp.asarray(np.logspace(0, 6, n))
    # the Hessian diagonal rides the consts path (kernels cannot close
    # over traced arrays)
    f = lambda x, hh: 0.5 * jnp.sum(hh * x * x)
    x0 = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (B, n)))
    res = lbfgsb_solve_fused_scaled(
        f, x0, jnp.full(n, -3.0), jnp.full(n, 3.0), h, consts=(h,),
        m=5, pgtol=1e-6, factr=0.0, max_iter=50, tile=8, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == B
    assert float(jnp.max(res.iterations)) <= 3
    assert float(jnp.max(res.f)) < 1e-12
    # results come back in the original coordinates
    assert float(jnp.max(jnp.abs(res.x))) < 1e-6


def test_fused_lbfgsb_mixed_infinite_bounds():
    # guards the mixed one-sided-bounds geometry end-to-end (the XLA
    # chunked walk had a real CONVERGED-at-x0 bug here, fixed in
    # solvers/lbfgsb.py); the kernel's masked Cauchy-walk update
    # `gof * dt * pvec` now zeroes dt on lanes whose remaining
    # breakpoints are all +inf so 0 * inf cannot enter cvec
    d = jnp.asarray([3.0, 10.0, 1.0, 5.0, 2.0])
    target = jnp.asarray([4.0, -7.0, 9.0, -3.0, 6.0])

    def f(x, dd, tt):
        return 0.5 * jnp.sum(dd * (x - tt) ** 2)

    lower = jnp.asarray([-1.0, -1.0, -1.0, -jnp.inf, -jnp.inf])
    upper = jnp.asarray([1.0, 1.0, 1.0, jnp.inf, jnp.inf])
    x0 = jnp.zeros((4, 5)) + jnp.asarray(
        np.random.RandomState(2).uniform(-0.5, 0.5, (4, 5)))
    # lane 0 starts ON the bounded coords' optimal bounds (their t_break
    # is <= 0, so its only breakpoints are the infinite-bound coords' +inf
    # ones) while the other lanes walk finite breakpoints — the staggered
    # mix that executes the masked dt = inf update
    x0 = x0.at[0].set(jnp.asarray([1.0, -1.0, 1.0, 0.3, -0.2]))
    res = lbfgsb_solve_fused(
        f, x0, lower, upper, consts=(d, target),
        m=5, pgtol=1e-6, factr=10.0, max_iter=300, tile=4, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 4
    expect = np.tile([1.0, -1.0, 1.0, -3.0, 6.0], (4, 1))
    np.testing.assert_allclose(np.asarray(res.x), expect, atol=1e-4)


def test_fused_lbfgsb_column_const_not_repacked():
    """A genuinely-2-D (k, 1) const must reach the objective with its
    original shape: the consts packing ships 1-D consts as (k, 1)
    operands (sublane-resident — the lane-resident layout blew Mosaic's
    register allocator, BENCH_NOTES round 4), and ``const_1d`` is what
    keeps a user's real (k, 1) array from being mistaken for a packed
    1-D one and silently squeezed."""
    n = 6
    rng = np.random.RandomState(5)
    d_col = jnp.asarray(rng.uniform(1.0, 3.0, (n, 1)))   # (k, 1), 2-D
    t_vec = jnp.asarray(rng.uniform(-0.5, 0.5, n))       # (k,), packed

    def f(x, dcol, tv):
        assert dcol.ndim == 2 and tv.ndim == 1           # trace-time shapes
        return 0.5 * jnp.sum(dcol[:, 0] * (x - tv) ** 2)

    x0 = jnp.asarray(rng.uniform(-1.0, 1.0, (4, n)))
    res = lbfgsb_solve_fused(
        f, x0, jnp.full(n, -2.0), jnp.full(n, 2.0), consts=(d_col, t_vec),
        m=4, pgtol=1e-8, factr=10.0, max_iter=200, tile=4, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 4
    np.testing.assert_allclose(
        np.asarray(res.x), np.tile(np.asarray(t_vec), (4, 1)), atol=1e-6)


def test_fused_lbfgsb_statically_unbounded_body(monkeypatch):
    """Every bound infinite and concrete at call time takes the dedicated
    unbounded body (gate + middle factorization skipped at trace time,
    round 4) — semantics must match the bounded kernel run with the same
    infinite bounds passed as traced arrays.  The flag is spied on: the
    original in-jit detection made the body silently unreachable (round-4
    review finding), so the test asserts it actually fires."""
    from optimization_solvers_tpu.ops import pallas_lbfgsb as mod

    seen = []
    orig = mod._make_kernel

    def spy(*args, **kw):
        seen.append(kw.get("unbounded", False))
        return orig(*args, **kw)

    monkeypatch.setattr(mod, "_make_kernel", spy)
    f = problems.rosenbrock()
    n = 16
    x0 = jnp.asarray(np.random.RandomState(5).uniform(-2, 2, (4, n)))
    res = mod.lbfgsb_solve_fused(
        f, x0, jnp.full(n, -jnp.inf), jnp.full(n, jnp.inf),
        m=5, pgtol=1e-7, factr=10.0, max_iter=800, tile=4, interpret=True)
    assert seen == [True], seen
    assert (np.asarray(res.status) == 1).all()
    f_vals = np.asarray(res.f)
    assert ((f_vals < 1e-10) | (np.abs(f_vals - 3.9866) < 1e-2)).all()
    # bounded body forced via a traced-bounds call (jit hides concreteness)
    solve_traced = jax.jit(lambda lo, hi: mod.lbfgsb_solve_fused(
        f, x0, lo, hi, m=5, pgtol=1e-7, factr=10.0, max_iter=800, tile=4,
        interpret=True))
    res_b = solve_traced(jnp.full(n, -jnp.inf), jnp.full(n, jnp.inf))
    assert seen[-1] is False          # traced bounds -> bounded body
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_b.x),
                               atol=1e-8)
    # the two bodies differ by one float reassociation in the direction
    # ((x - r) - x vs -r), so iteration counts may drift by ~1
    assert np.abs(np.asarray(res.iterations).astype(np.int64)
                  - np.asarray(res_b.iterations)).max() <= 2


def test_fused_lbfgsb_per_lane_bounds():
    """Per-lane (B, n) boxes through the fused kernel (round-4 batch-axis
    capability; the single-instance reference cannot express it) — each
    lane must match its own single-instance solve with its own box."""
    d = jnp.linspace(1.0, 20.0, 6)

    def quad(x, dd):
        return 0.5 * jnp.sum(dd * (x - 2.0) ** 2)

    B, n = 4, 6
    rng = np.random.RandomState(8)
    lo = jnp.asarray(np.sort(rng.uniform(-2.0, -0.5, (B, n)), axis=0))
    hi = jnp.asarray(rng.uniform(0.3, 1.8, (B, n)))   # optimum x=2 outside
    x0 = jnp.asarray(rng.uniform(-0.4, 0.2, (B, n)))
    res = lbfgsb_solve_fused(
        quad, x0, lo, hi, consts=(d,),
        m=5, pgtol=1e-8, factr=10.0, max_iter=200, tile=4, interpret=True)
    assert (np.asarray(res.status) == 1).all()
    # optimum is the per-lane upper corner (objective decreasing toward 2)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(hi), atol=1e-6)
    # per-lane single-instance cross-check
    cfg = LbfgsbConfig(m=5, pgtol=1e-8, factr=10.0, max_iter=200)
    oracle = make_oracle(lambda x: quad(x, d))
    r1 = jax.vmap(lambda xi, l, u: lbfgsb_minimize(oracle, xi, l, u, cfg))(
        x0, lo, hi)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(r1.x),
                               atol=1e-7)
