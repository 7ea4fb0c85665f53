"""L-BFGS (two-loop) and L-BFGS-B (Byrd-Lu-Nocedal-Zhu) tests.

The L-BFGS-B implementation replaces the reference's Fortran ``setulb_``
FFI (``/root/reference/src/quasi_newton/lbfgsb.rs``); where scipy is
available its (same-ancestry) L-BFGS-B is used as a cross-check oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.core.types import Status
from optimization_solvers_tpu import linesearch as ls
from optimization_solvers_tpu import solvers
from optimization_solvers_tpu.solvers.lbfgsb import LbfgsbConfig, lbfgsb_minimize


# --- unbounded two-loop L-BFGS ------------------------------------------------

def test_lbfgs_quadratic():
    res = solvers.minimize(
        solvers.LBFGS(tol=1e-6, m=10),
        ls.MoreThuente(),
        make_oracle(problems.quadratic_2d(90.0)),
        jnp.array([180.0, 152.0]),
        max_iter=200,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6


def test_lbfgs_rosenbrock_10():
    res = solvers.minimize(
        solvers.LBFGS(tol=1e-5, m=10),
        ls.MoreThuente(),
        make_oracle(problems.rosenbrock()),
        jnp.full(10, -1.2),
        max_iter=500,
    )
    assert res.status == Status.CONVERGED
    np.testing.assert_allclose(res.x, jnp.ones(10), atol=1e-4)


def test_lbfgs_matches_bfgs_small():
    # with m >= iterations, L-BFGS reproduces full BFGS trajectories closely
    oracle = make_oracle(problems.example_bfgs())
    x0 = jnp.array([10.0, -8.0, 6.0])
    r1 = solvers.minimize(solvers.LBFGS(tol=1e-8, m=20), ls.MoreThuente(),
                          oracle, x0, max_iter=100)
    assert r1.status == Status.CONVERGED
    assert r1.f < 1e-10


# --- L-BFGS-B -----------------------------------------------------------------

def test_lbfgsb_unbounded_rosenbrock():
    n = 25
    lower = jnp.full(n, -jnp.inf)
    upper = jnp.full(n, jnp.inf)
    res = lbfgsb_minimize(
        make_oracle(problems.rosenbrock()),
        jnp.full(n, -1.2),
        lower, upper,
        LbfgsbConfig(m=10, pgtol=1e-7, factr=10.0, max_iter=1000),
    )
    assert res.status == Status.CONVERGED
    np.testing.assert_allclose(res.x, jnp.ones(n), atol=1e-4)


def test_lbfgsb_active_bounds_quadratic():
    # min (x-2)^2 + (y-3)^2 s.t. x,y <= 1 -> (1,1), f = 5
    lower = jnp.array([-jnp.inf, -jnp.inf])
    upper = jnp.array([1.0, 1.0])
    res = lbfgsb_minimize(
        make_oracle(problems.shifted_quadratic_2d()),
        jnp.array([0.0, 0.0]),
        lower, upper,
        LbfgsbConfig(m=5, pgtol=1e-8, factr=10.0, max_iter=200),
    )
    assert res.status == Status.CONVERGED
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)
    assert abs(res.f - 5.0) < 1e-6


def test_lbfgsb_bound_active_at_gamma1e9():
    # spg.rs test geometry: gamma=1e9 quadratic on [-1, 47]^2
    lower = jnp.array([-1.0, -1.0])
    upper = jnp.array([47.0, 47.0])
    res = lbfgsb_minimize(
        make_oracle(problems.quadratic_2d(1e9)),
        jnp.array([40.0, 30.0]),
        lower, upper,
        LbfgsbConfig(m=5, pgtol=1e-7, factr=10.0, max_iter=500),
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6


def test_lbfgsb_starts_outside_box():
    # x0 projected into the box at construction (lbfgsb semantics)
    lower = jnp.array([2.0, 2.0])
    upper = jnp.array([5.0, 5.0])
    res = lbfgsb_minimize(
        make_oracle(problems.example_gd()),
        jnp.array([-10.0, 10.0]),
        lower, upper,
        LbfgsbConfig(m=5, pgtol=1e-8, max_iter=200),
    )
    assert res.status == Status.CONVERGED
    np.testing.assert_allclose(res.x, [2.0, 2.0], atol=1e-6)


def test_lbfgsb_vmap_batch():
    n = 10
    lower = jnp.full(n, -2.0)
    upper = jnp.full(n, 2.0)
    oracle = make_oracle(problems.rosenbrock())
    cfg = LbfgsbConfig(m=5, pgtol=1e-6, factr=10.0, max_iter=500)

    x0s = jnp.stack([jnp.full(n, -1.2), jnp.zeros(n), jnp.full(n, 1.5)])
    batched = jax.vmap(
        lambda x0: lbfgsb_minimize(oracle, x0, lower, upper, cfg)
    )(x0s)
    for i in range(x0s.shape[0]):
        single = lbfgsb_minimize(oracle, x0s[i], lower, upper, cfg)
        np.testing.assert_allclose(batched.x[i], single.x, atol=0)
        assert batched.iterations[i] == single.iterations


def test_lbfgsb_against_scipy():
    scipy_opt = pytest.importorskip("scipy.optimize")
    n = 12
    rng = np.random.RandomState(0)
    x0 = rng.uniform(-2, 2, n)
    lower = np.full(n, -1.5)
    upper = np.full(n, 1.5)

    def f_np(x):
        return float(np.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                            + (1.0 - x[:-1]) ** 2))

    def g_np(x):
        g = np.zeros_like(x)
        g[:-1] = -400.0 * x[:-1] * (x[1:] - x[:-1] ** 2) - 2.0 * (1.0 - x[:-1])
        g[1:] += 200.0 * (x[1:] - x[:-1] ** 2)
        return g

    ref_x, ref_f, info = scipy_opt.fmin_l_bfgs_b(
        f_np, x0.copy(), fprime=g_np, bounds=list(zip(lower, upper)),
        m=10, factr=10.0, pgtol=1e-9)

    res = lbfgsb_minimize(
        make_oracle(problems.rosenbrock()),
        jnp.asarray(x0),
        jnp.asarray(lower), jnp.asarray(upper),
        LbfgsbConfig(m=10, pgtol=1e-9, factr=10.0, max_iter=2000),
    )
    assert abs(float(res.f) - ref_f) < 1e-6 * max(1.0, abs(ref_f))
    np.testing.assert_allclose(res.x, ref_x, atol=1e-4)


# --- scaled (diagonally preconditioned) L-BFGS-B ------------------------------

def test_scaled_lbfgsb_jacobi_beats_plain_on_ill_conditioned():
    # H = diag(logspace(0, 6, n)): plain L-BFGS-B crawls, Jacobi-scaled
    # converges in O(1) iterations (the scaled problem is the identity)
    from optimization_solvers_tpu.solvers.lbfgsb import lbfgsb_minimize_scaled

    n = 50
    h = jnp.asarray(np.logspace(0, 6, n))
    oracle = make_oracle(lambda x: 0.5 * jnp.sum(h * x * x))
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(-2, 2, n))
    lo = jnp.full((n,), -3.0)
    hi = jnp.full((n,), 3.0)
    cfg = LbfgsbConfig(m=5, pgtol=1e-6, factr=0.0, max_iter=200)
    r = lbfgsb_minimize_scaled(oracle, x0, lo, hi, h, cfg)
    assert int(r.status) == int(Status.CONVERGED)
    assert int(r.iterations) <= 3
    assert float(r.f) < 1e-12
    # result is reported in the ORIGINAL coordinates
    assert bool(jnp.all(jnp.abs(r.x) < 1e-6))


def test_scaled_lbfgsb_respects_active_bounds():
    from optimization_solvers_tpu.solvers.lbfgsb import lbfgsb_minimize_scaled

    n = 20
    h = jnp.asarray(np.logspace(0, 4, n))
    oracle = make_oracle(lambda x: 0.5 * jnp.sum(h * (x - 2.0) ** 2))
    x0 = jnp.zeros((n,))
    lo = jnp.full((n,), -1.0)
    hi = jnp.full((n,), 1.0)  # unconstrained min x=2 is outside: all active
    cfg = LbfgsbConfig(m=5, pgtol=1e-8, factr=0.0, max_iter=200)
    r = lbfgsb_minimize_scaled(oracle, x0, lo, hi, h, cfg)
    assert int(r.status) == int(Status.CONVERGED)
    np.testing.assert_allclose(np.asarray(r.x), 1.0, atol=1e-8)
    # gradient is mapped back to original coordinates: g = h*(x-2)
    np.testing.assert_allclose(np.asarray(r.g), np.asarray(h) * (-1.0),
                               rtol=1e-6)


def test_scaled_lbfgsb_identity_diag_matches_plain():
    from optimization_solvers_tpu.solvers.lbfgsb import lbfgsb_minimize_scaled

    oracle = make_oracle(problems.rosenbrock())
    n = 8
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.uniform(-2, 2, n))
    lo = jnp.full((n,), -5.0)
    hi = jnp.full((n,), 5.0)
    cfg = LbfgsbConfig(m=5, pgtol=1e-8, factr=10.0, max_iter=500)
    r_plain = lbfgsb_minimize(oracle, x0, lo, hi, cfg)
    r_one = lbfgsb_minimize_scaled(oracle, x0, lo, hi, jnp.ones((n,)), cfg)
    assert int(r_one.iterations) == int(r_plain.iterations)
    np.testing.assert_allclose(np.asarray(r_one.x), np.asarray(r_plain.x),
                               atol=1e-10)


def test_api_lbfgsb_precond_diag():
    from optimization_solvers_tpu import api

    n = 30
    h = np.logspace(0, 5, n)
    hj = jnp.asarray(h)
    oracle = make_oracle(lambda x: 0.5 * jnp.sum(hj * x * x))
    solver = api.Lbfgsb(n)
    for i in range(n):
        solver.set_lower_bound(i, -3.0)
        solver.set_upper_bound(i, 3.0)
    solver.set_pgtol(1e-6)
    solver.max_iteration(100)
    solver.set_precond_diag(h)
    rng = np.random.RandomState(2)
    solver.minimize(oracle, jnp.asarray(rng.uniform(-2, 2, n)))
    assert float(solver.result.f) < 1e-10
    assert int(solver.result.iterations) <= 3


def test_lbfgsb_lockstep_batch_matches_single():
    # the lockstep batched driver (one global while over a vmapped step)
    # must agree lane-for-lane with independent single solves — including
    # per-lane iteration counts (frozen lanes stop counting)
    from optimization_solvers_tpu.solvers import lbfgsb_batch_minimize

    n = 10
    lower = jnp.full(n, -2.0)
    upper = jnp.full(n, 2.0)
    oracle = make_oracle(problems.rosenbrock())
    cfg = LbfgsbConfig(m=5, pgtol=1e-6, factr=10.0, max_iter=500)

    x0s = jnp.stack([jnp.full(n, -1.2), jnp.zeros(n), jnp.full(n, 1.5)])
    batched = lbfgsb_batch_minimize(oracle, x0s, lower, upper, cfg)
    for i in range(x0s.shape[0]):
        single = lbfgsb_minimize(oracle, x0s[i], lower, upper, cfg)
        np.testing.assert_allclose(batched.x[i], single.x, atol=0)
        assert batched.iterations[i] == single.iterations
        assert batched.status[i] == single.status


def test_lbfgsb_gcp_chunk_invariance():
    # the chunked generalized-Cauchy-point walk must examine breakpoints in
    # exactly the sorted order regardless of chunk size: K=1 degenerates to
    # the one-segment-per-trip walk, K>n to a single chunk.  Bound-rich
    # setup (minimum far outside a tight box) so the sweep crosses many
    # breakpoints.
    n = 60
    rng = np.random.RandomState(0)
    d = jnp.asarray(rng.uniform(0.5, 50.0, n))
    target = jnp.asarray(rng.uniform(2.0, 4.0, n) * np.sign(rng.randn(n)))
    oracle = make_oracle(lambda x: 0.5 * jnp.sum(d * (x - target) ** 2))
    lower = jnp.full(n, -1.0)
    upper = jnp.full(n, 1.0)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, n))

    results = [
        lbfgsb_minimize(
            oracle, x0, lower, upper,
            LbfgsbConfig(m=5, pgtol=1e-8, factr=10.0, max_iter=200,
                         gcp_chunk=k),
        )
        for k in (1, 7, 64, 256)
    ]
    ref = results[0]
    assert ref.status == Status.CONVERGED
    # active bounds at the solution prove the walk actually fixed variables
    assert int(jnp.sum(jnp.abs(jnp.abs(ref.x) - 1.0) < 1e-9)) > n // 2
    for res in results[1:]:
        np.testing.assert_allclose(res.x, ref.x, rtol=0, atol=1e-12)
        assert int(res.iterations) == int(ref.iterations)
        assert int(res.status) == int(ref.status)


def test_lbfgsb_no_stall_on_bound_dust():
    # regression: under jit, fused rounding can leave ~1e-18 of "dust" on a
    # direction coordinate sitting exactly on its bound; the bounded dcsrch
    # max-feasible-step then collapses to -0.0 and the factr stall test
    # exits CONVERGED at a non-optimum.  Found by hypothesis (seed 1209,
    # n=5 quadratic); fixed by box-projecting the subspace step's xbar.
    n, seed = 5, 1209
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(n, n))
    eigs = np.logspace(0, 2.0, n)
    Q = jnp.asarray((q * eigs) @ q.T)
    x0 = jnp.asarray(rng.uniform(-5, 5, n))

    def f(x):
        return 0.5 * x @ Q @ x

    rng2 = np.random.RandomState(seed + 2)
    lo = jnp.asarray(np.sort(rng2.uniform(-3, 0, n)))
    hi = jnp.asarray(np.sort(rng2.uniform(0.5, 3, n)))
    cfg = LbfgsbConfig(m=5, pgtol=1e-8, factr=10.0, max_iter=500)
    res = lbfgsb_minimize(make_oracle(f), x0, lo, hi, cfg)
    assert res.status == Status.CONVERGED
    # stalled runs returned f ~ 1.46 after 6 iterations
    assert float(res.f) < 1e-10


def test_lbfgsb_mixed_infinite_bounds():
    # regression: the chunked Cauchy-point walk computed q with
    # zb = bound - x = +-inf for coordinates whose breakpoint is infinite
    # (one-sided/absent bounds); the 0 * inf in the prefix matmul and the
    # one-hot selection NaN-poisoned the whole chunk and the solver exited
    # CONVERGED at the initial point.  api.Lbfgsb defaults bounds to
    # +-inf, so any partially-bounded problem hits this path.
    n = 5
    d = jnp.asarray([3.0, 10.0, 1.0, 5.0, 2.0])
    target = jnp.asarray([4.0, -7.0, 9.0, -3.0, 6.0])
    oracle = make_oracle(lambda x: 0.5 * jnp.sum(d * (x - target) ** 2))
    lower = jnp.asarray([-1.0, -1.0, -1.0, -jnp.inf, -jnp.inf])
    upper = jnp.asarray([1.0, 1.0, 1.0, jnp.inf, jnp.inf])
    x0 = jnp.zeros(n)
    cfg = LbfgsbConfig(m=5, pgtol=1e-8, factr=10.0, max_iter=200)
    res = lbfgsb_minimize(oracle, x0, lower, upper, cfg)
    assert res.status == Status.CONVERGED
    # bounded coords pinned at their bounds, free coords at the target
    expect = jnp.asarray([1.0, -1.0, 1.0, -3.0, 6.0])
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(expect),
                               atol=1e-6)
