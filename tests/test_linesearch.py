"""Line-search layer tests, mirroring the reference's hand-rolled GD loops
driving the searches directly (backtracking.rs:61-114, morethuente.rs:300-353)."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu import linesearch as ls


def _drive_gd(search, f, x0, bounds=None, max_iter=1000, tol=1e-12):
    """Hand-rolled gradient descent driving the line search directly."""
    oracle = make_oracle(f)
    x = jnp.asarray(x0)
    state = search.init_state(oracle(x))
    for k in range(max_iter):
        ev = oracle(x)
        if float(ev.g @ ev.g) < tol:
            break
        d = -ev.g
        t, state = search.step_len(oracle, x, ev, d, state, bounds, 1000)
        x = x + t * d
    return x, k


def test_backtracking_gd_gamma90():
    x, k = _drive_gd(ls.BackTracking(c1=1e-4, beta=0.5),
                     problems.quadratic_2d(90.0), [180.0, 152.0])
    assert abs(float(x[0])) < 1e-6


def test_morethuente_gd_gamma90():
    x, k = _drive_gd(ls.MoreThuente(), problems.quadratic_2d(90.0),
                     [180.0, 152.0])
    assert abs(float(x[0])) < 1e-6


def test_morethuente_accepts_exact_step_on_sphere():
    # on f = 0.5 ||x||^2, the exact minimizer along -g is t = 1: strong
    # Wolfe holds at the first trial and phi'(1) = 0
    oracle = make_oracle(problems.quadratic_2d(1.0))
    x = jnp.array([3.0, 4.0])
    ev = oracle(x)
    t, _ = ls.MoreThuente().step_len(oracle, x, ev, -ev.g, None, None, 100)
    assert abs(float(t) - 1.0) < 1e-12


def test_backtracking_shrinks_until_armijo():
    # steep quadratic: t=1 overshoots badly, beta-shrinking must kick in
    oracle = make_oracle(problems.quadratic_2d(1000.0))
    x = jnp.array([1.0, 1.0])
    ev = oracle(x)
    t, _ = ls.BackTracking(c1=1e-4, beta=0.5).step_len(
        oracle, x, ev, -ev.g, None, None, 100)
    f_new = oracle.value(x + t * (-ev.g))
    assert float(f_new) < float(ev.f)
    assert 0.0 < float(t) < 1.0


def test_backtracking_nan_shrink_does_not_consume_iterations():
    # out-of-domain trials shrink without consuming the iteration budget
    # (backtracking.rs:37-41)
    def f(x):
        # domain x < 1.25: beyond that, NaN
        return jnp.where(x[0] < 1.25, (x[0] - 1.0) ** 2, jnp.nan)

    oracle = make_oracle(f)
    x = jnp.array([0.0])
    ev = oracle(x)  # g = -2, d = +2 -> t=1 lands at 2.0 (NaN), shrink
    t, _ = ls.BackTracking(c1=1e-4, beta=0.5).step_len(
        oracle, x, ev, -ev.g, None, None, 50)
    x_new = x + t * (-ev.g)
    assert jnp.isfinite(oracle.value(x_new))
    assert float(x_new[0]) < 1.25


def test_backtracking_b_projects_candidates():
    bounds = (jnp.array([-1.0, -1.0]), jnp.array([1.0, 1.0]))
    oracle = make_oracle(problems.shifted_quadratic_2d())
    x = jnp.array([0.0, 0.0])
    ev = oracle(x)
    d = -ev.g  # points to (4, 6), outside the box
    t, _ = ls.BackTrackingB(c1=1e-4, beta=0.5).step_len(
        oracle, x, ev, d, None, bounds, 100)
    assert float(t) > 0.0


def test_morethuente_b_respects_boundary():
    # the max feasible step caps t so x + t d stays in the box
    bounds = (jnp.array([-1.0, -1.0]), jnp.array([1.0, 1.0]))
    oracle = make_oracle(problems.shifted_quadratic_2d())
    x = jnp.array([0.0, 0.0])
    ev = oracle(x)
    d = -ev.g
    mt = ls.MoreThuenteB()
    t, _ = mt.step_len(oracle, x, ev, d, mt.init_state(ev), bounds, 100)
    x_new = x + float(t) * d
    assert jnp.all(x_new <= bounds[1] + 1e-12) and jnp.all(x_new >= bounds[0] - 1e-12)


def test_gll_nonmonotone_history():
    # GLL with m>1 accepts steps a monotone Armijo would reject after a
    # large previous f value enters the history
    search = ls.GLLQuadratic(c1=1e-4, m=5)
    x, k = _drive_gd(search, problems.quadratic_2d(90.0), [180.0, 152.0])
    assert abs(float(x[0])) < 1e-6


def test_nosearch_returns_unit_step():
    oracle = make_oracle(problems.quadratic_2d(1.0))
    x = jnp.array([1.0, 1.0])
    ev = oracle(x)
    t, _ = ls.NoSearch().step_len(oracle, x, ev, -ev.g, None, None, 100)
    assert float(t) == 1.0


def test_linesearch_vmaps():
    # the whole search batches under vmap with per-lane accept masks
    oracle = make_oracle(problems.quadratic_2d(90.0))
    xs = jnp.array([[180.0, 152.0], [1.0, 1.0], [0.1, -0.2]])

    def one(x):
        ev = oracle(x)
        t, _ = ls.MoreThuente().step_len(oracle, x, ev, -ev.g, None, None, 50)
        return t

    ts_batched = jax.vmap(one)(xs)
    for i in range(xs.shape[0]):
        np.testing.assert_allclose(ts_batched[i], one(xs[i]), rtol=1e-15)


def test_hager_zhang_gd_gamma90():
    x, k = _drive_gd(ls.HagerZhang(), problems.quadratic_2d(90.0),
                     [180.0, 152.0])
    assert abs(float(x[0])) < 1e-6


def test_hager_zhang_secant_finds_exact_1d_minimizer():
    # on a quadratic, phi is quadratic in t so the secant step is exact:
    # t* = (g.g)/(g.H g)
    gamma = 999.0
    oracle = make_oracle(problems.quadratic_2d(gamma))
    x = jnp.array([1.0, 1.0])
    ev = oracle(x)
    t, _ = ls.HagerZhang().step_len(oracle, x, ev, -ev.g, None, None, 50)
    t_star = (1.0 + gamma**2) / (1.0 + gamma**3)
    np.testing.assert_allclose(float(t), t_star, rtol=1e-6)


def test_hager_zhang_approximate_wolfe_near_flat():
    # near a minimizer f barely changes; the derivative-only approximate
    # Wolfe test must still accept a step (the classic Armijo stall case)
    oracle = make_oracle(problems.quadratic_2d(1.0))
    x = jnp.array([1e-4, 1e-4])
    ev = oracle(x)
    t, _ = ls.HagerZhang().step_len(oracle, x, ev, -ev.g, None, None, 50)
    f_new = oracle.value(x + t * (-ev.g))
    assert float(f_new) <= float(ev.f)


def test_hager_zhang_vmaps():
    oracle = make_oracle(problems.quadratic_2d(90.0))
    xs = jnp.array([[180.0, 152.0], [1.0, 1.0], [0.1, -0.2]])

    def one(x):
        ev = oracle(x)
        t, _ = ls.HagerZhang().step_len(oracle, x, ev, -ev.g, None, None, 50)
        return t

    ts_batched = jax.vmap(one)(xs)
    for i in range(xs.shape[0]):
        np.testing.assert_allclose(ts_batched[i], one(xs[i]), rtol=1e-15)


def test_hager_zhang_b_respects_boundary():
    bounds = (jnp.array([-1.0, -1.0]), jnp.array([1.0, 1.0]))
    oracle = make_oracle(problems.shifted_quadratic_2d())
    x = jnp.array([0.0, 0.0])
    ev = oracle(x)
    d = -ev.g  # points to (4, 6), outside the box
    t, _ = ls.HagerZhangB().step_len(oracle, x, ev, d, None, bounds, 60)
    x_new = x + float(t) * d
    assert jnp.all(x_new <= bounds[1] + 1e-10)
    assert jnp.all(x_new >= bounds[0] - 1e-10)
    assert float(oracle.value(x + t * d)) < float(ev.f)


def test_hager_zhang_b_unconstrained_when_box_far():
    # with a huge box the bounded variant behaves like the base search
    bounds = (jnp.full((2,), -1e6), jnp.full((2,), 1e6))
    oracle = make_oracle(problems.quadratic_2d(999.0))
    x = jnp.array([1.0, 1.0])
    ev = oracle(x)
    t_b, _ = ls.HagerZhangB().step_len(oracle, x, ev, -ev.g, None, bounds, 50)
    t_u, _ = ls.HagerZhang().step_len(oracle, x, ev, -ev.g, None, None, 50)
    np.testing.assert_allclose(float(t_b), float(t_u), rtol=1e-12)


def test_morethuente_never_accepts_divergent_step_rosenbrock():
    # regression for the reference interval-update quirk
    # (morethuente.rs:293): with the NEXT-trial update, a case-1 step sets
    # tu := t_next and the following iteration exits on t == tu without
    # Wolfe holding — on Rosenbrock-100 the returned step INCREASES f by
    # ~10 orders of magnitude and BFGS diverges to ~1e100.  The corrected
    # default updates the interval at the evaluated t and must keep every
    # accepted step non-increasing in f (non-monotonicity is not part of
    # Moré-Thuente).
    from optimization_solvers_tpu import solvers

    oracle = make_oracle(problems.rosenbrock())
    x0 = jnp.asarray(np.random.RandomState(42).uniform(-2, 2, 100))
    res = solvers.minimize(
        solvers.BFGS(tol=2e-4), ls.MoreThuente(), oracle, x0,
        max_iter=1500, max_iter_ls=40)
    # lands at a true stationary point, not a blow-up
    assert float(res.f) < 1e-2, float(res.f)

    # the quirk-parity mode still exists for reference comparison
    quirk = solvers.minimize(
        solvers.BFGS(tol=2e-4), ls.MoreThuente(reference_quirks=True),
        oracle, x0, max_iter=1500, max_iter_ls=40)
    assert float(quirk.f) > 1e6  # reproduces the reference failure mode


def test_morethuente_unbracketed_extrapolates():
    # regression: with tu still infinite (minimum not bracketed), the
    # case-4 cubic is inf-poisoned and the NaN-collapsing clamp used to
    # land the trial exactly on t_min=0 — a zero step the solver read as
    # "iterate stopped moving" (BFGS stalled at f=2.7 on 2-D Rosenbrock).
    # The force-progress safeguard must extrapolate instead.
    from optimization_solvers_tpu import solvers

    def ros2(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1 - x[:-1]) ** 2)

    res = solvers.minimize(
        solvers.BFGS(tol=1e-6), ls.MoreThuente(),
        make_oracle(ros2), jnp.array([-1.2, 1.0]), max_iter=200)
    assert float(res.f) < 1e-12
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-6)


def test_strong_wolfe_recovers_from_nan_trial():
    # regression: a NaN first trial used to poison the bracket (case1
    # `fp > fx` is False for NaN) and the unbracketed extrapolation ran
    # away geometrically (returned t ~ 5e59); the NaN-safe case test +
    # bracket-midpoint fallback backtrack to an in-domain improving step
    # like the sibling searches
    def f(x):
        return jnp.where(x[0] < 2.0, (x[0] - 1.5) ** 2, jnp.nan).sum()

    oracle = make_oracle(f)
    x = jnp.array([0.0])
    ev = oracle(x)
    d = jnp.array([4.0])
    t, _ = ls.StrongWolfe().step_len(oracle, x, ev, d, None, None, 40)
    xt = x + t * d
    assert float(t) > 0.0
    assert float(xt[0]) < 2.0                      # in-domain
    assert float(oracle(xt).f) < float(ev.f)      # improving


def test_strong_wolfe_non_descent_returns_zero_immediately():
    # MINPACK's INITIAL G >= ZERO guard: an uphill direction returns t=0
    # without burning max_iter oracle evaluations
    def f(x):
        return jnp.sum(x ** 2)

    oracle = make_oracle(f)
    x = jnp.array([1.0])
    ev = oracle(x)
    t, _ = ls.StrongWolfe().step_len(oracle, x, ev, jnp.array([1.0]),
                                     None, None, 100)
    assert float(t) == 0.0


def test_step_len_ev_matches_fresh_eval():
    """Searches that return the accepted FuncEval (dcsrch StrongWolfe,
    Hager-Zhang) must return exactly the evaluation at the accepted point
    — bitwise equal to a fresh oracle call there (same compiled function,
    same input)."""
    import jax

    from optimization_solvers_tpu.core import problems
    from optimization_solvers_tpu.core.oracle import make_oracle

    oracle = make_oracle(problems.rosenbrock())
    x = jnp.asarray([-1.2, 1.0, 0.7, -0.3])
    ev = oracle(x)
    d = -ev.g

    for search in (ls.StrongWolfe(), ls.HagerZhang()):
        t, _, x_new, ev_new = jax.jit(
            lambda x_, ev_, d_, s=search: s.step_len_ev(
                oracle, x_, ev_, d_, None, None, 50))(x, ev, d)
        assert float(t) > 0.0
        fresh = oracle(x_new)
        # same point, same math — but jit-internal vs standalone compilations
        # may fuse differently, so compare to reduction-order tolerance
        np.testing.assert_allclose(np.asarray(ev_new.f),
                                   np.asarray(fresh.f), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(ev_new.g),
                                   np.asarray(fresh.g), rtol=1e-12)
        # and t/state-only callers still work
        t2, _ = search.step_len(oracle, x, ev, d, None, None, 50)
        np.testing.assert_array_equal(np.asarray(t2), np.asarray(t))


def test_step_len_ev_default_path():
    """Value-only searches use the base-class default: evaluate once at the
    accepted point."""
    from optimization_solvers_tpu.core import problems
    from optimization_solvers_tpu.core.oracle import make_oracle

    oracle = make_oracle(problems.example_gd())
    x = jnp.asarray([3.0, -2.0])
    ev = oracle(x)
    t, _, x_new, ev_new = ls.BackTracking().step_len_ev(
        oracle, x, ev, -ev.g, None, None, 50)
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x - t * ev.g))
    fresh = oracle(x_new)
    np.testing.assert_array_equal(np.asarray(ev_new.f), np.asarray(fresh.f))
