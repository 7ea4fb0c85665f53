"""First-order solver family end-to-end tests, mirroring the reference's
inline unit tests (gamma-family ill-conditioned quadratics, bounded
variants) and examples with their tolerances (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.core.types import Status
from optimization_solvers_tpu import linesearch as ls
from optimization_solvers_tpu import solvers


def _solve(method, search, f, x0, **kw):
    oracle = make_oracle(f, with_hessian=getattr(method, "needs_hessian", False))
    return solvers.minimize(method, search, oracle, jnp.asarray(x0), **kw)


# --- gradient descent (ref gradient_descent.rs:86-179) ---------------------

def test_gd_backtracking_quadratic_gamma90():
    res = _solve(
        solvers.GradientDescent(grad_tol=1e-6),
        ls.BackTracking(c1=1e-4, beta=0.5),
        problems.quadratic_2d(90.0),
        [180.0, 152.0],
        max_iter=1000,
    )
    assert res.status == Status.CONVERGED
    assert abs(res.x[0]) < 1e-6
    assert res.f < 1e-6


def test_gd_morethuente_quadratic_gamma90():
    res = _solve(
        solvers.GradientDescent(grad_tol=1e-6),
        ls.MoreThuente(),
        problems.quadratic_2d(90.0),
        [180.0, 152.0],
        max_iter=1000,
    )
    assert res.status == Status.CONVERGED
    assert abs(res.x[0]) < 1e-6
    assert res.f < 1e-6


def test_gd_example_quadratic():
    # examples/gradient_descent_example.rs: f = x^2 + 2y^2, tol 1e-6,
    # <= 100 iterations (BASELINE.md anchor)
    res = _solve(
        solvers.GradientDescent(grad_tol=1e-6),
        ls.BackTracking(c1=1e-4, beta=0.5),
        problems.example_gd(),
        [10.0, -10.0],
        max_iter=100,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6
    assert res.iterations < 100


def test_gd_max_iter_status():
    res = _solve(
        solvers.GradientDescent(grad_tol=1e-6),
        ls.BackTracking(),
        problems.quadratic_2d(1e9),
        [180.0, 152.0],
        max_iter=3,
    )
    assert res.status == Status.MAX_ITER_REACHED
    assert res.iterations == 3


def test_gd_out_of_domain():
    def f(x):
        return jnp.where(x[0] < 0.5, -jnp.log(x[0]) * 0.0 + jnp.nan, (x[0] - 1.0) ** 2)

    res = _solve(
        solvers.GradientDescent(grad_tol=1e-6),
        ls.BackTracking(),
        lambda x: jnp.sqrt(x[0]) * jnp.nan,  # oracle always NaN
        [1.0],
        max_iter=10,
    )
    assert res.status == Status.OUT_OF_DOMAIN


# --- coordinate descent -----------------------------------------------------

def test_coordinate_descent_example():
    # examples/coordinate_descent_example.rs: f = x1^2 + 2x2^2 + 3x3^2
    res = _solve(
        solvers.CoordinateDescent(grad_tol=1e-6),
        ls.BackTracking(c1=1e-4, beta=0.5),
        lambda x: x[0] ** 2 + 2.0 * x[1] ** 2 + 3.0 * x[2] ** 2,
        [10.0, -5.0, 4.0],
        max_iter=2000,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6


def test_coordinate_descent_negative_gradient_start():
    # with a negative-gradient leading coordinate (where the reference's
    # signum quirk would ascend) the fixed Gauss-Southwell rule still works
    res = _solve(
        solvers.CoordinateDescent(grad_tol=1e-6),
        ls.BackTracking(),
        problems.quadratic_2d(90.0),
        [-180.0, -152.0],
        max_iter=5000,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6


# --- p-norm descent ----------------------------------------------------------

def test_pnorm_descent_with_exact_preconditioner():
    # examples/pnorm_descent_example.rs: f = x^2 + 4 y^2; P = hessian
    inv_p = jnp.linalg.inv(jnp.array([[2.0, 0.0], [0.0, 8.0]]))
    res = _solve(
        solvers.PnormDescent(grad_tol=1e-6, inverse_p=inv_p),
        ls.MoreThuente(),
        lambda x: x[0] ** 2 + 4.0 * x[1] ** 2,
        [15.0, -7.0],
        max_iter=100,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6
    # exact preconditioner => Newton-like convergence in very few steps
    assert res.iterations <= 5


# --- projected gradient descent ---------------------------------------------

def test_pgd_constrained_minimum():
    # examples/projected_gradient_example.rs: f = (x-2)^2 + (y-3)^2 with
    # upper bound 1 on both coords -> min 5 at (1, 1)
    bounds = (jnp.array([-jnp.inf, -jnp.inf]), jnp.array([1.0, 1.0]))
    res = _solve(
        solvers.ProjectedGradientDescent(grad_tol=1e-8),
        ls.BackTrackingB(c1=1e-4, beta=0.5),
        problems.shifted_quadratic_2d(),
        [5.0, 5.0],
        bounds=bounds,
        max_iter=1000,
    )
    assert res.status == Status.CONVERGED
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)
    assert abs(res.f - 5.0) < 1e-6


def test_pgd_unbounded_box_matches_gd():
    bounds = (jnp.full(2, -jnp.inf), jnp.full(2, jnp.inf))
    res = _solve(
        solvers.ProjectedGradientDescent(grad_tol=1e-8),
        ls.BackTrackingB(),
        problems.example_gd(),
        [10.0, -10.0],
        bounds=bounds,
        max_iter=1000,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-12


# --- SPG ----------------------------------------------------------------------

def test_spg_gamma1e9_with_active_bound():
    # spg.rs:147-205: gamma=1e9 quadratic, lower bounds [-1, 47] (x1's lower
    # bound ACTIVE at the constrained optimum (0, 47)), GLL search
    gamma = 1e9
    bounds = (jnp.array([-1.0, 47.0]), jnp.array([jnp.inf, jnp.inf]))
    res = _solve(
        solvers.SpectralProjectedGradient(grad_tol=1e-12),
        ls.GLLQuadratic(c1=1e-4, m=10),
        problems.quadratic_2d(gamma),
        [180.0, 152.0],
        bounds=bounds,
        max_iter=10000,
        max_iter_ls=1000,
    )
    assert res.status == Status.CONVERGED
    assert abs(res.x[0]) < 1e-6
    assert res.x[1] == 47.0  # active bound; projected gradient masks it


def test_spg_unconstrained_bowl():
    # examples/spg_example.rs objective
    big = jnp.full(2, jnp.inf)
    res = _solve(
        solvers.SpectralProjectedGradient(grad_tol=1e-6),
        ls.GLLQuadratic(),
        problems.exp_bowl(),
        [1.5, -1.2],
        bounds=(-big, big),
        max_iter=1000,
    )
    assert res.status == Status.CONVERGED
    assert abs(res.f - 1.0) < 1e-6


# --- batching ----------------------------------------------------------------

def test_batch_minimize_vmap_lockstep_masking():
    # per-lane convergence: easy and hard instances in one batch must match
    # their single-instance solves exactly
    f = problems.quadratic_2d(90.0)
    oracle = make_oracle(f)
    method = solvers.GradientDescent(grad_tol=1e-10)
    search = ls.BackTracking()
    x0s = jnp.array([[180.0, 152.0], [1.0, 1.0], [0.0, 0.0], [-7.0, 3.0]])
    batched = solvers.batch_minimize(method, search, oracle, x0s, max_iter=1000)
    for i in range(x0s.shape[0]):
        single = solvers.minimize(method, search, oracle, x0s[i], max_iter=1000)
        np.testing.assert_allclose(batched.x[i], single.x, rtol=0, atol=0)
        assert batched.iterations[i] == single.iterations
        assert batched.status[i] == single.status
    assert batched.iterations[2] == 0  # already-optimal lane takes no steps


def test_jit_wrapped_minimize():
    f = problems.example_gd()
    oracle = make_oracle(f)
    solve = solvers.make_solver(
        solvers.GradientDescent(grad_tol=1e-8), ls.BackTracking(), oracle,
        max_iter=200,
    )
    res = solve(jnp.array([10.0, -10.0]))
    assert res.status == Status.CONVERGED
