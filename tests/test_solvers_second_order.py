"""Newton-family tests (ref newton/mod.rs:72-164, projected_newton.rs,
spn.rs tests) and the newton_example.rs anchor."""

import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.core.types import Status
from optimization_solvers_tpu import linesearch as ls
from optimization_solvers_tpu import solvers


def _solve(method, search, f, x0, **kw):
    oracle = make_oracle(f, with_hessian=True)
    return solvers.minimize(method, search, oracle, jnp.asarray(x0), **kw)


def test_newton_exp_bowl():
    # examples/newton_example.rs: f = x^2+y^2+exp(x^2+y^2), min f = 1 at 0
    res = _solve(
        solvers.Newton(tol=1e-12),
        ls.BackTracking(c1=1e-4, beta=0.5),
        problems.exp_bowl(),
        [1.0, 1.5],
        max_iter=100,
    )
    assert res.status == Status.CONVERGED
    assert abs(res.f - 1.0) < 1e-6
    np.testing.assert_allclose(res.x, [0.0, 0.0], atol=1e-6)


def test_newton_quadratic_one_step():
    # on a quadratic the (undamped) Newton step is exact
    res = _solve(
        solvers.Newton(tol=1e-12),
        ls.NoSearch(),
        problems.quadratic_2d(999.0),
        [180.0, 152.0],
        max_iter=100,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-12
    assert res.iterations <= 2


def test_newton_singular_hessian_falls_back_to_gd():
    # f = x^4 at 0-curvature start: H singular at x=0 -> fallback -g
    def f(x):
        return x[0] ** 4 + x[1] ** 2

    res = _solve(
        solvers.Newton(tol=1e-10),
        ls.BackTracking(),
        f,
        [0.0, 3.0],  # H = diag(0, 2): singular
        max_iter=200,
    )
    # must not blow up; y-coordinate is driven to 0
    assert abs(res.x[1]) < 1e-4


def test_projected_newton_constrained():
    # projected variant of the shifted quadratic: min at the box corner
    bounds = (jnp.array([-jnp.inf, -jnp.inf]), jnp.array([1.0, 1.0]))
    res = _solve(
        solvers.ProjectedNewton(grad_tol=1e-8),
        ls.BackTrackingB(),
        problems.shifted_quadratic_2d(),
        [0.0, 0.0],
        bounds=bounds,
        max_iter=100,
    )
    assert res.status == Status.CONVERGED
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)


def test_spn_constrained():
    bounds = (jnp.array([-1.0, -1.0]), jnp.array([47.0, 47.0]))
    res = _solve(
        solvers.SpectralProjectedNewton(grad_tol=1e-6),
        ls.GLLQuadratic(c1=1e-4, m=5),
        problems.quadratic_2d(90.0),
        [40.0, 30.0],
        bounds=bounds,
        max_iter=1000,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6
