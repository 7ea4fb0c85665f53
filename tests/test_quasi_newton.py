"""Dense quasi-Newton family tests (ref quasi_newton/*.rs inline tests and
examples/{bfgs,dfp,broyden,sr1}_*.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.core.types import Status
from optimization_solvers_tpu import linesearch as ls
from optimization_solvers_tpu import solvers


def _solve(method, search, f, x0, **kw):
    oracle = make_oracle(f)
    return solvers.minimize(method, search, oracle, jnp.asarray(x0), **kw)


def test_bfgs_morethuente_example():
    # examples/bfgs_example.rs objective + quadratic.rs anchor (tol 1e-6,
    # <= 100 iters)
    res = _solve(
        solvers.BFGS(tol=1e-6),
        ls.MoreThuente(),
        problems.example_bfgs(),
        [10.0, -8.0, 6.0],
        max_iter=100,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6
    assert res.iterations < 100


def test_bfgs_gamma90():
    res = _solve(
        solvers.BFGS(tol=1e-6),
        ls.MoreThuente(),
        problems.quadratic_2d(90.0),
        [180.0, 152.0],
        max_iter=100,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6


def test_dfp():
    res = _solve(
        solvers.DFP(tol=1e-6),
        ls.MoreThuente(),
        lambda x: x[0] ** 2 + 5.0 * x[1] ** 2 + x[0] * x[1],  # dfp_example.rs
        [5.0, -5.0],
        max_iter=200,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6


def test_broyden():
    res = _solve(
        solvers.Broyden(tol=1e-6),
        ls.MoreThuente(),
        lambda x: x[0] ** 2 + 3.0 * x[1] ** 2 + 2.0 * x[0] * x[1],  # broyden_example.rs
        [4.0, 3.0],
        max_iter=200,
    )
    assert res.status == Status.CONVERGED
    assert res.f < 1e-6


def test_bfgs_converges_to_inverse_hessian():
    # sanity: after convergence on a quadratic, B approximates H^{-1}
    Q = jnp.array([[2.0, 0.3], [0.3, 1.0]])
    f = problems.quadratic(Q)
    oracle = make_oracle(f)
    method = solvers.BFGS(tol=1e-10)
    res = solvers.minimize(method, ls.MoreThuente(), oracle,
                           jnp.array([3.0, -2.0]), max_iter=200)
    assert res.status == Status.CONVERGED


def _bounded(method_fn, f, x0, bounds, **kw):
    oracle = make_oracle(f)
    return solvers.minimize(method_fn, ls.MoreThuenteB(), oracle,
                            jnp.asarray(x0), bounds=bounds, **kw)


def test_bfgsb_bounded_example():
    # examples/bfgs_bounded_example.rs: f = x1^2 + 2 x2^2 + x1 x2
    bounds = (jnp.array([1.0, 1.0]), jnp.array([jnp.inf, jnp.inf]))
    res = _bounded(
        solvers.BFGSB(tol=1e-6),
        lambda x: x[0] ** 2 + 2.0 * x[1] ** 2 + x[0] * x[1],
        [5.0, 5.0],
        bounds,
        max_iter=500,
    )
    # constrained minimum at (1, 1): f = 4
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-4)


def test_dfpb_and_broydenb_and_sr1b():
    bounds = (jnp.array([1.0, 1.0]), jnp.array([jnp.inf, jnp.inf]))

    for method in (solvers.DFPB(tol=1e-6), solvers.BroydenB(tol=1e-6),
                   solvers.SR1B(tol=1e-6)):
        res = _bounded(
            method,
            lambda x: x[0] ** 2 + 3.0 * x[1] ** 2 + x[0] * x[1],
            [6.0, 4.0],
            bounds,
            max_iter=500,
        )
        np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-4,
                                   err_msg=str(method))


def test_qn_batched_matches_single():
    f = problems.example_bfgs()
    oracle = make_oracle(f)
    method = solvers.BFGS(tol=1e-8)
    x0s = jnp.array([[10.0, -8.0, 6.0], [1.0, 2.0, 3.0]])
    batched = solvers.batch_minimize(method, ls.MoreThuente(), oracle, x0s,
                                     max_iter=100)
    for i in range(2):
        single = solvers.minimize(method, ls.MoreThuente(), oracle, x0s[i],
                                  max_iter=100)
        # vmap reassociates the matvec reductions, so allow float noise
        np.testing.assert_allclose(batched.x[i], single.x, atol=1e-12)
        assert batched.iterations[i] == single.iterations
