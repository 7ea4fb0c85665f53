"""Fused Pallas SPG kernel tests (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.types import Status
from optimization_solvers_tpu.ops.pallas_spg import spg_solve_fused


def test_fused_spg_active_bound_geometry():
    # the reference SPG test geometry (spg.rs:147-205): gamma=90 quadratic,
    # lower bound 47 on x1 active at the constrained optimum (0, 47)
    f = problems.quadratic_2d(90.0)
    x0 = jnp.asarray(np.random.RandomState(0).uniform(0, 40, (8, 2)))
    res = spg_solve_fused(
        f, x0, jnp.array([-1.0, 47.0]), jnp.array([jnp.inf, jnp.inf]),
        tol=1e-10, max_iter=2000, tile=8, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    np.testing.assert_array_equal(res.x[:, 1], np.full(8, 47.0))
    np.testing.assert_allclose(res.x[:, 0], np.zeros(8), atol=1e-8)


def test_fused_spg_exp_bowl():
    res = spg_solve_fused(
        problems.exp_bowl(),
        jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (8, 2))),
        jnp.array([-1.0, -1.0]), jnp.array([1.0, 1.0]),
        tol=1e-8, max_iter=500, tile=8, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    np.testing.assert_allclose(res.f, np.ones(8), atol=1e-10)


def test_fused_spg_box_quadratic_batch():
    # config-3 shape: box-constrained random diagonal quadratic; the
    # diagonal rides in as problem data (consts) rather than a closure
    d = jnp.asarray(np.random.RandomState(2).uniform(1.0, 10.0, 16))

    def f(x, diag):
        return 0.5 * jnp.sum(diag * x * x)

    x0 = jnp.asarray(np.random.RandomState(3).uniform(-3, 3, (16, 16)))
    res = spg_solve_fused(
        f, x0, jnp.full(16, -2.0), jnp.full(16, 2.0), consts=(d,),
        tol=1e-8, max_iter=1000, tile=16, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 16
    np.testing.assert_allclose(res.x, np.zeros((16, 16)), atol=1e-7)


def test_fused_bfgs_rosenbrock():
    from optimization_solvers_tpu.ops.pallas_bfgs import bfgs_solve_fused

    f = problems.rosenbrock()
    x0 = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (8, 20)))
    res = bfgs_solve_fused(f, x0, tol=1e-5, max_iter=800, tile=4,
                           interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    # every lane lands at a true stationary point: the global minimum
    # (f=0, x=1) or Rosenbrock's local minimum near x0=-1 (f~3.99)
    f_vals = np.asarray(res.f)
    assert np.all((f_vals < 1e-8) | (np.abs(f_vals - 3.9866) < 1e-2))
    global_lanes = f_vals < 1e-8
    np.testing.assert_allclose(
        np.asarray(res.x)[global_lanes],
        np.ones((int(global_lanes.sum()), 20)), atol=1e-4)


def test_fused_bfgs_quadratic_exact():
    from optimization_solvers_tpu.ops.pallas_bfgs import bfgs_solve_fused

    res = bfgs_solve_fused(
        problems.example_bfgs(),
        jnp.asarray(np.random.RandomState(1).uniform(-5, 5, (8, 3))),
        tol=1e-8, max_iter=200, tile=4, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    assert float(jnp.max(res.f)) < 1e-14
