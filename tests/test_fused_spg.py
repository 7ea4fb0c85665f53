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
