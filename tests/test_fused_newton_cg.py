"""Fused Pallas truncated Newton-CG kernel tests (interpret mode).

Covers the matrix-free second-order path (ops/pallas_newton_cg.py): interior
convergence, active bounds via the two-metric projection, problem data via
consts, and agreement with the L-BFGS-B reference solver on the same
workload.
"""

import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.types import Status
from optimization_solvers_tpu.ops.pallas_newton_cg import newton_cg_solve_fused


def test_newton_cg_rosenbrock_unbounded_interior():
    f = problems.rosenbrock()
    x0 = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (8, 16)))
    res = newton_cg_solve_fused(
        f, x0, jnp.full(16, -5.0), jnp.full(16, 5.0),
        pgtol=1e-8, factr=0.0, max_iter=300, cg_max=40, tile=8,
        interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    f_vals = np.asarray(res.f)
    # global minimum or the local minimum near x0=-1
    assert np.all((f_vals < 1e-12) | (np.abs(f_vals - 3.9866) < 1e-2))
    # superlinear local convergence: far fewer outer iterations than the
    # ~5n lockstep count limited-memory methods need on this family
    assert float(np.median(np.asarray(res.iterations))) < 150


def test_newton_cg_active_bounds_quadratic():
    # minimize 0.5 sum(d x^2) with box [1, 2]^n: optimum pinned at lower=1
    d = jnp.asarray(np.random.RandomState(1).uniform(1.0, 5.0, 8))

    def f(x, diag):
        return 0.5 * jnp.sum(diag * x * x)

    x0 = jnp.asarray(np.random.RandomState(2).uniform(1.0, 2.0, (8, 8)))
    res = newton_cg_solve_fused(
        f, x0, jnp.full(8, 1.0), jnp.full(8, 2.0), consts=(d,),
        pgtol=1e-8, factr=0.0, max_iter=100, tile=8, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    np.testing.assert_allclose(np.asarray(res.x), np.ones((8, 8)), atol=1e-7)


def test_newton_cg_mixed_active_set():
    # reference SPG test geometry (spg.rs:147-205): quadratic with the
    # optimum at (0, 47) — one coordinate bound-active, one interior
    f = problems.quadratic_2d(90.0)
    x0 = jnp.asarray(np.random.RandomState(3).uniform(0, 40, (8, 2)))
    res = newton_cg_solve_fused(
        f, x0, jnp.array([-1.0, 47.0]), jnp.array([1e6, 1e6]),
        pgtol=1e-10, factr=0.0, max_iter=500, tile=8, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    np.testing.assert_allclose(res.x[:, 1], np.full(8, 47.0), atol=1e-9)
    np.testing.assert_allclose(res.x[:, 0], np.zeros(8), atol=1e-7)


def test_newton_cg_matches_lbfgsb():
    # same bounded Rosenbrock workload through the L-BFGS-B driver: both
    # must land on the same stationary points
    from optimization_solvers_tpu.core.oracle import make_oracle
    from optimization_solvers_tpu.solvers.lbfgsb import (
        LbfgsbConfig, lbfgsb_minimize)
    import jax

    f = problems.rosenbrock()
    n = 12
    lower = jnp.full(n, -2.0)
    upper = jnp.full(n, 0.5)   # upper bound ACTIVE at the solution
    x0 = jnp.asarray(np.random.RandomState(4).uniform(-2, 0.5, (8, n)))
    res = newton_cg_solve_fused(
        f, x0, lower, upper, pgtol=1e-7, factr=0.0, max_iter=300,
        cg_max=40, tile=8, interpret=True)
    cfg = LbfgsbConfig(m=8, pgtol=1e-7, factr=0.0, max_iter=500)
    oracle = make_oracle(f)
    ref = jax.vmap(lambda x: lbfgsb_minimize(oracle, x, lower, upper, cfg))(x0)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    np.testing.assert_allclose(np.asarray(res.f), np.asarray(ref.f),
                               rtol=1e-5, atol=1e-8)


def test_newton_cg_xla_solver_matches_fused_kernel():
    # the flexible XLA solver and the fused kernel implement the SAME
    # algorithm (two-metric projection, Steihaug CG, Eisenstat-Walker,
    # projected Armijo) — cross-check final objectives lane-for-lane
    from optimization_solvers_tpu.core.oracle import make_oracle
    from optimization_solvers_tpu.solvers import (
        NewtonCGConfig, newton_cg_batch_minimize)

    f = problems.rosenbrock()
    n = 12
    lower = jnp.full(n, -2.0)
    upper = jnp.full(n, 0.5)
    x0 = jnp.asarray(np.random.RandomState(7).uniform(-2, 0.5, (8, n)))
    fused = newton_cg_solve_fused(
        f, x0, lower, upper, pgtol=1e-7, factr=0.0, max_iter=300,
        cg_max=40, max_iter_ls=25, tile=8, interpret=True)
    cfg = NewtonCGConfig(pgtol=1e-7, factr=0.0, max_iter=300, cg_max=40,
                         max_iter_ls=25)
    xla = newton_cg_batch_minimize(make_oracle(f), x0, lower, upper, cfg)
    assert int((xla.status == Status.CONVERGED).sum()) == 8
    np.testing.assert_allclose(np.asarray(xla.f), np.asarray(fused.f),
                               rtol=1e-6, atol=1e-9)


def test_newton_cg_xla_single_matches_batch():
    from optimization_solvers_tpu.core.oracle import make_oracle
    from optimization_solvers_tpu.solvers import (
        NewtonCGConfig, newton_cg_batch_minimize, newton_cg_minimize)
    import jax

    f = problems.rosenbrock()
    n = 8
    lower = jnp.full(n, -2.0)
    upper = jnp.full(n, 2.0)
    oracle = make_oracle(f)
    cfg = NewtonCGConfig(pgtol=1e-8, factr=0.0, max_iter=200)
    x0s = jnp.asarray(np.random.RandomState(8).uniform(-2, 2, (4, n)))
    batched = newton_cg_batch_minimize(oracle, x0s, lower, upper, cfg)
    for i in range(4):
        single = jax.jit(
            lambda x: newton_cg_minimize(oracle, x, lower, upper, cfg)
        )(x0s[i])
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(single.x), atol=0)
        assert batched.iterations[i] == single.iterations
