"""Fused Pallas L-BFGS solver-kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.types import Status
from optimization_solvers_tpu.ops.pallas_lbfgs import lbfgs_solve_fused


def test_fused_lbfgs_rosenbrock():
    f = problems.rosenbrock()
    x0 = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (8, 20)))
    res = lbfgs_solve_fused(f, x0, m=10, tol=1e-5, max_iter=800,
                            max_iter_ls=20, tile=8, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    assert float(jnp.median(res.f)) < 1e-8
    np.testing.assert_allclose(res.x, jnp.ones_like(res.x), atol=1e-3)


def test_fused_lbfgs_quadratic_batch():
    f = problems.example_bfgs()
    x0 = jnp.asarray(np.random.RandomState(1).uniform(-5, 5, (16, 3)))
    res = lbfgs_solve_fused(f, x0, m=5, tol=1e-8, max_iter=200,
                            max_iter_ls=20, tile=16, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 16
    assert float(jnp.max(res.f)) < 1e-12


def test_fused_lbfgs_multi_tile_grid():
    # grid > 1: two tiles of 8
    f = problems.quadratic_2d(90.0)
    x0 = jnp.asarray(np.random.RandomState(2).uniform(-5, 5, (16, 2)))
    res = lbfgs_solve_fused(f, x0, m=5, tol=1e-8, max_iter=300,
                            max_iter_ls=20, tile=8, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 16
    # per-lane iteration counts: the already-near-optimal lanes stop early
    assert int(res.iterations.min()) <= int(res.iterations.max())


def test_fused_matches_driver_quality():
    # same problem through the unfused driver: comparable final accuracy
    from optimization_solvers_tpu import linesearch as ls, solvers
    from optimization_solvers_tpu.core.oracle import make_oracle

    f = problems.rosenbrock()
    x0 = jnp.asarray(np.random.RandomState(3).uniform(-2, 2, (4, 12)))
    fused = lbfgs_solve_fused(f, x0, m=10, tol=1e-5, max_iter=800,
                              max_iter_ls=20, tile=4, interpret=True)
    driver = solvers.batch_minimize(
        solvers.LBFGS(tol=1e-5, m=10), ls.StrongWolfe(c1=1e-4, c2=0.9),
        make_oracle(f), x0, max_iter=800)
    assert int((fused.status == 1).sum()) == 4
    assert int((driver.status == 1).sum()) == 4
    np.testing.assert_allclose(fused.x, driver.x, atol=1e-3)
