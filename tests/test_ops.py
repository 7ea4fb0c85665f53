"""Compute-kernel tests: Pallas Newton/QN kernels (interpret mode on CPU)
against XLA references, small-matrix Cholesky utilities, and fused-vs-unfused
solver equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu import linesearch as ls, solvers
from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.ops.linalg import cholesky_solve
from optimization_solvers_tpu.ops.pallas_newton import (
    cholesky_solve_masked,
    cholesky_solve_pallas,
)
from optimization_solvers_tpu.ops.pallas_qn import (
    qn_update_direction_pallas,
    qn_update_direction_ref,
)
from optimization_solvers_tpu.ops.smallchol import (
    cholesky_small,
    spd_solve_small,
    spd_solve_small_mat,
)


def _spd(rng, b, n, shift=5.0):
    A = rng.randn(b, n, n)
    return jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + shift * np.eye(n))


def test_masked_and_pallas_cholesky_match_xla():
    rng = np.random.RandomState(0)
    H = _spd(rng, 4, 24)
    g = jnp.asarray(rng.randn(4, 24))
    ref = cholesky_solve(H, g)
    np.testing.assert_allclose(cholesky_solve_masked(H, g), ref, atol=1e-10)
    np.testing.assert_allclose(
        cholesky_solve_pallas(H, g, interpret=True), ref, atol=1e-10
    )


def test_smallchol_solves():
    rng = np.random.RandomState(1)
    A = np.asarray(_spd(rng, 1, 8))[0]
    b = rng.randn(8)
    Bmat = rng.randn(8, 3)
    L = cholesky_small(jnp.asarray(A))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), atol=1e-10)
    np.testing.assert_allclose(
        spd_solve_small(L, jnp.asarray(b)), np.linalg.solve(A, b), atol=1e-9
    )
    np.testing.assert_allclose(
        spd_solve_small_mat(L, jnp.asarray(Bmat)), np.linalg.solve(A, Bmat),
        atol=1e-9,
    )


def test_qn_kernels_match_reference_math():
    rng = np.random.RandomState(2)
    B = _spd(rng, 3, 16, shift=3.0)
    s, y, g = (jnp.asarray(rng.randn(3, 16)) for _ in range(3))
    # lane 1 gets a degenerate (tiny) pair so the in-kernel skip fires
    s = s.at[1].set(s[1] * 1e-12)
    y = y.at[1].set(y[1] * 1e-12)
    skip = jnp.array([False, True, False])
    for kind in ("bfgs", "dfp", "broyden", "sr1"):
        Bn1, Bg1 = qn_update_direction_ref(B, s, y, g, skip, kind=kind)
        Bn2, Bg2 = qn_update_direction_pallas(
            B, s, y, g, tol=1e-8, kind=kind, interpret=True
        )
        np.testing.assert_allclose(Bn1, Bn2, atol=1e-10, err_msg=kind)
        np.testing.assert_allclose(Bg1, Bg2, atol=1e-10, err_msg=kind)
        # skip lane froze B
        np.testing.assert_allclose(Bn1[1], B[1], atol=0)


def test_fused_qn_solver_matches_unfused():
    oracle = make_oracle(problems.example_bfgs())
    x0 = jnp.array([10.0, -8.0, 6.0])
    for update in ("bfgs", "dfp"):
        r1 = solvers.minimize(
            solvers.QuasiNewton(tol=1e-8, update=update), ls.MoreThuente(),
            oracle, x0, max_iter=100)
        r2 = solvers.minimize(
            solvers.QuasiNewton(tol=1e-8, update=update, fused=True),
            ls.MoreThuente(), oracle, x0, max_iter=100)
        assert r1.iterations == r2.iterations
        np.testing.assert_allclose(r1.x, r2.x, atol=1e-12)


def test_fused_qn_bounded_matches_unfused():
    f = lambda x: x[0] ** 2 + 2.0 * x[1] ** 2 + x[0] * x[1]
    oracle = make_oracle(f)
    bounds = (jnp.array([1.0, 1.0]), jnp.array([jnp.inf, jnp.inf]))
    r1 = solvers.minimize(
        solvers.QuasiNewtonB(tol=1e-6), ls.MoreThuenteB(), oracle,
        jnp.array([5.0, 5.0]), bounds=bounds, max_iter=500)
    r2 = solvers.minimize(
        solvers.QuasiNewtonB(tol=1e-6, fused=True), ls.MoreThuenteB(), oracle,
        jnp.array([5.0, 5.0]), bounds=bounds, max_iter=500)
    assert r1.iterations == r2.iterations
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-12)


def test_newton_family_via_dispatch_still_converges():
    # the dispatch seam (ops.linalg.cholesky_solve) picks XLA on CPU
    res = solvers.minimize(
        solvers.ProjectedNewton(grad_tol=1e-8), ls.BackTrackingB(),
        make_oracle(problems.shifted_quadratic_2d(), with_hessian=True),
        jnp.array([0.0, 0.0]),
        bounds=(jnp.array([-jnp.inf, -jnp.inf]), jnp.array([1.0, 1.0])),
        max_iter=100)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)
