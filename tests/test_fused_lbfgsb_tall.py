"""Tall-layout fused L-BFGS-B kernel (ops/pallas_lbfgsb_tall.py): interpret-
mode correctness on reference geometries and cross-checks against the XLA
and scipy implementations — the large-n (config-4 class) sibling of
tests/test_fused_lbfgsb.py, with the GCP found by segment bisection
instead of a breakpoint walk."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.core.types import Status
from optimization_solvers_tpu.ops.pallas_lbfgsb_tall import (
    lbfgsb_solve_fused_tall,
)
from optimization_solvers_tpu.solvers.lbfgsb import (
    LbfgsbConfig,
    lbfgsb_batch_minimize,
    lbfgsb_minimize,
)


def test_tall_bounded_rosenbrock():
    f = problems.rosenbrock()
    n = 20
    x0 = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (8, n)))
    res = lbfgsb_solve_fused_tall(
        f, x0, jnp.full(n, -2.0), jnp.full(n, 2.0),
        m=5, pgtol=1e-6, factr=10.0, max_iter=500, tile=8, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 8
    assert float(jnp.median(res.f)) < 1e-10
    np.testing.assert_allclose(res.x, jnp.ones_like(res.x), atol=1e-4)


def test_tall_active_bounds_and_infeasible_start():
    f = problems.shifted_quadratic_2d()
    x0 = jnp.zeros((4, 2)) + jnp.asarray(
        np.random.RandomState(1).uniform(-0.5, 0.5, (4, 2)))
    res = lbfgsb_solve_fused_tall(
        f, x0, jnp.array([-10.0, -10.0]), jnp.array([1.0, 1.0]),
        m=5, pgtol=1e-8, factr=10.0, max_iter=200, tile=4, interpret=True)
    assert int((res.status == Status.CONVERGED).sum()) == 4
    np.testing.assert_allclose(res.x, np.tile([1.0, 1.0], (4, 1)), atol=1e-6)
    np.testing.assert_allclose(res.f, np.full(4, 5.0), atol=1e-6)

    fg = problems.example_gd()
    x0 = jnp.asarray([[-10.0, 10.0], [7.0, -3.0]])
    res = lbfgsb_solve_fused_tall(
        fg, x0, jnp.array([2.0, 2.0]), jnp.array([5.0, 5.0]),
        m=5, pgtol=1e-8, factr=10.0, max_iter=200, tile=2, interpret=True)
    np.testing.assert_allclose(res.x, np.tile([2.0, 2.0], (2, 1)), atol=1e-8)


def test_tall_mixed_infinite_bounds_matches_xla():
    """Random rotated SPD quadratic with mixed finite/inf bounds: the
    bisection GCP must land on the same constrained minimizer as the XLA
    walk (the geometry class where the chunked walk had its NaN bug,
    BENCH_NOTES round 2)."""
    n = 16
    rng = np.random.RandomState(5)
    q, _ = np.linalg.qr(rng.randn(n, n))
    Q = jnp.asarray((q * np.logspace(0, 2, n)) @ q.T)

    def fq(x, Qm):
        return 0.5 * jnp.sum(x * (Qm @ x))

    lo = jnp.asarray(np.where(rng.rand(n) < 0.3, -np.inf,
                              np.sort(rng.uniform(-2, 0, n))))
    hi = jnp.asarray(np.where(rng.rand(n) < 0.3, np.inf,
                              np.sort(rng.uniform(0.3, 2, n))))
    x0 = jnp.asarray(rng.uniform(-2, 2, (8, n)))
    res = lbfgsb_solve_fused_tall(
        fq, x0, lo, hi, consts=(Q,),
        m=5, pgtol=1e-7, factr=10.0, max_iter=500, tile=8, interpret=True)
    cfg = LbfgsbConfig(m=5, pgtol=1e-7, factr=10.0, max_iter=500)
    oracle = make_oracle(fq, data=(Q,))
    unf = jax.vmap(lambda x: lbfgsb_minimize(oracle, x, lo, hi, cfg))(x0)
    assert (np.asarray(res.status) == 1).all()
    assert (np.asarray(unf.status) == 1).all()
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(unf.x),
                               atol=1e-6)


def test_tall_config4_class_lse_matches_xla_and_scipy():
    """The target workload class in miniature: bounded log-sum-exp with a
    TIGHT box (most coordinates end on a bound, so the GCP bisection and
    masked subspace do real work).  Trajectory-level agreement with the
    XLA backend (iteration counts within the Armijo-vs-dcsrch wobble) and
    a scipy L-BFGS-B anchor."""
    n, rows, B = 400, 64, 8
    A = np.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                     (rows, n))) / np.sqrt(n)
    b = np.linspace(-1.0, 1.0, rows)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    def lse(x, A_, b_):
        z = A_ @ x + b_
        mx = jnp.max(z)
        return mx + jnp.log(jnp.sum(jnp.exp(z - mx)))

    lo = jnp.full(n, -0.1)
    hi = jnp.full(n, 0.1)
    x0 = jnp.asarray(np.random.RandomState(4).uniform(-0.05, 0.05, (B, n)))
    res = lbfgsb_solve_fused_tall(
        lse, x0, lo, hi, consts=(Aj, bj),
        m=10, pgtol=1e-7, factr=10.0, max_iter=300, tile=8, interpret=True)
    oracle = make_oracle(lse, data=(Aj, bj))
    cfg = LbfgsbConfig(m=10, pgtol=1e-7, factr=10.0, max_iter=300)
    unf = lbfgsb_batch_minimize(oracle, x0, lo, hi, cfg)
    assert (np.asarray(res.status) == 1).all()
    np.testing.assert_allclose(np.asarray(res.f), np.asarray(unf.f),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(unf.x),
                               atol=1e-4)
    assert np.abs(np.asarray(res.iterations).astype(int)
                  - np.asarray(unf.iterations).astype(int)).max() <= 4

    from scipy.optimize import fmin_l_bfgs_b

    def fg(x):
        z = A @ x + b
        mm = z.max()
        e = np.exp(z - mm)
        s = e.sum()
        return mm + np.log(s), A.T @ (e / s)

    xs, fs, _ = fmin_l_bfgs_b(fg, np.asarray(x0[0]),
                              bounds=[(-0.1, 0.1)] * n,
                              m=10, pgtol=1e-7, factr=10.0)
    assert abs(fs - float(res.f[0])) < 1e-9 * max(1.0, abs(fs))
    np.testing.assert_allclose(xs, np.asarray(res.x[0]), atol=1e-4)


def test_tall_abnormal_and_max_iter_statuses():
    # a 1-iteration budget on a hard problem reports MAX_ITER_REACHED
    f = problems.rosenbrock()
    n = 8
    x0 = jnp.asarray(np.random.RandomState(2).uniform(-2, 2, (2, n)))
    res = lbfgsb_solve_fused_tall(
        f, x0, jnp.full(n, -2.0), jnp.full(n, 2.0),
        m=5, pgtol=1e-12, factr=0.0, max_iter=1, tile=2, interpret=True)
    assert (np.asarray(res.status) == int(Status.MAX_ITER_REACHED)).all()


def test_tall_per_lane_bounds():
    """Per-lane (B, n) boxes through the tall kernel: lanes with different
    active sets must each land on their own constrained minimizer."""
    n, B = 24, 4
    rng = np.random.RandomState(11)
    dd = jnp.asarray(np.linspace(1.0, 9.0, n))

    def quad(x, d_):
        return 0.5 * jnp.sum(d_ * (x - 1.5) ** 2)

    lo = jnp.asarray(rng.uniform(-2.0, -1.0, (B, n)))
    hi = jnp.asarray(rng.uniform(0.2, 3.0, (B, n)))
    x0 = jnp.asarray(rng.uniform(-0.5, 0.1, (B, n)))
    res = lbfgsb_solve_fused_tall(
        quad, x0, lo, hi, consts=(dd,),
        m=5, pgtol=1e-8, factr=10.0, max_iter=300, tile=4, interpret=True)
    assert (np.asarray(res.status) == 1).all()
    # separable objective: per-coordinate optimum is clip(1.5, lo, hi)
    expect = np.clip(1.5, np.asarray(lo), np.asarray(hi))
    np.testing.assert_allclose(np.asarray(res.x), expect, atol=1e-6)


def test_tall_dcsrch_iteration_parity_with_xla_backend():
    """line_search="dcsrch" (round 5): the tall kernel runs the MINPACK
    dcsrch strong-Wolfe state machine in-kernel — the Fortran core's exact
    pairing (lbfgsb.rs:36-57) — so ITERATION COUNTS match the XLA dcsrch
    backend, not just minimizers (VERDICT round-4 item 4)."""
    from optimization_solvers_tpu.core.oracle import make_oracle
    from optimization_solvers_tpu.solvers.lbfgsb import (
        LbfgsbConfig, lbfgsb_batch_minimize)

    rng = np.random.RandomState(0)
    rows, n, B = 64, 256, 4
    A = jnp.asarray(rng.normal(size=(rows, n)) / np.sqrt(n), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, rows), jnp.float32)

    def lse(x, A, b):
        z = A @ x - b
        zmax = jnp.max(z)
        return (zmax + jnp.log(jnp.sum(jnp.exp(z - zmax)))
                + 0.005 * jnp.sum(x * x))

    lo = jnp.full(n, -1.0, jnp.float32)
    hi = jnp.full(n, 1.0, jnp.float32)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)), jnp.float32)
    r = lbfgsb_solve_fused_tall(
        lse, x0, lo, hi, (A, b), m=5, pgtol=1e-3, factr=100.0, max_iter=60,
        tile=4, interpret=True, line_search="dcsrch")
    rx = lbfgsb_batch_minimize(
        make_oracle(lse, data=(A, b)), x0, lo, hi,
        LbfgsbConfig(m=5, pgtol=1e-3, factr=100.0, max_iter=60))
    np.testing.assert_array_equal(np.asarray(r.iterations),
                                  np.asarray(rx.iterations))
    np.testing.assert_allclose(np.asarray(r.f), np.asarray(rx.f),
                               rtol=1e-4)
    # benign class: the GCP single-crossing guard stays quiet
    assert not np.asarray(r.gcp_multimodal).any()


def test_tall_gcp_multicrossing_guard():
    """The segment-bisection single-crossing guard (round 5, VERDICT item
    7): on an ill-conditioned strongly-coupled bound-active quadratic the
    path derivative develops multiple crossings and the kernel FLAGS the
    lane (SolveResult.gcp_multimodal); a benign separable quadratic stays
    unflagged.  Geometry found by randomized search (seed pinned)."""
    rng = np.random.RandomState(0)          # trial 0 of the search script
    n = 8
    Q = rng.normal(size=(n, n))
    A = (Q @ Q.T + 0.05 * np.eye(n)).astype(np.float32)
    scale = np.diag(np.exp(rng.uniform(0, 3, n))).astype(np.float32)
    A = scale @ A @ scale
    b = rng.normal(size=n).astype(np.float32) * 10
    lo = rng.uniform(-1.5, -0.1, n).astype(np.float32)
    hi = rng.uniform(0.1, 1.5, n).astype(np.float32)
    x0 = rng.uniform(lo, hi, (2, n)).astype(np.float32)

    def quad(x, A, b):
        return 0.5 * jnp.sum(x * (A @ x)) - jnp.sum(b * x)

    r = lbfgsb_solve_fused_tall(
        quad, jnp.asarray(x0), jnp.asarray(lo), jnp.asarray(hi),
        (jnp.asarray(A), jnp.asarray(b)), m=3, pgtol=1e-6, factr=0.0,
        max_iter=30, tile=2, interpret=True)
    flags = np.asarray(r.gcp_multimodal)
    assert flags[0], flags                  # the found multi-crossing lane

    # negative control: separable well-conditioned quadratic, boxes active
    d = jnp.linspace(1.0, 3.0, n).astype(jnp.float32)

    def sep(x, d):
        return 0.5 * jnp.sum(d * (x - 2.0) ** 2)

    r2 = lbfgsb_solve_fused_tall(
        sep, jnp.zeros((2, n), jnp.float32), jnp.asarray(lo),
        jnp.asarray(hi), (d,), m=3, pgtol=1e-6, factr=0.0,
        max_iter=30, tile=2, interpret=True)
    assert not np.asarray(r2.gcp_multimodal).any()
    assert (np.asarray(r2.status) == 1).all()
