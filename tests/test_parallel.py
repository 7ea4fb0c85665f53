"""Mesh/sharding layer tests on the virtual 8-device CPU mesh: sharded
solves must match local solves per-lane, and the scaling harness must
produce efficiency records."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from optimization_solvers_tpu import linesearch as ls, solvers
from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.parallel import (
    make_mesh,
    scaling_report,
    sharded_batch_minimize,
    sharded_lbfgsb_minimize,
    sharded_summary,
)
from optimization_solvers_tpu.solvers.lbfgsb import LbfgsbConfig, lbfgsb_minimize

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def test_sharded_gd_matches_local():
    mesh = Mesh(jax.devices()[:8], ("dp",))
    oracle = make_oracle(problems.quadratic_2d(90.0))
    method = solvers.GradientDescent(grad_tol=1e-8)
    x0 = jnp.asarray(np.random.RandomState(0).uniform(-5, 5, (64, 2)))
    res = sharded_batch_minimize(
        method, ls.BackTracking(), oracle, x0, mesh=mesh, max_iter=2000)
    local = solvers.batch_minimize(
        method, ls.BackTracking(), oracle, x0, max_iter=2000)
    np.testing.assert_array_equal(res.iterations, local.iterations)
    np.testing.assert_allclose(res.x, local.x, atol=1e-12)
    stats = sharded_summary(res, mesh)
    assert stats["converged"] == 64


def test_sharded_bounded_replicated_bounds():
    mesh = Mesh(jax.devices()[:8], ("dp",))
    oracle = make_oracle(problems.shifted_quadratic_2d())
    bounds = (jnp.array([-jnp.inf, -jnp.inf]), jnp.array([1.0, 1.0]))
    x0 = jnp.asarray(np.random.RandomState(1).uniform(-3, 3, (16, 2)))
    res = sharded_batch_minimize(
        solvers.ProjectedGradientDescent(grad_tol=1e-8), ls.BackTrackingB(),
        oracle, x0, mesh=mesh, bounds=bounds, max_iter=1000)
    np.testing.assert_allclose(
        res.x, np.tile([1.0, 1.0], (16, 1)), atol=1e-6)


def test_sharded_lbfgsb_matches_local():
    mesh = Mesh(jax.devices()[:8], ("dp",))
    n = 20
    oracle = make_oracle(problems.rosenbrock())
    lower, upper = jnp.full(n, -5.0), jnp.full(n, 5.0)
    cfg = LbfgsbConfig(m=5, pgtol=1e-6, factr=10.0, max_iter=500)
    x0 = jnp.asarray(np.random.RandomState(2).uniform(-2, 2, (32, n)))
    res = sharded_lbfgsb_minimize(oracle, x0, lower, upper, cfg, mesh=mesh)
    local = jax.vmap(
        lambda x: lbfgsb_minimize(oracle, x, lower, upper, cfg))(x0)
    assert sharded_summary(res, mesh)["converged"] == 32
    # solutions agree to the stopping tolerance (compilation differences
    # may reorder reductions between the sharded and local programs)
    np.testing.assert_allclose(res.x, local.x, atol=1e-5)
    np.testing.assert_allclose(res.f, local.f, atol=1e-10)


def test_scaling_report_runs():
    oracle = make_oracle(problems.quadratic_2d(90.0))
    method = solvers.GradientDescent(grad_tol=1e-8)
    x0 = jnp.asarray(np.random.RandomState(3).uniform(-5, 5, (64, 2)))

    def solve_fn(mesh):
        return sharded_batch_minimize(
            method, ls.BackTracking(), oracle, x0, mesh=mesh, max_iter=2000)

    recs = scaling_report(solve_fn, batch=64, device_counts=[1, 2, 8])
    assert [r["devices"] for r in recs] == [1, 2, 8]
    assert recs[0]["efficiency"] == 1.0
    assert all(r["solves_per_sec"] > 0 for r in recs)


def test_make_mesh_helper():
    mesh = make_mesh((8, 1))
    assert mesh.shape == {"dp": 8, "tp": 1}


def test_sharded_fused_lbfgsb_matches_single_device():
    # shard_map must not change the kernel's semantics: the sharded run
    # must agree BIT-FOR-BIT with unsharded per-shard calls of the same
    # kernel (identical shapes, grid=1 — exactly what shard_map traces on
    # each device).  The full-batch (grid=8) run is only checked to
    # tolerance: in interpret mode XLA-CPU compiles a grid-1 and a grid-8
    # pallas grid loop differently (single-trip loop inlining changes FMA
    # contraction), giving ~1-ulp direction differences that can cascade
    # to +-1 iteration over a long Rosenbrock solve.  On real TPU the
    # Mosaic kernel body is compiled once regardless of grid length.
    from optimization_solvers_tpu.ops.pallas_lbfgsb import lbfgsb_solve_fused
    from optimization_solvers_tpu.parallel import (
        make_mesh, sharded_lbfgsb_solve_fused)

    f = problems.rosenbrock()
    n, B = 8, 32                      # 8 devices x shard 4, tile 4
    x0 = jnp.asarray(np.random.RandomState(3).uniform(-2, 2, (B, n)))
    lo = jnp.full((n,), -3.0)
    hi = jnp.full((n,), 3.0)
    mesh = make_mesh((8,), ("dp",))
    kw = dict(m=5, pgtol=1e-6, factr=10.0, max_iter=300, tile=4,
              interpret=True)
    r_sharded = sharded_lbfgsb_solve_fused(
        f, x0, lo, hi, mesh=mesh, axis="dp", **kw)
    x_ps, it_ps, st_ps = [], [], []
    for s in range(8):
        r = lbfgsb_solve_fused(f, x0[4 * s:4 * (s + 1)], lo, hi, **kw)
        x_ps.append(np.asarray(r.x))
        it_ps.append(np.asarray(r.iterations))
        st_ps.append(np.asarray(r.status))
    np.testing.assert_array_equal(
        np.asarray(r_sharded.x), np.concatenate(x_ps))
    np.testing.assert_array_equal(
        np.asarray(r_sharded.iterations), np.concatenate(it_ps))
    np.testing.assert_array_equal(
        np.asarray(r_sharded.status), np.concatenate(st_ps))
    r_single = lbfgsb_solve_fused(f, x0, lo, hi, **kw)
    np.testing.assert_allclose(
        np.asarray(r_sharded.x), np.asarray(r_single.x), atol=1e-6)
    # cross-grid-length drift is ~1 ulp per iteration amplified by the
    # Rosenbrock valley: allow a few iterations of slack (the REAL
    # invariant is the bit-exact per-shard comparison above)
    assert np.abs(np.asarray(r_sharded.iterations).astype(np.int64)
                  - np.asarray(r_single.iterations)).max() <= 5


def test_sharded_generic_fused_matches_single_device():
    # the GENERIC fused kernel (any method x search) under shard_map must
    # agree lane-for-lane with the same kernel run unsharded
    from optimization_solvers_tpu import linesearch as ls, solvers
    from optimization_solvers_tpu.ops.pallas_driver import fused_minimize
    from optimization_solvers_tpu.parallel import (
        make_mesh, sharded_fused_minimize)

    n, B = 8, 32
    d = jnp.asarray(np.linspace(1.0, 20.0, n))

    def f(x, dd):
        return 0.5 * jnp.sum(dd * x * x)

    x0 = jnp.asarray(np.random.RandomState(5).uniform(-2, 2, (B, n)))
    lo = jnp.full((n,), -1.5)
    hi = jnp.full((n,), 2.5)
    mesh = make_mesh((8,), ("dp",))
    method = solvers.SpectralProjectedGradient(grad_tol=1e-8)
    kw = dict(consts=(d,), max_iter=500, max_iter_ls=30, tile=4,
              interpret=True)
    r_sharded = sharded_fused_minimize(
        method, ls.GLLQuadratic(), f, x0, lo, hi, mesh=mesh, axis="dp", **kw)
    r_single = fused_minimize(method, ls.GLLQuadratic(), f, x0, lo, hi, **kw)
    np.testing.assert_allclose(
        np.asarray(r_sharded.x), np.asarray(r_single.x), atol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(r_sharded.iterations), np.asarray(r_single.iterations))
    np.testing.assert_array_equal(
        np.asarray(r_sharded.status), np.asarray(r_single.status))


def test_sharded_tall_lbfgsb_per_shard_bitexact():
    """shard_map of the tall-layout large-n kernel (round 4): each device's
    shard must be BIT-EXACT with a standalone kernel run on that shard
    (same shapes, grid=1 per device)."""
    from optimization_solvers_tpu.ops.pallas_lbfgsb_tall import (
        lbfgsb_solve_fused_tall)
    from optimization_solvers_tpu.parallel import (
        make_mesh, sharded_lbfgsb_solve_fused_tall)

    f = problems.rosenbrock()
    n, B = 12, 16                     # 8 devices x shard 2, tile 2
    x0 = jnp.asarray(np.random.RandomState(9).uniform(-2, 2, (B, n)))
    lo = jnp.full((n,), -2.0)
    hi = jnp.full((n,), 1.2)          # active upper bounds
    mesh = make_mesh((8,), ("dp",))
    kw = dict(m=5, pgtol=1e-6, factr=10.0, max_iter=300, tile=2,
              interpret=True)
    r_sharded = sharded_lbfgsb_solve_fused_tall(
        f, x0, lo, hi, mesh=mesh, axis="dp", **kw)
    x_ps, st_ps = [], []
    for s in range(8):
        r = lbfgsb_solve_fused_tall(f, x0[2 * s:2 * (s + 1)], lo, hi, **kw)
        x_ps.append(np.asarray(r.x))
        st_ps.append(np.asarray(r.status))
    np.testing.assert_array_equal(
        np.asarray(r_sharded.x), np.concatenate(x_ps))
    np.testing.assert_array_equal(
        np.asarray(r_sharded.status), np.concatenate(st_ps))
    assert np.isin(np.asarray(r_sharded.status), (1,)).all()
