"""Tests for the observability layer (ref L5: tracer.rs, plotter_3d.rs) and
the reference-parity object front end (ref L6: solver constructors, Lbfgsb
builder API, wasm.rs OptimizationSolver)."""

import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_solvers_tpu import api, linesearch as ls, solvers
from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.utils import (
    LogFormat,
    Plotter3d,
    Tracer,
    log_progress,
    summarize,
)


# --- telemetry ----------------------------------------------------------------

def test_tracer_formats(capsys, tmp_path):
    logger = Tracer().with_stdout_layer(LogFormat.JSON).with_file_layer(
        str(tmp_path / "log.txt")).build()
    logger.info("hello %s", "world")
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(out)
    assert payload["fields"]["message"] == "hello world"
    assert payload["level"] == "INFO"
    assert "hello world" in (tmp_path / "log.txt").read_text()
    logger.handlers.clear()


def test_callback_hook_fires():
    seen = []
    oracle = make_oracle(problems.example_gd())
    solvers.minimize(
        solvers.GradientDescent(grad_tol=1e-6), ls.BackTracking(), oracle,
        jnp.array([10.0, -10.0]), max_iter=50,
        callback=lambda k, x, f: seen.append(int(k)),
    )
    assert len(seen) > 0
    # 1-based completed-iteration numbering, matching the telemetry tracer
    assert seen[0] == 1


def test_summarize():
    oracle = make_oracle(problems.quadratic_2d(90.0))
    res = solvers.batch_minimize(
        solvers.GradientDescent(grad_tol=1e-8), ls.BackTracking(), oracle,
        jnp.array([[180.0, 152.0], [0.0, 0.0]]), max_iter=2000,
    )
    stats = summarize(res)
    assert stats["instances"] == 2
    assert stats["converged"] == 2
    assert stats["f_max"] < 1e-6


# --- trajectory + plotting ----------------------------------------------------

def test_minimize_recorded_matches_minimize():
    oracle = make_oracle(problems.quadratic_2d(90.0))
    method = solvers.GradientDescent(grad_tol=1e-8)
    x0 = jnp.array([180.0, 152.0])
    res, xs, fs = solvers.minimize_recorded(
        method, ls.BackTracking(), oracle, x0, max_iter=500)
    ref = solvers.minimize(method, ls.BackTracking(), oracle, x0, max_iter=500)
    np.testing.assert_allclose(res.x, ref.x, atol=0)
    assert res.iterations == ref.iterations
    assert xs.shape == (501, 2)
    np.testing.assert_allclose(xs[0], x0)
    # frozen after convergence: trajectory repeats the final iterate
    k = int(res.iterations)
    np.testing.assert_allclose(xs[k], res.x, atol=0)
    np.testing.assert_allclose(xs[-1], res.x, atol=0)
    assert fs[0] >= fs[k]


def test_plotter3d_html_and_png(tmp_path):
    f = lambda p: float(p[0] ** 2 + 2 * p[1] ** 2)
    traj = [np.array([3.0, 2.0]), np.array([1.0, 0.5]), np.array([0.0, 0.0])]
    plotter = (Plotter3d(-4, 4, -4, 4, mesh_size=12)
               .append_plot(f, name="f")
               .append_scatter_points(f, traj))
    html_path = tmp_path / "plot.html"
    plotter.build(str(html_path))
    html = html_path.read_text()
    assert "surface" in html and "scatter3d" in html
    png_path = tmp_path / "plot.png"
    plotter.build_png(str(png_path))
    assert png_path.stat().st_size > 0


# --- object front end ---------------------------------------------------------

def test_api_gradient_descent_matches_reference_usage():
    # examples/gradient_descent_example.rs style
    gd = api.GradientDescent(1e-6, jnp.array([10.0, -10.0]))
    gd.minimize(ls.BackTracking(c1=1e-4, beta=0.5),
                make_oracle(problems.example_gd()), 100, 100)
    assert float(problems.example_gd()(gd.xk())) < 1e-6
    assert gd.k < 100


def test_api_max_iter_raises():
    gd = api.GradientDescent(1e-12, jnp.array([180.0, 152.0]))
    with pytest.raises(api.MaxIterReached):
        gd.minimize(ls.BackTracking(), make_oracle(problems.quadratic_2d(1e9)), 3, 50)


def test_api_bfgs_and_bounded():
    b = api.BFGS(1e-6, jnp.array([10.0, -8.0, 6.0]))
    b.minimize(ls.MoreThuente(), make_oracle(problems.example_bfgs()), 100, 100)
    assert float(problems.example_bfgs()(b.xk())) < 1e-6

    f = lambda x: x[0] ** 2 + 2.0 * x[1] ** 2 + x[0] * x[1]
    bb = api.BFGSB(1e-6, jnp.array([5.0, 5.0]), jnp.array([1.0, 1.0]),
                   jnp.array([jnp.inf, jnp.inf]))
    bb.minimize(ls.MoreThuenteB(), make_oracle(f), 500, 100)
    np.testing.assert_allclose(bb.xk(), [1.0, 1.0], atol=1e-4)


def test_api_lbfgsb_reference_semantics():
    # default: max_iteration unset -> rel_pg stopping rule (lbfgsb.rs:67-72)
    solver = api.Lbfgsb(n=2)
    solver.set_lower_bound(0, -1.0)
    solver.set_lower_bound(1, 47.0)
    solver.set_m(5)
    solver.set_pgtol(1e-7)
    solver.set_factr(10.0)
    solver.minimize(make_oracle(problems.quadratic_2d(90.0)),
                    jnp.array([180.0, 152.0]))
    assert abs(float(solver.x[0])) < 1e-4
    assert float(solver.x[1]) == 47.0  # active lower bound


def test_api_optimization_solver_wasm_parity():
    s = api.OptimizationSolver(tolerance=1e-6, max_iterations=1000)
    r = s.solve_gradient_descent([10.0, -10.0], problems.example_gd())
    assert r.success and r.f_value < 1e-6

    r2 = s.solve_bfgs([10.0, -8.0, 6.0], problems.example_bfgs())
    assert r2.success and r2.f_value < 1e-6

    r3 = s.solve_newton([1.0, 1.5], problems.exp_bowl())
    assert r3.success and abs(r3.f_value - 1.0) < 1e-6
    assert r3.iterations < 100


def test_api_remaining_solver_classes():
    # smoke coverage for the rest of the reference constructor surface
    f2 = problems.example_gd()

    cd = api.CoordinateDescent(1e-6, jnp.array([10.0, -5.0]))
    cd.minimize(ls.BackTracking(), make_oracle(f2), 2000, 100)
    assert float(f2(cd.xk())) < 1e-6

    inv_p = jnp.linalg.inv(jnp.array([[2.0, 0.0], [0.0, 4.0]]))
    pn = api.PnormDescent(1e-6, jnp.array([3.0, -2.0]), inv_p)
    pn.minimize(ls.BackTracking(), make_oracle(f2), 200, 100)
    assert float(f2(pn.xk())) < 1e-6

    lo, hi = jnp.array([0.0, 0.0]), jnp.array([1.0, 1.0])
    pgd = api.ProjectedGradientDescent(
        1e-8, jnp.array([5.0, 5.0]), lo, hi)
    pgd.minimize(ls.BackTrackingB(), make_oracle(problems.shifted_quadratic_2d()),
                 1000, 100)
    np.testing.assert_allclose(pgd.xk(), [1.0, 1.0], atol=1e-6)

    oracle = make_oracle(problems.exp_bowl())
    spg = api.SpectralProjectedGradient(
        1e-6, jnp.array([0.9, -0.8]), oracle,
        jnp.array([-1.0, -1.0]), jnp.array([1.0, 1.0]))
    spg.minimize(ls.GLLQuadratic(), oracle, 1000, 100)
    assert abs(float(problems.exp_bowl()(spg.xk())) - 1.0) < 1e-6

    newton = api.Newton(1e-10, jnp.array([1.0, 1.5]))
    newton.minimize(ls.BackTracking(),
                    make_oracle(problems.exp_bowl(), with_hessian=True),
                    100, 100)
    assert abs(float(problems.exp_bowl()(newton.xk())) - 1.0) < 1e-6

    spn = api.SpectralProjectedNewton(
        1e-6, jnp.array([0.5, 0.5]),
        make_oracle(problems.quadratic_2d(90.0), with_hessian=True),
        jnp.array([-1.0, -1.0]), jnp.array([2.0, 2.0]))
    spn.minimize(ls.GLLQuadratic(c1=1e-4, m=5),
                 make_oracle(problems.quadratic_2d(90.0), with_hessian=True),
                 1000, 100)
    assert float(problems.quadratic_2d(90.0)(spn.xk())) < 1e-6

    dfp = api.DFP(1e-6, jnp.array([5.0, -5.0]))
    dfp.minimize(ls.MoreThuente(),
                 make_oracle(lambda x: x[0]**2 + 5.0*x[1]**2 + x[0]*x[1]),
                 200, 100)

    sr1 = api.SR1B(1e-6, jnp.array([0.9, 0.9]),
                   jnp.array([-1.0, -1.0]), jnp.array([1.0, 1.0]))
    sr1.minimize(ls.MoreThuenteB(),
                 make_oracle(lambda x: x[0]**2 + 3.0*x[1]**2 + x[0]*x[1]),
                 500, 100)
