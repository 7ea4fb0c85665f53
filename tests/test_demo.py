"""Browser-demo parity tests (demo/server.py): the L6 counterpart of the
reference's JS/WASM demo page (``/root/reference/wasm/demo/index.html``,
bindings ``/root/reference/src/wasm.rs:6-269``).  Exercises the three demo
solvers through the solve endpoint — directly and over a real HTTP
round-trip — on the reference demo's own function templates."""

import json
import socket
import threading
import urllib.request

import pytest

from demo.server import make_objective, serve, solve_request

QUADRATIC = "x[0]**2 + 2*x[1]**2"           # demo template (index.html)
ROSENBROCK = "100*(x[1] - x[0]**2)**2 + (1 - x[0])**2"


@pytest.mark.parametrize("solver,max_iter", [
    ("gradient_descent", 300), ("bfgs", 100), ("newton", 100)])
def test_solvers_on_quadratic_template(solver, max_iter):
    out = solve_request({
        "solver": solver, "x0": [2.0, 1.0], "tolerance": 1e-6,
        "max_iterations": max_iter, "expression": QUADRATIC,
    })
    assert out["success"], out
    assert out["f_value"] < 1e-6
    assert abs(out["x"][0]) < 1e-3 and abs(out["x"][1]) < 1e-3
    # trajectory: starts at x0, monotone-ish down to the solution
    assert out["trace"][0]["x"] == [2.0, 1.0]
    assert out["trace"][-1]["f"] <= out["trace"][0]["f"]
    # 2-D problem => value field for the contour view
    assert len(out["field"]["values"]) == 72


def test_bfgs_on_rosenbrock_template():
    out = solve_request({
        "solver": "bfgs", "x0": [-1.2, 1.0], "tolerance": 1e-6,
        "max_iterations": 200, "expression": ROSENBROCK,
    })
    assert out["success"], out
    assert abs(out["x"][0] - 1.0) < 1e-4 and abs(out["x"][1] - 1.0) < 1e-4


def test_ndim_objective_no_field():
    out = solve_request({
        "solver": "bfgs", "x0": [0.5, 0.5, 0.5, 0.5], "tolerance": 1e-6,
        "max_iterations": 200,
        "expression": "sum(100*(x[1:]-x[:-1]**2)**2 + (1-x[:-1])**2)",
    })
    assert out["success"]
    assert "field" not in out  # contour view is 2-D only


def test_expression_namespace_is_math_only():
    with pytest.raises(Exception):
        make_objective("__import__('os').system('true')")([0.0])
    with pytest.raises(Exception):
        make_objective("open('/etc/passwd')")([0.0])


def test_bad_expression_reports_error():
    f = None
    try:
        f = make_objective("x[0] +")
    except SyntaxError:
        return
    assert f is None, "syntax error must not produce an objective"


def test_http_round_trip():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = serve(port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read().decode()
        assert "optimization_solvers_tpu" in page
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/solve",
            data=json.dumps({
                "solver": "newton", "x0": [2.0, 1.0], "tolerance": 1e-8,
                "max_iterations": 50, "expression": QUADRATIC,
            }).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert out["success"] and out["f_value"] < 1e-10
        # malformed expression -> 400 with an error body, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/solve",
            data=json.dumps({"expression": "nope("}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=60)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
            assert "error" in json.loads(e.read())
        assert raised
    finally:
        httpd.shutdown()
        httpd.server_close()
