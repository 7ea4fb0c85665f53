"""Lockstep batched driver parity: batch_minimize(fused=False) must agree
LANE-FOR-LANE (bitwise on x, and on iteration counts and statuses) with
independent single-instance minimize() runs, for every method family and
search.  This pins the semantics of the default batched path
(solvers/driver.py:_batch_minimize_lockstep): frozen lanes keep their
exact exit state while other lanes continue."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_solvers_tpu import linesearch as ls, solvers
from optimization_solvers_tpu.core.oracle import make_oracle

N, B = 6, 5
DVEC = jnp.asarray(np.linspace(1.0, 40.0, N))


def _oracle(hessian=False):
    return make_oracle(lambda x: 0.5 * jnp.sum(DVEC * x * x),
                       with_hessian=hessian)


BOUNDS = (jnp.full(N, -1.5), jnp.full(N, 2.5))

COMBOS = [
    (solvers.GradientDescent(grad_tol=1e-7), ls.BackTracking(), False, False),
    (solvers.CoordinateDescent(grad_tol=1e-7), ls.GLLQuadratic(), False, False),
    (solvers.SpectralProjectedGradient(grad_tol=1e-7), ls.GLLQuadratic(),
     True, False),
    (solvers.ProjectedGradientDescent(grad_tol=1e-7), ls.BackTrackingB(),
     True, False),
    (solvers.NonlinearCG(grad_tol=1e-7, variant="fr"), ls.BackTracking(),
     False, False),
    (solvers.BFGS(tol=1e-8), ls.MoreThuente(), False, False),
    (solvers.DFP(tol=1e-8), ls.BackTracking(), False, False),
    (solvers.BFGSB(tol=1e-8), ls.BackTrackingB(), True, False),
    (solvers.Newton(tol=1e-10), ls.NoSearch(), False, True),
    (solvers.ProjectedNewton(grad_tol=1e-8), ls.BackTrackingB(), True, True),
    (solvers.SpectralProjectedNewton(grad_tol=1e-8), ls.BackTrackingB(),
     True, True),
    (solvers.LBFGS(tol=1e-8, m=4), ls.StrongWolfe(), False, False),
]


@pytest.mark.parametrize(
    "method,search,bounded,needs_h", COMBOS,
    ids=[f"{type(m).__name__}-{type(s).__name__}" for m, s, _, _ in COMBOS],
)
def test_lockstep_matches_single(method, search, bounded, needs_h):
    oracle = _oracle(hessian=needs_h)
    bounds = BOUNDS if bounded else None
    # mixed difficulty so lanes converge at different iterations: near the
    # optimum, mid-range, and far corners
    rng = np.random.RandomState(3)
    x0s = jnp.asarray(np.vstack([
        0.01 * rng.randn(1, N),
        rng.uniform(-0.5, 0.5, (2, N)),
        rng.uniform(-2, 2.5, (2, N)),
    ]))
    batched = solvers.batch_minimize(
        method, search, oracle, x0s, bounds=bounds, max_iter=400,
        fused=False)
    for i in range(B):
        single = solvers.minimize(
            method, search, oracle, x0s[i], bounds=bounds, max_iter=400)
        # near-bitwise: XLA may reassociate reductions differently between
        # the vmapped and scalar lowerings (observed: last-ulp drift in the
        # dcsrch Wolfe search), so allow ~1 ulp of relative slack
        np.testing.assert_allclose(
            np.asarray(batched.x[i]), np.asarray(single.x),
            rtol=1e-12, atol=1e-18,
            err_msg=f"lane {i} iterate diverged")
        assert int(batched.iterations[i]) == int(single.iterations), (
            f"lane {i}: {int(batched.iterations[i])} vs "
            f"{int(single.iterations)} iterations")
        assert int(batched.status[i]) == int(single.status)
