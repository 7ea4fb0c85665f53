"""f32x2 double-float arithmetic vs f64 ground truth (CPU x64 conftest).

The reference is f64 end-to-end (``/root/reference/src/number.rs:3``);
core/df.py emulates that precision from f32 pairs.  These tests pin the
error-free-transform properties and the ~2^-45 working precision the
strict-tolerance certification path relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_solvers_tpu.core import df

RTOL = 2.0 ** -44  # comfortably inside the ~2^-47 design precision


def _rand(shape, lo=-10.0, hi=10.0, seed=0):
    rng = np.random.RandomState(seed)
    return rng.uniform(lo, hi, shape)


def test_two_sum_two_prod_error_free():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.uniform(-1e6, 1e6, 512), jnp.float32)
    b = jnp.asarray(rng.uniform(-1e-3, 1e-3, 512), jnp.float32)
    s, e = df.two_sum(a, b)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64),
        np.asarray(a, np.float64) + np.asarray(b, np.float64))
    p, e = df.two_prod(a, b)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64),
        np.asarray(a, np.float64) * np.asarray(b, np.float64))


@pytest.mark.parametrize("op,ref", [
    (df.add, np.add), (df.sub, np.subtract),
    (df.mul, np.multiply), (df.div, np.true_divide),
])
def test_binary_ops_vs_f64(op, ref):
    x64 = _rand(1024, seed=2)
    y64 = _rand(1024, seed=3)
    y64 = np.where(np.abs(y64) < 0.1, 1.0, y64)   # keep div well-scaled
    xd, yd = df.from_f64(x64), df.from_f64(y64)
    # ground truth at the exactly-representable df inputs (from_f64 carries
    # ~1e-15 relative input error of its own, which add/sub cancellation
    # would otherwise amplify into the comparison)
    xr, yr = df.to_f64(xd), df.to_f64(yd)
    out = df.to_f64(op(xd, yd))
    expect = ref(xr, yr)
    # error bound relative to OPERAND magnitude: double-float add/sub error
    # is O(eps^2 * (|x|+|y|)) absolute, unbounded relative to a cancelled
    # result
    bound = (np.abs(xr) + np.abs(yr) + np.abs(expect)) * RTOL + 1e-18
    assert (np.abs(out - expect) <= bound).all(), \
        np.max(np.abs(out - expect) / bound)


def test_cancellation_is_exact():
    # (1 + 2^-30) - 1 == 2^-30 EXACTLY in df (representable): THE property
    # plain f32 lacks (it returns 0)
    one = df.from_f64(np.ones(4))
    tiny = df.from_f64(np.full(4, 2.0 ** -30))
    out = df.to_f64(df.sub(df.add(one, tiny), one))
    np.testing.assert_array_equal(out, 2.0 ** -30)
    f32_out = (jnp.float32(1.0) + jnp.float32(2.0 ** -30)) - jnp.float32(1.0)
    assert float(f32_out) == 0.0


def test_sqrt_exp_log_powi():
    x64 = df.to_f64(df.from_f64(np.abs(_rand(512, seed=4)) + 0.1))
    np.testing.assert_allclose(df.to_f64(df.sqrt(df.from_f64(x64))),
                               np.sqrt(x64), rtol=RTOL)
    e64 = df.to_f64(df.from_f64(_rand(512, lo=-20.0, hi=20.0, seed=5)))
    np.testing.assert_allclose(df.to_f64(df.exp(df.from_f64(e64))),
                               np.exp(e64), rtol=2 ** -40)
    np.testing.assert_allclose(df.to_f64(df.log(df.from_f64(x64))),
                               np.log(x64), rtol=2 ** -40, atol=2 ** -40)
    np.testing.assert_allclose(df.to_f64(df.powi(df.from_f64(x64), 7)),
                               x64 ** 7, rtol=2 ** -40)
    # exp overflow/underflow edges behave like f64-to-f32 semantics
    big = df.exp(df.from_f32(jnp.asarray([200.0, -200.0], jnp.float32)))
    assert np.isposinf(np.asarray(big.hi)[0])
    assert np.asarray(big.hi)[1] == 0.0


def test_tree_sum_and_dot_cancellation():
    # alternating large/small terms: plain f32 sum loses ~1e-4 absolute;
    # df tree-sum keeps ~1e-13
    rng = np.random.RandomState(6)
    x64 = rng.uniform(-1.0, 1.0, 4097) * np.where(
        np.arange(4097) % 2 == 0, 1e4, 1.0)
    s = df.to_f64(df.tree_sum(df.from_f64(x64)))
    np.testing.assert_allclose(s, np.sum(x64), rtol=0, atol=abs(np.sum(x64)) * 1e-12 + 1e-9)
    y64 = rng.uniform(-1.0, 1.0, 4097)
    d = df.to_f64(df.dot(df.from_f64(x64), df.from_f64(y64)))
    np.testing.assert_allclose(d, np.dot(x64, y64),
                               rtol=1e-11, atol=1e-8)
    # f32 comparison: the df result must be >=1e5x closer than plain f32
    f32_err = abs(float(jnp.sum(jnp.asarray(x64, jnp.float32)) - np.sum(x64)))
    df_err = abs(s - np.sum(x64))
    assert df_err < f32_err / 1e4 or df_err < 1e-9


def test_compare_select_clip():
    x = df.from_f64(np.array([1.0, 1.0 + 1e-12, 2.0]))
    y = df.from_f64(np.array([1.0 + 1e-12, 1.0, 2.0]))
    np.testing.assert_array_equal(np.asarray(df.lt(x, y)),
                                  [True, False, False])
    np.testing.assert_array_equal(np.asarray(df.le(x, y)),
                                  [True, False, True])
    m = df.maximum(x, y)
    np.testing.assert_allclose(df.to_f64(m), [1.0 + 1e-12, 1.0 + 1e-12, 2.0],
                               rtol=1e-15)
    lo = df.from_f64(np.full(3, 0.0))
    hi = df.from_f64(np.full(3, 1.0))
    np.testing.assert_allclose(df.to_f64(df.clip(x, lo, hi)),
                               [1.0, 1.0, 1.0], rtol=1e-15)


def test_df_under_jit_and_vmap():
    def fn(a, b):
        return df.dot(a, b)

    x64 = _rand((8, 64), seed=7)
    y64 = _rand((8, 64), seed=8)
    xb, yb = df.from_f64(x64), df.from_f64(y64)
    out = jax.jit(jax.vmap(fn))(xb, yb)
    np.testing.assert_allclose(df.to_f64(out),
                               np.einsum("ij,ij->i", x64, y64),
                               rtol=1e-10, atol=1e-10)


def test_jit_matches_eager_precision():
    """THE laundering regression test: XLA's algebraic simplifier folds
    constant-involved add/sub chains ((c + b) - c -> b) which deletes the
    error-free transforms; df launders constants via runtime-predicate
    selects (df.launder_constants).  If a future toolchain defeats that,
    this catches it: jit and eager df must agree to ~df precision, far
    below the ~1e-7 f32-ulp signature of the broken compile."""
    from optimization_solvers_tpu.core.df_interp import df_value_and_grad

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    xdf = df.from_f64(_rand(100, lo=-2.0, hi=2.0, seed=11))
    vg = df_value_and_grad(rosen, jnp.zeros(100, jnp.float32))
    fe, ge = vg(xdf)
    fj, gj = jax.jit(vg)(xdf)
    assert abs(df.to_f64(fj) - df.to_f64(fe)) <= 1e-9 * abs(df.to_f64(fe))
    assert np.max(np.abs(df.to_f64(gj) - df.to_f64(ge))) < 1e-8
    # and both match f64 autodiff at the representable point
    g_ref = jax.grad(rosen)(jnp.asarray(df.to_f64(xdf)))
    assert np.max(np.abs(df.to_f64(gj) - np.asarray(g_ref))) < 1e-8


def test_interpreter_vs_f64_autodiff():
    """df interpreter value+grad vs f64 autodiff on the reference problem
    classes (quadratic-with-data, LSE, exp-bowl); f32 autodiff is shown to
    be ~1e4x worse on the Rosenbrock gradient (the certification wall the
    interpreter exists to remove)."""
    from optimization_solvers_tpu.core.df_interp import df_value_and_grad

    rng = np.random.RandomState(12)
    n = 64
    xdf = df.from_f64(rng.uniform(-2.0, 2.0, n))
    xr = jnp.asarray(df.to_f64(xdf))

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    vg = jax.jit(df_value_and_grad(rosen, jnp.zeros(n, jnp.float32)))
    _, gdf = vg(xdf)
    g64 = jax.grad(rosen)(xr)
    g32 = jax.grad(rosen)(jnp.asarray(xr, jnp.float32))
    df_err = np.max(np.abs(df.to_f64(gdf) - np.asarray(g64)))
    f32_err = np.max(np.abs(np.asarray(g32, np.float64) - np.asarray(g64)))
    assert df_err < 1e-8
    assert df_err < f32_err / 1e3

    def lse(x, A, b):
        return jnp.log(jnp.sum(jnp.exp(A @ x - b))) + 0.5 * jnp.sum(x * x)

    A = jnp.asarray(rng.uniform(-1, 1, (32, n)), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, 32), jnp.float32)
    vg2 = jax.jit(df_value_and_grad(lse, jnp.zeros(n, jnp.float32),
                                    data=(A, b)))
    _, g2 = vg2(xdf)
    g2_ref = jax.grad(lambda x: lse(x, jnp.asarray(A, jnp.float64),
                                    jnp.asarray(b, jnp.float64)))(xr)
    assert np.max(np.abs(df.to_f64(g2) - np.asarray(g2_ref))) < 1e-9

    def expbowl(x):
        return jnp.sum(x ** 2) + jnp.exp(jnp.sum(x ** 2))

    vg3 = jax.jit(df_value_and_grad(expbowl, jnp.zeros(4, jnp.float32)))
    x4 = df.from_f64(rng.uniform(-0.5, 0.5, 4))
    _, g3 = vg3(x4)
    g3_ref = jax.grad(expbowl)(jnp.asarray(df.to_f64(x4)))
    assert np.max(np.abs(df.to_f64(g3) - np.asarray(g3_ref))) < 1e-7

    # unsupported primitive fails LOUDLY at build time
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="no rule"):
        df_value_and_grad(lambda x: jnp.sum(jnp.sin(x)),
                          jnp.zeros(4, jnp.float32))(x4)


def test_interpreter_under_vmap():
    from optimization_solvers_tpu.core.df_interp import df_value_and_grad

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    rng = np.random.RandomState(13)
    Xb = df.from_f64(rng.uniform(-2, 2, (6, 32)))
    vg = df_value_and_grad(rosen, jnp.zeros(32, jnp.float32))
    fb, gb = jax.jit(jax.vmap(vg))(Xb)
    ref = jax.vmap(jax.grad(rosen))(jnp.asarray(df.to_f64(Xb)))
    assert np.max(np.abs(df.to_f64(gb) - np.asarray(ref))) < 1e-8


def test_transcendental_extensions_vs_f64():
    """tanh / logistic / log1p / expm1 (round 5 late): the primitive set a
    logistic-regression-class objective traces to; near-df accurate and
    stable on both sides."""
    x64 = df.to_f64(df.from_f64(_rand(512, lo=-15.0, hi=15.0, seed=21)))
    xd = df.from_f64(x64)
    np.testing.assert_allclose(df.to_f64(df.tanh(xd)), np.tanh(x64),
                               rtol=2 ** -38, atol=2 ** -45)
    sig = 1.0 / (1.0 + np.exp(-x64))
    np.testing.assert_allclose(df.to_f64(df.logistic(xd)), sig,
                               rtol=2 ** -38, atol=2 ** -45)
    s64 = df.to_f64(df.from_f64(_rand(512, lo=-0.9, hi=5.0, seed=22)))
    sd = df.from_f64(s64)
    np.testing.assert_allclose(df.to_f64(df.log1p(sd)), np.log1p(s64),
                               rtol=2 ** -36, atol=2 ** -45)
    np.testing.assert_allclose(df.to_f64(df.expm1(sd)), np.expm1(s64),
                               rtol=2 ** -38, atol=2 ** -45)

    # end-to-end: logistic-regression negative log-likelihood gradient
    from optimization_solvers_tpu.core.df_interp import df_value_and_grad

    rng = np.random.RandomState(23)
    m, n = 32, 16
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    y = jnp.asarray(rng.randint(0, 2, m).astype(np.float32))

    def nll(w, A, y):
        z = A @ w
        # stable NLL via log1p(exp(-|z|)) form
        return jnp.sum(jnp.log1p(jnp.exp(-jnp.abs(z)))
                       + jnp.maximum(z, 0.0) - y * z) / m

    wdf = df.from_f64(rng.normal(size=n) * 0.5)
    vg = jax.jit(df_value_and_grad(nll, jnp.zeros(n, jnp.float32),
                                   data=(A, y)))
    _, g = vg(wdf)
    g_ref = jax.grad(lambda w: nll(w, jnp.asarray(A, jnp.float64),
                                   jnp.asarray(y, jnp.float64)))(
        jnp.asarray(df.to_f64(wdf)))
    assert np.max(np.abs(df.to_f64(g) - np.asarray(g_ref))) < 1e-8
