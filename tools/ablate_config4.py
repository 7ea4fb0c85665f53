"""Fixed-iteration ablation of the config-4 L-BFGS-B step on the real
device: run exactly 25 vmapped outer iterations (no convergence exit) with
individual pieces stubbed out, so the timing difference attributes the
per-iteration cost of each piece.

Variants: full | no_gcp (xcp=x, c=0) | no_ls (t=1) | no_hist (no roll/update)
| no_subspace (xbar=xcp).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.solvers import lbfgsb as L

B, n, rows, m, ITERS = 64, 10_000, 512, 10, 25
DTYPE = jnp.float32

key = jax.random.PRNGKey(0)
A = (jax.random.normal(key, (rows, n)) / np.sqrt(n)).astype(DTYPE)
b = jnp.linspace(-1.0, 1.0, rows).astype(DTYPE)
oracle = make_oracle(problems.log_sum_exp(A, b))
lower = jnp.full((n,), -1.0, DTYPE)
upper = jnp.full((n,), 1.0, DTYPE)
cfg = L.LbfgsbConfig(m=m, pgtol=1e-5, factr=1e3, max_iter=200)

rng = np.random.RandomState(4)
inputs = [jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)), DTYPE) for _ in range(3)]

orig_cauchy = L._cauchy_point
orig_sub = L._subspace_step
orig_inv = getattr(L, "_equilibrated_inv", None)  # removed from the solver
orig_mid = L._build_middle


def stub_inv(Amat):
    d = jnp.abs(jnp.diagonal(Amat, axis1=-2, axis2=-1))
    return Amat * 0.0 + jnp.eye(Amat.shape[-1], dtype=Amat.dtype) / (
        d[..., None] + 1.0)


def stub_mid(hist):
    S, Y, valid, theta = hist
    mm = S.shape[0]
    Wt = jnp.concatenate([Y, theta * S], axis=0)
    return Wt, jnp.eye(2 * mm, dtype=S.dtype)


def stub_cauchy(x, g, lo, up, Wt, M, theta, chunk=256):
    t_break = jnp.where(
        g < 0.0, (x - up) / g, jnp.where(g > 0.0, (x - lo) / g, jnp.inf))
    free = t_break > 0.0
    return x, jnp.zeros(Wt.shape[:1], x.dtype), free


def stub_sub(x, g, xcp, c, free, lo, up, hist, Wt, M):
    return xcp + jnp.where(free, -0.001 * g, 0.0)


class StubLS:
    def step_len(self, oracle_, x, ev, d, state, bounds, max_iter):
        return jnp.ones((), x.dtype), None


def build_minimal(variant):
    """Bypass make_lbfgsb_step entirely: a hand-rolled step with only the
    named ingredients, same carry pytree."""
    from optimization_solvers_tpu.core.oracle import ensure_oracle
    orc = ensure_oracle(oracle)

    def init_fn(x0):
        ev0 = orc(x0)
        hist0 = L._History(
            S=jnp.zeros((m, n), DTYPE), Y=jnp.zeros((m, n), DTYPE),
            valid=jnp.zeros((m,), bool), theta=jnp.asarray(1.0, DTYPE))
        return L._Carry(x0, ev0.f, ev0.g, hist0,
                        jnp.asarray(jnp.inf, DTYPE), jnp.int32(0))

    def step_fn(c):
        if variant == "plus_middle":
            Wt, M = L._build_middle(c.hist)
            d = -c.g - 1e-12 * L.matvec(Wt.T, L.matvec(M, L.matvec(Wt, c.x)))
            x_new = jnp.clip(c.x + 0.001 * d, lower, upper)
        elif variant in ("plus_gcp", "plus_subspace"):
            Wt, M = L._build_middle(c.hist)
            xcp, cc, free = L._cauchy_point(
                c.x, c.g, lower, upper, Wt, M, c.hist.theta)
            if variant == "plus_subspace":
                xbar = L._subspace_step(
                    c.x, c.g, xcp, cc, free, lower, upper, c.hist, Wt, M)
            else:
                xbar = xcp
            x_new = jnp.clip(c.x + 0.5 * (xbar - c.x), lower, upper)
        else:
            x_new = jnp.clip(c.x - 0.001 * c.g, lower, upper)
        if variant == "carry_only":
            ev_f, ev_g = c.f * 0.9999, c.g * 0.9999
        else:
            ev = orc(x_new)
            ev_f, ev_g = ev.f, ev.g
        hist = c.hist
        if variant in ("oracle_roll", "carry_only", "plus_middle",
                       "plus_gcp", "plus_subspace"):
            s = x_new - c.x
            y = ev_g - c.g
            S = jnp.roll(hist.S, -1, axis=0).at[-1].set(s)
            Y = jnp.roll(hist.Y, -1, axis=0).at[-1].set(y)
            valid = jnp.roll(hist.valid, -1).at[-1].set(True)
            hist = L._History(S, Y, valid, hist.theta)
        return L._Carry(x_new, ev_f, ev_g, hist, c.f, c.k + 1)

    def run(x0):
        carry = jax.vmap(init_fn)(x0)
        return jax.lax.fori_loop(
            0, ITERS, lambda _, c: jax.vmap(step_fn)(c), carry).f

    return jax.jit(run)


def build(variant):
    if variant in ("oracle_only", "oracle_roll", "carry_only",
                   "plus_middle", "plus_gcp", "plus_subspace"):
        return build_minimal(variant)
    if variant == "no_gcp":
        L._cauchy_point = stub_cauchy
    elif variant == "no_subspace":
        L._subspace_step = stub_sub
    elif variant == "no_inv":
        assert orig_inv is not None, "no_inv ablation needs _equilibrated_inv"
        L._equilibrated_inv = stub_inv
    elif variant == "no_middle":
        L._build_middle = stub_mid
    try:
        init_fn, _, step_fn = L.make_lbfgsb_step(oracle, lower, upper, cfg)
    finally:
        L._cauchy_point = orig_cauchy
        L._subspace_step = orig_sub
        if orig_inv is not None:
            L._equilibrated_inv = orig_inv
        L._build_middle = orig_mid

    if variant == "no_ls":
        # rebuild with the dcsrch replaced: patch the module attr the
        # factory closes over
        import optimization_solvers_tpu.solvers.lbfgsb as mod
        orig_sw = mod.StrongWolfe
        mod.StrongWolfe = lambda **kw: StubLS()
        try:
            init_fn, _, step_fn = L.make_lbfgsb_step(oracle, lower, upper, cfg)
        finally:
            mod.StrongWolfe = orig_sw

    def run(x0):
        carry = jax.vmap(init_fn)(x0)
        return jax.lax.fori_loop(
            0, ITERS, lambda _, c: jax.vmap(step_fn)(c), carry).f

    return jax.jit(run)


out = {}
for variant in json.loads(os.environ.get(
        "ABLATE", '["full", "no_gcp", "no_ls", "no_subspace"]')):
    fn = build(variant)
    f = fn(inputs[0])
    _ = np.asarray(f).sum()
    ts = []
    for x in inputs[1:]:
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        f = fn(x)
        _ = np.asarray(f).sum()
        ts.append(time.perf_counter() - t0)
    out[variant] = round(float(np.median(ts)) * 1e3 / ITERS, 3)

print(json.dumps({"device": jax.devices()[0].platform,
                  "ms_per_iter": out}))
