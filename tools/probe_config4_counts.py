"""Count the data-dependent inner-loop trip counts of the config-4
L-BFGS-B step: generalized-Cauchy-point segments examined and dcsrch
line-search oracle evals, per outer iteration per lane.  The lockstep
batch pays the MAX over lanes each outer iteration — this tells us
whether the remaining ~21 ms/iter is GCP-walk or line-search bound."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core import problems
from optimization_solvers_tpu.core.oracle import make_oracle
from optimization_solvers_tpu.core.types import FuncEval
from optimization_solvers_tpu.solvers import lbfgsb as L

B, n, rows, m = 64, 10_000, 512, 10
DTYPE = jnp.float32

key = jax.random.PRNGKey(0)
A = (jax.random.normal(key, (rows, n)) / np.sqrt(n)).astype(DTYPE)
b = jnp.linspace(-1.0, 1.0, rows).astype(DTYPE)
oracle = make_oracle(problems.log_sum_exp(A, b))
lower = jnp.full((n,), -1.0, DTYPE)
upper = jnp.full((n,), 1.0, DTYPE)
cfg = L.LbfgsbConfig(m=m, pgtol=1e-5, factr=1e3, max_iter=200)

init_fn, keep_going, step_fn = L.make_lbfgsb_step(oracle, lower, upper, cfg)


def gcp_segments(c):
    """Re-run the Cauchy walk, returning the examined-segment count j."""
    Wt, M = L._build_middle(c.hist)
    # replicate _cauchy_point but surface j
    x, g = c.x, c.g
    dtype = x.dtype
    eps = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    t_break = jnp.where(
        g < 0.0,
        (x - upper) / g,
        jnp.where(g > 0.0, (x - lower) / g, jnp.inf),
    )
    d0 = jnp.where(t_break > 0.0, -g, jnp.zeros_like(g))
    keys0 = jnp.where(t_break > 0.0, t_break, jnp.inf)

    from optimization_solvers_tpu.core.numerics import dot as vdot, matvec

    def seg_min(f1, f2):
        return jnp.where(
            f2 > eps,
            -f1 / f2,
            jnp.where(f1 < 0.0, jnp.asarray(jnp.inf, dtype), jnp.zeros((), dtype)),
        )

    p0 = matvec(Wt, d0)
    f1_0 = -vdot(d0, d0)
    f2_0 = -c.hist.theta * f1_0 - vdot(p0, matvec(M, p0))
    dt_min0 = seg_min(f1_0, f2_0)
    theta = c.hist.theta

    def cond(carry):
        j, keys, t_b, b_next, d, fixed, cc, p, f1, f2, dt_min, t_old = carry
        return (j < n) & jnp.isfinite(t_b) & (dt_min >= t_b - t_old)

    def body(carry):
        j, keys, t_b, b_next, d, fixed, cc, p, f1, f2, dt_min, t_old = carry
        bb = b_next
        dt = t_b - t_old
        gb = g[bb]
        bound_b = jnp.where(d[bb] > 0.0, upper[bb], lower[bb])
        zb = bound_b - x[bb]
        wb = Wt[:, bb]
        cc = cc + dt * p
        Mc = matvec(M, cc)
        Mp = matvec(M, p)
        Mw = matvec(M, wb)
        f1 = f1 + dt * f2 + gb * gb + theta * gb * zb - gb * vdot(wb, Mc)
        f2 = f2 - theta * gb * gb - 2.0 * gb * vdot(wb, Mp) - gb * gb * vdot(wb, Mw)
        p = p + gb * wb
        d = d.at[bb].set(0.0)
        fixed = fixed.at[bb].set(True)
        keys = keys.at[bb].set(jnp.inf)
        return (j + 1, keys, jnp.min(keys), jnp.argmin(keys), d, fixed,
                cc, p, f1, f2, seg_min(f1, f2), t_b)

    init = (jnp.int32(0), keys0, jnp.min(keys0), jnp.argmin(keys0), d0,
            jnp.zeros((n,), bool), jnp.zeros(Wt.shape[:1], dtype), p0,
            f1_0, f2_0, dt_min0, jnp.zeros((), dtype))
    out = jax.lax.while_loop(cond, body, init)
    return out[0]


def ls_evals(c):
    """Oracle-eval count inside dcsrch for this step's direction."""
    Wt, M = L._build_middle(c.hist)
    xcp, cc, free = L._cauchy_point(c.x, c.g, lower, upper, Wt, M, c.hist.theta)
    xbar = L._subspace_step(c.x, c.g, xcp, cc, free, lower, upper, c.hist, Wt, M)
    d = xbar - c.x

    # dcsrch evaluates the oracle once per while trip; capture the final
    # loop state (step_len returns the INPUT state) via a trace-time spy
    import optimization_solvers_tpu.linesearch.dcsrch as dc

    ls = dc.StrongWolfe(c1=cfg.ls_c1, c2=cfg.ls_c2, bounded=True)
    captured = {}
    orig_while = dc.lax.while_loop

    def spy(cond_fn, body_fn, init_val):
        out = orig_while(cond_fn, body_fn, init_val)
        captured["out"] = out
        return out

    real_lax_while = dc.lax.while_loop
    try:
        dc.lax.while_loop = spy
        t, _ = ls.step_len(oracle, c.x, FuncEval(c.f, c.g), d, None,
                           (lower, upper), cfg.max_iter_ls)
    finally:
        dc.lax.while_loop = real_lax_while
    return t, captured["out"].i


probe_gcp = jax.jit(jax.vmap(gcp_segments))
probe_ls = jax.jit(jax.vmap(ls_evals))
step = jax.jit(jax.vmap(step_fn))

rng = np.random.RandomState(4)
x = jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)), DTYPE)
carry = jax.jit(jax.vmap(init_fn))(x)

rows_out = []
for k in range(25):
    j = np.asarray(probe_gcp(carry))
    t, lsk = probe_ls(carry)
    lsk = np.asarray(lsk)
    rows_out.append({
        "iter": k,
        "gcp_seg_max": int(j.max()), "gcp_seg_med": float(np.median(j)),
        "ls_k_max": int(lsk.max()), "ls_k_med": float(np.median(lsk)),
    })
    carry = step(carry)

print(json.dumps(rows_out))
