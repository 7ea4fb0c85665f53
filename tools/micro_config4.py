"""Micro-bench of candidate slow ops at config-4 shapes, each inside a
fori_loop of REPS trips in a single dispatch (per-op time = total/REPS).

CAVEATS (learned the hard way; prefer tools/trace_config4.py's xprof
op-level trace for real attribution):
  * the ``acc + out.ravel()[:1]`` consumer lets XLA dead-code-eliminate
    most of each op (a gather whose output is sliced to one element
    simplifies to a tiny gather) — numbers here are lower bounds;
  * at REPS=50 the ~30 ms relay dispatch floor contributes ~0.65 ms/rep
    to every row; subtract the cheapest row before comparing."""

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
from jax import lax

B, n, m, K = 64, 10_000, 10, 256
REPS = 50
DTYPE = jnp.float32

key = jax.random.PRNGKey(0)
keys = jax.random.uniform(key, (B, n), DTYPE) + 0.01
Wt = jax.random.normal(key, (B, 2 * m, n), DTYPE)
g = jax.random.normal(key, (B, n), DTYPE)
idx = jax.random.randint(key, (B, K), 0, n)
j0s = jax.random.randint(key, (B,), 0, n - K)
M = jax.random.normal(key, (B, 2 * m, 2 * m), DTYPE)
Cj = jax.random.normal(key, (B, 2 * m, K), DTYPE)


def loop(fn, *args):
    def run(a):
        def body(i, acc):
            out = fn(i, *a)
            return acc + out.ravel()[:1]
        return lax.fori_loop(0, REPS, body, jnp.zeros((1,), DTYPE))
    return jax.jit(run)


CASES = {
    # full batched argsort every trip
    "argsort": loop(lambda i, k: jnp.argsort(k + i, axis=-1).astype(DTYPE), ),
    # batched gather of K random columns from (B, 2m, n)
    "gather_W": loop(lambda i, W, ix: jnp.take_along_axis(
        W, (ix[:, None, :] + i) % n, axis=2).astype(DTYPE)),
    # batched gather of K random elements from (B, n)
    "gather_g": loop(lambda i, gg, ix: jnp.take_along_axis(
        gg, (ix + i) % n, axis=1)),
    # per-lane dynamic_slice (vmapped -> offset gather)
    "dslice_perlane": loop(lambda i, gg, j0: jax.vmap(
        lambda row, j: lax.dynamic_slice(row, ((j + i) % (n - K),), (K,))
    )(gg, j0)),
    # shared-scalar dynamic_slice (true contiguous slice)
    "dslice_shared": loop(lambda i, gg: lax.dynamic_slice(
        gg, (0, i % (n - K)), (B, K))),
    # chunk cumsum
    "cumsum_chunk": loop(lambda i, C: jnp.cumsum(C + i, axis=-1)),
    # three (2m x 2m) @ (2m x K) batched matmuls, HIGHEST
    "matmat3": loop(lambda i, Mm, C: (
        jnp.einsum("bij,bjk->bik", Mm, C + i,
                   precision=lax.Precision.HIGHEST)
        + jnp.einsum("bij,bjk->bik", Mm, C * 2 + i,
                     precision=lax.Precision.HIGHEST)
        + jnp.einsum("bij,bjk->bik", Mm, C * 3 + i,
                     precision=lax.Precision.HIGHEST))),
    # roll+set of the (B, m, n) history pair
    "hist_roll": loop(lambda i, W: jnp.roll(W, -1, axis=1).at[:, -1].set(i * 1.0)),
}

ARGS = {
    "argsort": (keys,),
    "gather_W": (Wt, idx),
    "gather_g": (g, idx),
    "dslice_perlane": (g, j0s),
    "dslice_shared": (g,),
    "cumsum_chunk": (Cj,),
    "matmat3": (M, Cj),
    "hist_roll": (Wt,),
}

out = {}
for name, fn in CASES.items():
    a = ARGS[name]
    r = fn(a)
    _ = np.asarray(r).sum()
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        r = fn(a)
        _ = np.asarray(r).sum()
        ts.append(time.perf_counter() - t0)
    out[name] = round(float(np.median(ts)) * 1e3 / REPS, 4)

print(json.dumps({"device": jax.devices()[0].platform,
                  "ms_per_op": out}))
