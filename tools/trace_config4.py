"""Capture a jax.profiler trace of the config-4 batch solve and print an
op-level self-time breakdown via xprof (no TensorBoard UI needed)."""

import glob
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
from optimization_solvers_tpu.solvers.lbfgsb import (
    LbfgsbConfig,
    lbfgsb_batch_minimize,
)

B, n, rows = 64, 10_000, 512
DTYPE = jnp.float32
TRACE_DIR = "/tmp/c4_trace"

key = jax.random.PRNGKey(0)
A = (jax.random.normal(key, (rows, n)) / np.sqrt(n)).astype(DTYPE)
b = jnp.linspace(-1.0, 1.0, rows).astype(DTYPE)
oracle = make_oracle(problems.log_sum_exp(A, b))
lower = jnp.full((n,), -1.0, DTYPE)
upper = jnp.full((n,), 1.0, DTYPE)
cfg = LbfgsbConfig(m=10, pgtol=1e-5, factr=1e3, max_iter=200,
                   gcp_chunk=int(os.environ.get("C4_CHUNK", 256)))
solve = jax.jit(lambda x0: lbfgsb_batch_minimize(oracle, x0, lower, upper, cfg))

rng = np.random.RandomState(4)
x_warm = jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)), DTYPE)
x_run = jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)), DTYPE)
r = solve(x_warm)
_ = np.asarray(r.f).sum()

os.system(f"rm -rf {TRACE_DIR}")
with jax.profiler.trace(TRACE_DIR):
    r = solve(x_run)
    _ = np.asarray(r.f).sum()

paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths, file=sys.stderr)

from xprof.convert import raw_to_tool_data

for tool in ("framework_op_stats", "op_profile"):
    for t in (tool, tool + "^"):
        try:
            data, _mime = raw_to_tool_data.xspace_to_tool_data(
                paths, t, {"tqx": "out:json;"})
            out = data if isinstance(data, (str, bytes)) else json.dumps(data)
            fn = f"/tmp/c4_{tool}.json"
            with open(fn, "w") as fh:
                fh.write(out if isinstance(out, str) else out.decode())
            print("wrote", fn, len(out), file=sys.stderr)
            break
        except Exception as e:  # noqa: BLE001
            print("tool", t, "failed:", repr(e)[:200], file=sys.stderr)
print("done")
