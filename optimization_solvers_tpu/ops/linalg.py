"""Dense linear-algebra cores (reference L4-adjacent: the nalgebra
inverse/Cholesky calls at ``newton/mod.rs:36``, ``projected_newton.rs:75``,
``spn.rs:86``).

This module is the dispatch seam: default implementations are XLA-native
(``lax.linalg``); TPU-tuned Pallas kernels in
:mod:`optimization_solvers_tpu.ops.pallas_chol` can be enabled per call or
globally.  All functions broadcast over leading batch dimensions so they
drop straight into vmapped solver loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_solve(h: jax.Array, g: jax.Array) -> jax.Array:
    """Solve ``H s = g`` for SPD ``H`` via Cholesky (the reference's
    ``hessian.cholesky().unwrap().solve(g)``).  Non-PD ``H`` produces NaNs
    (XLA semantics) rather than a panic."""
    chol = jnp.linalg.cholesky(h)
    y = jax.scipy.linalg.solve_triangular(chol, g, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False
    )


def solve_spd(h: jax.Array, g: jax.Array) -> jax.Array:
    """Alias used by Newton-family solvers; kept separate so a Pallas
    fused factor+solve can replace it without touching solver code."""
    return cholesky_solve(h, g)
