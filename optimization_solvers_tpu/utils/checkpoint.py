"""Checkpoint / resume for solver state (SURVEY.md §5: the reference has no
checkpointing — its solver structs are plain state that was never
serialized; here solver state is a pytree, so checkpointing is a straight
save/restore of leaves).

Use with the step-function API::

    init_fn, keep_going_fn, step_fn = solvers.make_step(method, search, oracle)
    carry = init_fn(x0)
    for _ in range(100):
        carry = step_fn(carry)
    save_state("ckpt.npz", carry)
    ...
    carry = load_state("ckpt.npz", like=init_fn(x0))   # resume
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, state) -> None:
    """Serialize any solver-state pytree (SolverCarry, L-BFGS-B carry,
    SolveResult, ...) to a single .npz file."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path, __treedef__=np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8), **arrays)


def load_state(path: str, like):
    """Restore a pytree saved by :func:`save_state`.  ``like`` supplies the
    tree structure (e.g. a freshly-built carry from ``init_fn``); leaf
    values are replaced by the checkpointed ones."""
    data = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    for got, want in zip(leaves, leaves_like):
        if got.shape != jnp.shape(want):
            raise ValueError(
                f"checkpoint leaf shape {got.shape} != expected "
                f"{jnp.shape(want)} — wrong `like` structure?"
            )
    return jax.tree.unflatten(treedef, leaves)


def save_state_orbax(path: str, state) -> None:
    """Orbax backend: multi-host-safe checkpointing for sharded solver
    state (each host writes its shards; restores preserve shardings).
    Prefer this over :func:`save_state` when the carry lives on a
    multi-device mesh.  The pytree is stored as position-indexed leaves
    (same convention as :func:`save_state`) so restoration is structure-
    exact regardless of how orbax maps container types."""
    import orbax.checkpoint as ocp

    leaves = jax.tree.leaves(state)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)})


def load_state_orbax(path: str, like):
    """Restore a pytree saved by :func:`save_state_orbax`.  ``like``
    supplies the tree structure (and, for sharded leaves, the target
    shardings orbax restores onto)."""
    import orbax.checkpoint as ocp

    leaves_like, treedef = jax.tree.flatten(like)
    item = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves_like)}
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=item)
    return jax.tree.unflatten(
        treedef, [restored[f"leaf_{i}"] for i in range(len(leaves_like))]
    )
