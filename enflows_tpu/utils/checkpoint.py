"""Checkpoint / resume for training and sampling state.

The reference's only resume seed is the (trafo, optimizer-state) kwarg pair
(/root/reference/src/optimize_whitening.jl:28-29,44 — SURVEY.md §5). Here
checkpointing is a first-class subsystem: whole pytrees (params, opt_state,
rng key, step, chain states, adaptation state) serialize via Orbax when
available, with a dependency-free .npz fallback. Multi-host: only process 0
writes (single metadata writer), all processes restore.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:            # pragma: no cover
    _HAS_ORBAX = False


def save_checkpoint(path: str, pytree: Any, step: int = 0,
                    use_orbax: bool = False) -> str:
    """Save ``pytree`` under ``path`` (directory). Returns the final path.

    Default is the npz format (fast, dependency-free, plenty for flow/chain
    state sizes); pass use_orbax=True for async multi-host Orbax layout.
    """
    if jax.process_index() != 0:
        return path
    os.makedirs(path, exist_ok=True)
    if use_orbax and _HAS_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        target = os.path.join(os.path.abspath(path), f"step_{step}")
        ckpt.save(target, pytree, force=True)
        ckpt.wait_until_finished()
        return target
    leaves, treedef = jax.tree.flatten(pytree)
    target = os.path.join(path, f"step_{step}.npz")
    np.savez(target, *[np.asarray(l) for l in leaves])
    with open(os.path.join(path, f"step_{step}.tree.json"), "w") as f:
        json.dump({"treedef": str(treedef), "step": step,
                   "num_leaves": len(leaves)}, f)
    return target


def restore_checkpoint(path: str, like: Any, step: int = 0,
                       use_orbax: bool = False) -> Any:
    """Restore a pytree saved by save_checkpoint; ``like`` supplies the
    structure (and, for orbax, shapes/dtypes)."""
    if use_orbax and _HAS_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        target = os.path.join(os.path.abspath(path), f"step_{step}")
        return ckpt.restore(target, like)
    target = os.path.join(path, f"step_{step}.npz")
    data = np.load(target)
    leaves, treedef = jax.tree.flatten(like)
    new_leaves = [jnp.asarray(data[f"arr_{i}"])
                  for i in range(len(leaves))]
    return treedef.unflatten(new_leaves)


def latest_step(path: str) -> int | None:
    """Largest step with a saved checkpoint under ``path``, else None."""
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            stem = name[5:].split(".")[0]
            if stem.isdigit():
                steps.append(int(stem))
    return max(steps) if steps else None
