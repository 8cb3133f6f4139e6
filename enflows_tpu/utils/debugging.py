"""Numerical-safety guards (SURVEY.md §5 race-detection row).

JAX is functional, so data races don't exist; the failure modes that fill
the same niche are NaN/Inf propagation inside jitted scans and diverging
replicated state across shards. This module provides:

* ``assert_finite`` — in-jit finiteness check via `checkify`, raising with
  a named location on the host;
* ``nan_guard`` — wrap a function so every output leaf is checked;
* ``assert_replicated_consistent`` — the deterministic-collective
  assertion: verifies every shard of a nominally-replicated value is
  bit-identical (SURVEY §5: "same psum result on every host").
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def assert_finite(x: Any, name: str = "value") -> None:
    """Inside jit (under checkify) or eagerly: error if any leaf has
    NaN/Inf."""
    for i, leaf in enumerate(jax.tree.leaves(x)):
        if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            continue
        checkify.check(jnp.all(jnp.isfinite(leaf)),
                       f"non-finite values in {name} (leaf {i})")


def nan_guard(fn: Callable, name: str = "output") -> Callable:
    """Return a checked version of ``fn``: call it like the original; it
    raises ValueError on NaN/Inf in any output leaf.

    The checkify transform runs inside jit, so the guard costs one fused
    reduction per leaf — cheap enough for production train loops.
    """

    def checked(*args, **kwargs):
        def inner(*a, **k):
            out = fn(*a, **k)
            assert_finite(out, name)
            return out

        err, out = checkify.checkify(inner)(*args, **kwargs)
        err.throw()
        return out

    return checked


def assert_replicated_consistent(x: jax.Array, name: str = "value") -> None:
    """Assert all device shards of a replicated array are bit-identical.

    Catches non-deterministic collectives / diverging adaptation state
    before they corrupt a run (SURVEY §5 multi-host determinism).
    """
    shards = [np.asarray(s.data) for s in x.addressable_shards]
    for i, s in enumerate(shards[1:], 1):
        if not np.array_equal(shards[0], s, equal_nan=True):
            raise AssertionError(
                f"replicated {name} diverges between shard 0 and shard {i}")
