"""Failure detection and elastic recovery (SURVEY.md §5: ABSENT upstream).

Preemption-tolerant training: a generic checkpointed step loop that resumes
from the latest checkpoint after a crash (resume equivalence is a tested
invariant — tests/test_resilience.py kills a run mid-way and asserts the
resumed result matches the uninterrupted one), plus a psum heartbeat
barrier that surfaces dead hosts as a timeout instead of a silent hang.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .checkpoint import save_checkpoint, restore_checkpoint, latest_step


def run_checkpointed(step_fn: Callable, state: Any, num_steps: int, *,
                     ckpt_dir: Optional[str] = None,
                     checkpoint_every: int = 100,
                     resume: bool = True,
                     on_step: Optional[Callable] = None):
    """Run ``state = step_fn(state, i)`` for i in [0, num_steps), saving
    every ``checkpoint_every`` steps and resuming from the latest saved
    step if ``resume`` and a checkpoint exists.

    step_fn must be deterministic given (state, i) — fold i into RNG keys —
    so a resumed run is bit-identical to an uninterrupted one.
    Returns (state, start_step_used).
    """
    start = 0
    if ckpt_dir and resume:
        last = latest_step(ckpt_dir)
        if last is not None:
            state = restore_checkpoint(ckpt_dir, state, step=last)
            start = last
    for i in range(start, num_steps):
        state = step_fn(state, i)
        done = i + 1
        if ckpt_dir and (done % checkpoint_every == 0
                         or done == num_steps):
            jax.block_until_ready(state)
            save_checkpoint(ckpt_dir, state, step=done)
        if on_step is not None:
            on_step(i, state)
    return state, start


def heartbeat(timeout_s: float = 60.0) -> bool:
    """Cross-host liveness probe: a real psum barrier spanning all devices.

    Shards a one-element-per-device array over a 1D mesh of every device in
    the system and runs ``lax.psum`` across that axis under ``shard_map`` —
    an actual ICI/DCN collective that every device (and therefore every
    host) must participate in, unlike a single-device reduction. A dead
    host shows up as this call exceeding ``timeout_s`` (checked host-side
    after dispatch) rather than an indefinite hang inside a later training
    collective; a wrong sum means a device returned corrupt data.
    """
    t0 = time.time()
    devs = jax.devices()
    n = len(devs)
    try:
        mesh = Mesh(np.asarray(devs), ("hb",))
        x = jax.device_put(jnp.ones((n,), jnp.float32),
                           NamedSharding(mesh, P("hb")))
        probe = jax.jit(jax.shard_map(
            lambda v: lax.psum(jnp.sum(v), "hb"),
            mesh=mesh, in_specs=P("hb"), out_specs=P()))
        out = probe(x)
        out.block_until_ready()
        if float(out) != float(n):
            return False
    except Exception:
        return False
    return (time.time() - t0) <= timeout_s
