"""Multi-chip MCMC: chains sharded over a mesh ``chains`` axis.

Uses XLA's sharding propagation rather than explicit shard_map: the chain
axis of every state array carries a `NamedSharding`, so inside the jitted
warmup/sampling scans all per-chain work stays shard-local and the
cross-chain reductions in adaptation (`jnp.mean` of acceptance, Welford
batch merges — see mcmc.adaptation) lower to psum collectives
automatically. One step size / mass matrix, bit-identical on every shard
(SURVEY.md §5 multi-host determinism requirement).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..mcmc.sample import sample
from .mesh import chains_sharding


def sample_sharded(logdensity_fn: Callable, key, mesh: Mesh, *, dim: int,
                   num_chains: int = 64, axis_name: str = "chains",
                   dtype=jnp.float32, initial_position=None, **kwargs):
    """`mcmc.sample` with the chains axis sharded over ``mesh``.

    num_chains must be divisible by the mesh axis size. Returns the same
    (samples, final_states, stats) triple; samples come back with the
    chains axis sharded (device-resident until gathered).
    """
    nshards = mesh.shape[axis_name]
    if num_chains % nshards != 0:
        raise ValueError(
            f"num_chains {num_chains} must divide over {nshards} shards")
    sh = chains_sharding(mesh, axis_name)
    if initial_position is None:
        key, k0 = jax.random.split(key)
        initial_position = 0.1 * jax.random.normal(
            k0, (num_chains, dim), dtype)
    initial_position = jax.device_put(
        jnp.asarray(initial_position, dtype), sh)
    return sample(logdensity_fn, key, dim=dim, num_chains=num_chains,
                  initial_position=initial_position, dtype=dtype, **kwargs)
