"""Distributed systematic resampling over a sharded particles axis.

No reference counterpart (SURVEY.md §2b "Collectives layer" row / §7 hard
part (c)). Particles live sharded as (n_local, dim) per device on a
``chains`` mesh axis; the resampler must produce a globally-correct
systematic sample without funneling all particles through one host.

Design (inside `shard_map`):

1. Global weight normalization: `pmax` shift + `psum` of local exp-sums —
   no gather of the weight vector itself.
2. One shared uniform u0 (broadcast from shard 0) defines the global
   systematic grid pts_t = (u0 + t)/N, identical on every shard.
3. Each shard computes the *global* ancestry indices for its own contiguous
   slot range [d*n_local, (d+1)*n_local) from the global CDF. The CDF is
   assembled from an `all_gather` of per-shard weight partial sums (K
   scalars) plus the local cumulative weights.
4. Particle exchange: ancestry is contiguous and monotone, so each shard's
   sources span a short run of devices; this implementation fetches via a
   tiled `all_gather` of particles (bandwidth N*dim per device — the right
   trade below ~10^6 x 100-dim particles, which covers every BASELINE.json
   config) and gathers rows locally. A ppermute ring exchanging only the
   needed contiguous slices is the planned upgrade path for larger N*dim;
   the ancestry computation (steps 1-3) already never materializes global
   weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .collectives import broadcast_from_zero


def sharded_systematic_resample(key, log_weights, particles,
                                axis_name: str = "chains"):
    """Systematic resampling of sharded particles; call inside shard_map.

    key: identical PRNG key on every shard (fold the step index, not the
    shard index). log_weights (n_local,), particles (n_local, dim).
    Returns resampled (n_local, dim) for this shard's slot range.
    """
    n_local = log_weights.shape[0]
    k = lax.psum(1, axis_name)               # number of shards
    n_global = n_local * k
    dtype = particles.dtype

    # 1. Stable global normalization.
    m = lax.pmax(jnp.max(log_weights), axis_name)
    w_local = jnp.exp(log_weights - m)            # (n_local,)
    local_sum = jnp.sum(w_local)
    total = lax.psum(local_sum, axis_name)
    w_local = w_local / total                     # globally normalized

    # 2. Shared uniform -> global systematic grid for my slots.
    u0 = broadcast_from_zero(jax.random.uniform(key, (), dtype), axis_name)
    my_dev = lax.axis_index(axis_name)
    slot0 = my_dev * n_local
    pts = (u0 + slot0 + jnp.arange(n_local, dtype=dtype)) / n_global

    # 3. Global CDF = device-prefix + local cumulative weights.
    sums = lax.all_gather(local_sum / total, axis_name)        # (k,)
    device_prefix = jnp.concatenate(
        [jnp.zeros(1, dtype), jnp.cumsum(sums)])               # (k+1,)
    local_cdf = jnp.cumsum(w_local)                            # (n_local,)
    # Build each shard's slice of the global CDF and gather it: the global
    # CDF is needed to searchsorted arbitrary pts (my slots' ancestors may
    # live on any shard).
    global_cdf = lax.all_gather(
        local_cdf + device_prefix[my_dev], axis_name, axis=0,
        tiled=True)                                            # (n_global,)
    anc = jnp.searchsorted(global_cdf, pts, side="left")
    anc = jnp.clip(anc, 0, n_global - 1)

    # 4. Fetch ancestor rows (gathered exchange; see module docstring).
    all_particles = lax.all_gather(particles, axis_name, axis=0,
                                   tiled=True)                 # (n_global, d)
    return jnp.take(all_particles, anc, axis=0)
