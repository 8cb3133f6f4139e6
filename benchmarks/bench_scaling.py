"""Scaling-efficiency benchmark: sharded sampling throughput vs shard count.

Measures samples/s of the shard_map SMC mutation step and the sharded NUTS
driver at 1, 2, 4, ... shards of whatever devices exist. On a real pod
slice this yields the BASELINE.md host-scaling efficiency number; on the
8-device simulated CPU mesh it validates that the collective pattern has no
serial bottleneck (time should stay ~flat as shards×work grows — weak
scaling).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/bench_scaling.py
(The axon sitecustomize overrides JAX_PLATFORMS; this script honors the
env var explicitly, like __graft_entry__.)
"""
import json
import os
import sys
import time

import jax

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()

_want = os.environ.get("JAX_PLATFORMS", "")
if "cpu" in _want and "axon" not in _want:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from enflows_tpu.parallel import make_mesh, smc_sample_sharded
    from enflows_tpu.smc import SMCState
    from enflows_tpu.parallel.smc_sharded import make_sharded_smc_step
    from enflows_tpu.distributions import std_normal_logpdf_sum
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = len(jax.devices())
    mu = 1.5

    def log_target(q):
        return -0.5 * jnp.sum((q - mu) ** 2)

    dim = 16
    per_shard = 2048       # weak scaling: particles grow with shards
    results = {}
    shards = [s for s in [1, 2, 4, 8, 16] if s <= ndev]
    for s in shards:
        mesh = make_mesh({"chains": s}, devices=jax.devices()[:s])
        n = per_shard * s
        step = make_sharded_smc_step(
            std_normal_logpdf_sum, log_target, mesh,
            mutation_steps=4, leapfrog_steps=8)
        sh = NamedSharding(mesh, P("chains"))
        state = SMCState(
            particles=jax.device_put(
                jax.random.normal(jax.random.PRNGKey(0), (n, dim),
                                  jnp.float32), sh),
            log_weights=jax.device_put(jnp.zeros(n, jnp.float32), sh),
            beta=jnp.zeros((), jnp.float32),
            log_z=jnp.zeros((), jnp.float32),
            step_size=jnp.asarray(0.3, jnp.float32))
        # warm
        st, _ = step(jax.random.PRNGKey(1), state)
        jax.block_until_ready(st)
        iters = 10
        t0 = time.perf_counter()
        st = state
        for i in range(iters):
            st, _ = step(jax.random.fold_in(jax.random.PRNGKey(2), i), st)
        jax.block_until_ready(st)
        dt = (time.perf_counter() - t0) / iters
        rate = n / dt
        results[s] = rate
        print(f"[scaling] {s} shard(s): {n} particles/step, "
              f"{dt*1e3:.1f} ms/step -> {rate/1e6:.2f}M particle-steps/s",
              file=sys.stderr)

    base = results[shards[0]] / shards[0]
    eff = {s: results[s] / (base * s) for s in shards}
    print(json.dumps({
        "weak_scaling_particle_steps_per_s": {str(k): round(v)
                                              for k, v in results.items()},
        "efficiency_vs_1shard": {str(k): round(v, 3)
                                 for k, v in eff.items()},
    }))


if __name__ == "__main__":
    main()
