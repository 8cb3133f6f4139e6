"""Fused train step UNDER shard_map: is the kernel win retained?

VERDICT r4 next #1 asked for a v5e measurement of the shard_map(1)-wrapped
train step (the form `optimize_whitening`/`optimize_elbo` now run when a
mesh is passed) against the unsharded fused step and the std jnp step.
Only one real chip exists, so this measures the WRAPPER cost (shard_map
trace + size-1 pmean collectives around the pallas_call), not multi-chip
scaling — correctness over n>1 shards is gated on the 8-device CPU mesh
(tests/test_parallel.py fused-sharded rows).

Run: python benchmarks/bench_sharded_train.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from bench import slope_stats                              # noqa: E402
from __graft_entry__ import _flagship_flow                 # noqa: E402
from enflows_tpu.ops.pallas.elementwise import \
    fused_negll_value_and_grad                             # noqa: E402
from enflows_tpu.parallel import make_mesh                 # noqa: E402
from enflows_tpu.train import mvnormal_negll               # noqa: E402


def main():
    dim = 2
    batch = 1 << 22
    flow = _flagship_flow(dim)
    x_flat = jax.random.normal(jax.random.PRNGKey(0), (batch * dim,),
                               jnp.float32)
    x = x_flat.reshape(batch, dim)

    def _fold(u, loss, grads):
        gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return u + 1e-12 * loss + 1e-12 * gsum

    def std_body(u):
        loss, grads = jax.value_and_grad(
            lambda f: mvnormal_negll(f, u))(flow)
        return _fold(u, loss, grads)

    def fused_body(u):
        loss, grads = fused_negll_value_and_grad(flow, u, dim)
        return _fold(u, loss, grads)

    mesh = make_mesh({"batch": len(jax.devices())}, axis_name="batch")

    def local_fn(u):
        loss, grads = fused_negll_value_and_grad(flow, u, dim)
        loss = lax.pmean(loss, "batch")
        grads = lax.pmean(grads, "batch")
        return _fold(u, loss, grads)

    sharded_fused = jax.shard_map(local_fn, mesh=mesh,
                                  in_specs=P("batch"),
                                  out_specs=P("batch"), check_vma=False)
    x_sh = jax.device_put(x_flat, NamedSharding(mesh, P("batch")))

    st_std = slope_stats(std_body, x, k_hi=48)
    st_fused = slope_stats(fused_body, x_flat, k_hi=48)
    st_sh = slope_stats(sharded_fused, x_sh, k_hi=48)

    def rate(st):
        return batch / st["median"] / 1e6

    print(f"std jnp step:            {rate(st_std):8.0f}M samples/s "
          f"(spread {st_std['spread']:.2f}x)")
    print(f"fused step (unsharded):  {rate(st_fused):8.0f}M samples/s "
          f"(spread {st_fused['spread']:.2f}x)")
    print(f"fused step shard_map({mesh.shape['batch']}): "
          f"{rate(st_sh):8.0f}M samples/s "
          f"(spread {st_sh['spread']:.2f}x)")
    print(f"kernel win retained under shard_map: "
          f"{st_std['median'] / st_sh['median']:.2f}x vs std "
          f"(unsharded fused was {st_std['median'] / st_fused['median']:.2f}x); "
          f"wrapper cost {st_sh['median'] / st_fused['median']:.3f}x")


if __name__ == "__main__":
    main()
