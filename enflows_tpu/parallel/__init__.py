from .mesh import (
    make_mesh, chains_sharding, replicated, shard_chains, distributed_init,
)
from .collectives import (
    pmean, psum, all_gather, psum_scatter, axis_index, broadcast_from_zero,
)
from .resample import sharded_systematic_resample
from .smc_sharded import (make_sharded_smc_step, build_sharded_smc_step,
                          make_sharded_smc_ladder, smc_sample_sharded)
from .mcmc_sharded import sample_sharded
from .event_sharded import (event_sharded_forward_and_ladj,
                            event_sharded_negll_fn, shard_event_batch)

__all__ = [
    "make_mesh", "chains_sharding", "replicated", "shard_chains",
    "distributed_init",
    "pmean", "psum", "all_gather", "psum_scatter", "axis_index",
    "broadcast_from_zero",
    "sharded_systematic_resample",
    "make_sharded_smc_step", "build_sharded_smc_step",
    "make_sharded_smc_ladder", "smc_sample_sharded", "sample_sharded",
    "event_sharded_forward_and_ladj", "event_sharded_negll_fn",
    "shard_event_batch",
]
