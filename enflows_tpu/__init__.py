"""enflows_tpu: a TPU-native probabilistic-inference engine.

Brand-new JAX/XLA/Pallas framework with the capabilities of
bat/EuclidianNormalizingFlows.jl (reference mounted at /root/reference —
studied for behavior, not translated): a composable trainable-bijector
algebra with analytic log-abs-det-Jacobians and exact parameter-sharing
inverses, maximum-likelihood whitening and flow-VI trainers, flow-
preconditioned HMC/NUTS with windowed warmup, tempered SMC with learned
annealing transports, and multi-chip sharding over `jax.sharding.Mesh`.
"""

from . import bijectors, distributions

from .bijectors import (
    Bijector, Chain, Identity, compose, invert, forward_and_ladj,
    ScaleShift, CenterStretch, CenterContract, Johnson, JohnsonInv,
    Householder,
)
from .distributions import (
    FlowDistribution, JohnsonSU, std_normal_logpdf, std_normal_logpdf_sum,
)

__version__ = "0.1.0"
