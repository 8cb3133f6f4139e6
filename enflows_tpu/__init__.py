"""enflows_tpu: a TPU-native probabilistic-inference engine.

Brand-new JAX/XLA/Pallas framework with the capabilities of
bat/EuclidianNormalizingFlows.jl (reference mounted at /root/reference —
studied for behavior, not translated): a composable trainable-bijector
algebra with analytic log-abs-det-Jacobians and exact parameter-sharing
inverses, maximum-likelihood whitening and flow-VI trainers, flow-
preconditioned HMC/NUTS with windowed warmup, tempered SMC with learned
annealing transports, and multi-chip sharding over `jax.sharding.Mesh`.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: NUTS/SMC scans take minutes to compile on
# TPU (remote AOT); caching makes every later process start warm. Opt out
# with ENFLOWS_NO_COMPILE_CACHE=1.
if not _os.environ.get("ENFLOWS_NO_COMPILE_CACHE"):
    try:
        _cache_dir = _os.environ.get(
            "ENFLOWS_COMPILE_CACHE",
            _os.path.expanduser("~/.cache/enflows_jax_cache"))
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           2.0)
    except Exception:
        pass

from . import bijectors, distributions

from .bijectors import (
    Bijector, Chain, Identity, compose, invert, forward_and_ladj,
    ScaleShift, CenterStretch, CenterContract, Johnson, JohnsonInv,
    Householder, AffineCoupling, Permute, init_affine_coupling,
    coupling_stack, RQSplineCoupling, ElementwiseRQSpline,
    init_rq_spline_coupling, init_elementwise_rq_spline,
    spline_coupling_stack,
)
from .distributions import (
    FlowDistribution, JohnsonSU, std_normal_logpdf, std_normal_logpdf_sum,
)
from .utils.pytree import param_dtype
from .infer import (
    infer, InferenceResult, summarize_draws, default_flow_template,
    coupling_flow_template,
)

__version__ = "0.1.0"
