"""Log-density API and flow-preconditioned targets.

No reference counterpart (SURVEY.md §2b "HMC/NUTS over flow-preconditioned
targets" row): the reference stops at whitening/VI; this layer turns a
trained whitening flow into an MCMC preconditioner. A target log-density is
just a function ``(dim,) -> scalar`` (vmapped over chains by the samplers).

Flow preconditioning: if ``f`` maps whitened space -> data space (the
direction the reference calls "forward" for sampling, examples/
nf_variational_1d.jl:81-86), then MCMC runs in whitened coordinates xi with

    logp_white(xi) = logp(f(xi)) + ladj(f, xi)

and samples map back through ``f``. A perfectly trained whitening flow makes
logp_white a standard normal — the ideal geometry for HMC.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..bijectors.base import Bijector


class PreconditionedTarget(NamedTuple):
    """Whitened-space log-density plus the map back to data space."""
    logdensity_fn: Callable      # (dim,) -> scalar, whitened coordinates
    push_forward: Callable       # (..., dim) whitened -> (..., dim) data


def flow_preconditioned(logdensity_fn: Callable, flow: Bijector
                        ) -> PreconditionedTarget:
    """Precondition ``logdensity_fn`` with ``flow`` (whitened -> data).

    ``logdensity_fn``: per-sample target log-density, (dim,) -> scalar.
    ``flow``: bijector mapping whitened coordinates to data coordinates —
    i.e. the *inverse* of a trained whitening transform, or the transport
    learned by VI.
    """

    def logdensity_white(xi):
        z, ladj = flow.forward_and_ladj(xi)
        return logdensity_fn(z) + ladj

    return PreconditionedTarget(
        logdensity_fn=logdensity_white,
        push_forward=flow.forward,
    )


def value_and_grad_fn(logdensity_fn: Callable) -> Callable:
    """(q) -> (logp, grad). Samplers thread both to halve density evals."""
    return jax.value_and_grad(logdensity_fn)
