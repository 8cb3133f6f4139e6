"""Multi-chip tempered SMC: particles sharded over a mesh ``chains`` axis.

The explicit `shard_map` counterpart of smc.smc (SURVEY.md §7 M4): every
per-particle computation stays shard-local; the only cross-chip traffic is

* global weight/ESS reductions (psum/pmax),
* the adaptive-tempering bisection (operates on psum'd scalars, so every
  shard runs the identical iteration — deterministic consensus),
* the distributed systematic resampler (parallel.resample),
* mutation step-size consensus (pmean of acceptance — SURVEY.md §5).

Everything else is embarrassingly parallel, which is why samples/s should
scale ~linearly in chips (the ≥80% scaling-efficiency target in
BASELINE.md).
"""
from __future__ import annotations

import functools
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..mcmc.hmc import hmc_kernel, init_state
from ..smc.smc import SMCState, SMCInfo, make_tempered
from .resample import sharded_systematic_resample


def _global_log_ess(log_weights, axis_name):
    m = lax.pmax(jnp.max(log_weights), axis_name)
    e = jnp.exp(log_weights - m)
    s1 = lax.psum(jnp.sum(e), axis_name)
    s2 = lax.psum(jnp.sum(e * e), axis_name)
    return 2.0 * jnp.log(s1) - jnp.log(s2)


def _global_logsumexp(x, axis_name):
    m = lax.pmax(jnp.max(x), axis_name)
    return m + jnp.log(lax.psum(jnp.sum(jnp.exp(x - m)), axis_name))


@functools.lru_cache(maxsize=32)
def make_sharded_smc_step(log_base: Callable, log_target: Callable,
                          mesh: Mesh, *, axis_name: str = "chains",
                          mutation_steps: int = 5, leapfrog_steps: int = 10,
                          ess_target: float = 0.5,
                          resample_threshold: float = 0.5,
                          resample_method: str | None = None,
                          target_accept: float = 0.65):
    """Build the jitted sharded one-temperature step:
    (key, state) -> (state, info), with state.particles/log_weights sharded
    on their leading axis over ``axis_name``."""
    tempered = make_tempered(log_base, log_target)

    def shard_step(key, particles, log_weights, beta, log_z, step_size):
        n_local, dim = particles.shape
        dtype = particles.dtype
        n_global = lax.psum(1, axis_name) * n_local
        k_res, k_mut = jax.random.split(key)

        lp0 = jax.vmap(log_base)(particles)
        lp1 = jax.vmap(log_target)(particles)
        log_ratio = lp1 - lp0

        # --- adaptive tempering by bisection on GLOBAL ESS (identical
        # psum'd scalars on every shard -> consensus for free).
        target_log_ess = jnp.log(jnp.asarray(
            ess_target, dtype) * n_global)

        def ess_at(b):
            return _global_log_ess(log_weights + (b - beta) * log_ratio,
                                   axis_name)

        def cond(c):
            lo, hi, it = c
            return (it < 60) & (hi - lo > 1e-6)

        def body(c):
            lo, hi, it = c
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= target_log_ess
            return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid), it + 1)

        one = jnp.asarray(1.0, dtype)
        full = ess_at(one) >= target_log_ess
        lo, _, _ = lax.while_loop(cond, body,
                                  (beta, one, jnp.asarray(0, jnp.int32)))
        beta_new = jnp.where(full, one, lo)

        # --- reweight + logZ (global reductions).
        lw_inc = (beta_new - beta) * log_ratio
        log_norm_prev = _global_logsumexp(log_weights, axis_name)
        log_z = log_z + _global_logsumexp(
            log_weights - log_norm_prev + lw_inc, axis_name)
        log_weights = log_weights + lw_inc

        cur_ess = jnp.exp(_global_log_ess(log_weights, axis_name))
        do_resample = cur_ess <= resample_threshold * n_global * (1 + 1e-6)

        def do_res(args):
            lw, parts = args
            new = sharded_systematic_resample(k_res, lw, parts, axis_name,
                                              method=resample_method)
            return jnp.zeros_like(lw), new

        log_weights, particles = lax.cond(
            do_resample, do_res, lambda a: a, (log_weights, particles))

        # --- mutation with pmean'd acceptance (step-size consensus).
        logp_fn = tempered(beta_new)
        kernel = hmc_kernel(logp_fn, num_steps=leapfrog_steps)
        states = jax.vmap(lambda q: init_state(logp_fn, q))(particles)

        # Ensemble mass matrix from GLOBAL weighted particle moments —
        # the distributed moment accumulation of SURVEY.md §5: two psums.
        log_norm = _global_logsumexp(log_weights, axis_name)
        w_norm = jnp.exp(log_weights - log_norm)              # (n_local,)
        mean_p = lax.psum(jnp.einsum("n,nd->d", w_norm, particles),
                          axis_name)
        var_p = lax.psum(
            jnp.einsum("n,nd->d", w_norm, (particles - mean_p) ** 2),
            axis_name)
        inv_mass = jnp.clip(var_p, 1e-6, 1e6)

        def mutate(carry, t):
            states, eps = carry
            keys = jax.random.split(jax.random.fold_in(k_mut, t), n_local)
            # Decorrelate shards: fold the shard index into each key.
            keys = jax.vmap(
                lambda kk: jax.random.fold_in(
                    kk, lax.axis_index(axis_name)))(keys)
            states, info = jax.vmap(kernel, in_axes=(0, 0, None, None))(
                keys, states, eps, inv_mass)
            acc = lax.pmean(jnp.mean(info.accept_prob), axis_name)
            eps = eps * jnp.exp(0.5 * (acc - target_accept))
            return (states, eps), acc

        (states, step_size), accs = lax.scan(
            mutate, (states, step_size), jnp.arange(mutation_steps))

        info = SMCInfo(beta=beta_new, ess=cur_ess,
                       accept_prob=jnp.mean(accs),
                       resampled=do_resample, log_z=log_z)
        return (states.q, log_weights, beta_new, log_z, step_size), info

    sharded = P(axis_name)
    repl = P()
    info_specs = SMCInfo(beta=repl, ess=repl, accept_prob=repl,
                         resampled=repl, log_z=repl)
    fn = shard_map(
        shard_step, mesh=mesh,
        in_specs=(repl, sharded, sharded, repl, repl, repl),
        out_specs=((sharded, sharded, repl, repl, repl), info_specs),
        check_vma=False)

    @jax.jit
    def step(key, state: SMCState):
        out, info = fn(key, state.particles, state.log_weights, state.beta,
                       state.log_z, state.step_size)
        particles, log_weights, beta, log_z, step_size = out
        return SMCState(particles, log_weights, beta, log_z,
                        step_size), info

    return step


def smc_sample_sharded(log_target: Callable, key, mesh: Mesh, *, dim: int,
                       num_particles: int = 8192,
                       log_base: Optional[Callable] = None,
                       base_sampler: Optional[Callable] = None,
                       axis_name: str = "chains",
                       mutation_steps: int = 5, leapfrog_steps: int = 10,
                       ess_target: float = 0.5,
                       resample_threshold: float = 0.5,
                       initial_step_size: float = 0.2,
                       max_temps: int = 200, dtype=jnp.float32):
    """Adaptive tempered SMC with particles sharded over ``mesh``.

    Same semantics as smc.smc_sample (without learned transports, which
    compose at the host level identically); returns
    (particles, log_weights, log_z, infos).
    """
    from ..distributions.base import std_normal_logpdf_sum

    if log_base is None:
        log_base = std_normal_logpdf_sum
        base_sampler = lambda k, n: jax.random.normal(k, (n, dim), dtype)
    assert base_sampler is not None

    nshards = mesh.shape[axis_name]
    assert num_particles % nshards == 0, \
        f"num_particles {num_particles} must divide over {nshards} shards"

    key, k0 = jax.random.split(key)
    particles = base_sampler(k0, num_particles)
    sh = NamedSharding(mesh, P(axis_name))
    state = SMCState(
        particles=jax.device_put(particles, sh),
        log_weights=jax.device_put(jnp.zeros(num_particles, dtype), sh),
        beta=jnp.zeros((), dtype),
        log_z=jnp.zeros((), dtype),
        step_size=jnp.asarray(initial_step_size, dtype),
    )
    step = make_sharded_smc_step(
        log_base, log_target, mesh, axis_name=axis_name,
        mutation_steps=mutation_steps, leapfrog_steps=leapfrog_steps,
        ess_target=ess_target, resample_threshold=resample_threshold)

    infos = []
    for t in range(max_temps):
        key, k_t = jax.random.split(key)
        state, info = step(k_t, state)
        infos.append(info)
        if float(state.beta) >= 1.0:
            break
    return state.particles, state.log_weights, state.log_z, infos
