"""MCMC benchmarks: ESS/s for NUTS on the 2D example target, and raw
leapfrog+log-prob throughput (BASELINE.md metric rows).

The "2D example target" is the pushforward density of the reference's 2D
example flow (nf_example_2d.jl ground truth) — i.e. NUTS samples the
correlated, warped 2D density whose whitening transform the reference
learns, both raw and flow-preconditioned.

Run: python benchmarks/bench_mcmc.py [--chains 128]
"""
import argparse
import json
import sys
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()
import jax.numpy as jnp
import numpy as np

import enflows_tpu as ef
from enflows_tpu.mcmc import sample, ess_per_dim, flow_preconditioned
from enflows_tpu.mcmc.hmc import leapfrog


def example_2d_target(dtype=jnp.float32):
    v = lambda *a: jnp.asarray(a, dtype)
    flow = ef.compose(
        ef.ScaleShift(a=v(1.3, 0.4), b=v(2.5, -1.2)),
        ef.Householder(V=v(1.0, 0.3)),
        ef.CenterStretch(a=v(4.0, 4.1), b=v(2.0, 2.1), c=v(3.0, 3.1)),
    )
    dist = ef.FlowDistribution(bijector=flow)
    return lambda q: dist.logpdf(q), flow


def bench_nuts(num_chains, num_warmup=500, num_samples=1000):
    logp, flow = example_2d_target()
    logp1 = lambda q: logp(q)

    # Warm the compile, then time warmup+sampling end to end.
    t0 = time.time()
    samples, _, stats = sample(logp1, jax.random.PRNGKey(0), dim=2,
                               num_chains=num_chains,
                               num_warmup=num_warmup,
                               num_samples=num_samples)
    jax.block_until_ready(samples)
    t_total = time.time() - t0
    t0 = time.time()
    samples, _, stats = sample(logp1, jax.random.PRNGKey(1), dim=2,
                               num_chains=num_chains,
                               num_warmup=num_warmup,
                               num_samples=num_samples)
    jax.block_until_ready(samples)
    t_steady = time.time() - t0

    ess = ess_per_dim(samples)
    div = int(np.sum(np.asarray(stats.divergent)))
    print(f"[nuts-raw] chains={num_chains} warm+samp {t_steady:.2f}s "
          f"(first run incl. compile {t_total:.2f}s) min-ESS {ess.min():.0f}"
          f" div {div}", file=sys.stderr)
    return ess.min() / t_steady, samples.shape


def bench_preconditioned(num_chains, num_warmup=300, num_samples=1000):
    logp, flow = example_2d_target()
    target = flow_preconditioned(lambda q: logp(q), flow)
    t0 = time.time()
    s, _, stats = sample(target.logdensity_fn, jax.random.PRNGKey(0),
                         dim=2, num_chains=num_chains,
                         num_warmup=num_warmup, num_samples=num_samples)
    jax.block_until_ready(s)
    _ = time.time() - t0
    t0 = time.time()
    s, _, stats = sample(target.logdensity_fn, jax.random.PRNGKey(1),
                         dim=2, num_chains=num_chains,
                         num_warmup=num_warmup, num_samples=num_samples)
    jax.block_until_ready(s)
    t_steady = time.time() - t0
    z = target.push_forward(s)
    ess = ess_per_dim(np.asarray(z))
    print(f"[nuts-precond] chains={num_chains} {t_steady:.2f}s "
          f"min-ESS {ess.min():.0f}", file=sys.stderr)
    return ess.min() / t_steady


def bench_chees(num_chains, num_warmup=500, num_samples=1000):
    """ChEES-HMC on the same 2D warped target: the accelerator-native
    sampler's min-ESS/s vs NUTS (mcmc/chees.py design notes)."""
    logp, _ = example_2d_target()
    logp1 = lambda q: logp(q)

    def run(seed):
        s, _, stats = sample(logp1, jax.random.PRNGKey(seed), dim=2,
                             algorithm="chees", num_chains=num_chains,
                             num_warmup=num_warmup,
                             num_samples=num_samples)
        jax.block_until_ready(s)
        return s, stats

    t0 = time.time()
    run(0)
    t_total = time.time() - t0
    t0 = time.time()
    samples, stats = run(1)
    t_steady = time.time() - t0

    ess = ess_per_dim(samples)
    div = int(np.sum(np.asarray(stats.divergent)))
    grads = int(np.sum(np.asarray(stats.num_steps))) * num_chains
    print(f"[chees-raw] chains={num_chains} warm+samp {t_steady:.2f}s "
          f"(first run incl. compile {t_total:.2f}s) min-ESS {ess.min():.0f}"
          f" div {div} sampling-grad-evals {grads/1e6:.1f}M "
          f"traj {float(stats.trajectory_length):.3f} "
          f"step {float(stats.step_size):.4f}", file=sys.stderr)
    return ess.min() / t_steady


def bench_leapfrog(num_chains=8192, dim=50, num_steps=64, iters=20):
    """Raw per-chip leapfrog+log-prob throughput on a 50D Gaussian."""
    prec = jnp.eye(dim, dtype=jnp.float32)

    def logp(q):
        return -0.5 * q @ prec @ q

    vg = jax.value_and_grad(logp)
    q = jax.random.normal(jax.random.PRNGKey(0), (num_chains, dim))
    p = jax.random.normal(jax.random.PRNGKey(1), (num_chains, dim))
    g = jax.vmap(jax.grad(logp))(q)
    inv_mass = jnp.ones(dim)

    @jax.jit
    def run(q, p, g):
        return jax.vmap(
            lambda q, p, g: leapfrog(vg, q, p, g, 0.1, inv_mass,
                                     num_steps))(q, p, g)

    out = run(q, p, g)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(q, p, g)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    steps_per_s = num_chains * num_steps / dt
    print(f"[leapfrog] {num_chains} chains x {num_steps} steps x {dim}D: "
          f"{dt*1e3:.2f} ms -> {steps_per_s/1e6:.1f}M leapfrog-steps/s",
          file=sys.stderr)
    return steps_per_s


def bench_fused_leapfrog(num_chains=8192, dim=50, num_steps=64, iters=20):
    """Fused leapfrog+logprob Pallas kernel vs the jnp scan path on the
    SAME fusible-chain log density (flow-preconditioned structure) —
    SURVEY §7 M5 / the round-1 roofline review's optimization candidate."""
    from enflows_tpu.ops.pallas.leapfrog import fused_leapfrog
    import time as _t

    v = lambda val: jnp.full((dim,), val, jnp.float32)
    chain = ef.compose(
        ef.Johnson(gamma=v(0.0), delta=v(5.0), xi=v(0.0), lam=v(5.0)),
        ef.invert(ef.CenterStretch(a=v(0.0), b=v(1.0), c=v(0.0))),
        ef.Householder(V=jax.random.normal(jax.random.PRNGKey(0),
                                           (4, dim))).canonicalize(),
    )
    _LOG_2PI = 1.8378770664093453

    def logp(q):
        y, ladj = chain.forward_and_ladj(q)
        return jnp.sum(-(y * y + _LOG_2PI) * 0.5, -1) + ladj

    vg = jax.value_and_grad(lambda q1: logp(q1[None, :])[0])
    q = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (num_chains, dim))
    p = jax.random.normal(jax.random.PRNGKey(2), (num_chains, dim))
    g = jax.vmap(lambda qq: vg(qq)[1])(q)
    inv_mass = jnp.ones(dim)

    @jax.jit
    def run_jnp(q, p, g):
        return jax.vmap(
            lambda q, p, g: leapfrog(vg, q, p, g, 0.05, inv_mass,
                                     num_steps))(q, p, g)

    @jax.jit
    def run_fused(q, p):
        return fused_leapfrog(chain, q, p, 0.05, num_steps)

    def timeit(f, *a):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = _t.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.block_until_ready(out)
        return (_t.perf_counter() - t0) / iters

    dt_jnp = timeit(run_jnp, q, p, g)
    dt_fused = timeit(run_fused, q, p)
    sps_jnp = num_chains * num_steps / dt_jnp
    sps_fused = num_chains * num_steps / dt_fused
    print(f"[fused-leapfrog] {num_chains} x {num_steps} x {dim}D flow "
          f"chain: jnp {dt_jnp*1e3:.2f} ms ({sps_jnp/1e6:.1f}M steps/s) | "
          f"fused {dt_fused*1e3:.2f} ms ({sps_fused/1e6:.1f}M steps/s, "
          f"{dt_jnp/dt_fused:.2f}x)", file=sys.stderr)
    return sps_fused, dt_jnp / dt_fused


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=128)
    args = ap.parse_args()

    ess_raw, _ = bench_nuts(args.chains)
    ess_chees = bench_chees(args.chains)
    ess_pre = bench_preconditioned(args.chains)
    lf = bench_leapfrog()
    lf_fused, fused_speedup = bench_fused_leapfrog()
    print(json.dumps({
        "nuts_raw_min_ess_per_s": round(ess_raw, 1),
        "chees_raw_min_ess_per_s": round(ess_chees, 1),
        "nuts_precond_min_ess_per_s": round(ess_pre, 1),
        "leapfrog_steps_per_s": round(lf),
        "fused_flow_leapfrog_steps_per_s": round(lf_fused),
        "fused_leapfrog_speedup_vs_jnp": round(fused_speedup, 2),
    }))


if __name__ == "__main__":
    main()
