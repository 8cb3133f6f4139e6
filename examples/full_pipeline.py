"""End-to-end inference showcase: train -> precondition -> sample.

The workflow the whole framework exists for, on the reference's 2D example
target (nf_example_2d.jl ground truth):

1. observe data from the warped target, fit a whitening flow (M1);
2. run NUTS on the target raw vs flow-preconditioned (M2) — the
   preconditioned chains mix orders of magnitude faster;
3. cross-check the posterior with tempered SMC + learned transport (M3);
4. all three agree on the target's moments.

Run: python examples/full_pipeline.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import enflows_tpu as ef
from enflows_tpu.train import optimize_whitening
from enflows_tpu.mcmc import sample, flow_preconditioned, ess_per_dim
from enflows_tpu.smc import smc_sample


def main():
    dt = jnp.float32
    v = lambda *a: jnp.asarray(a, dt)

    # Ground-truth generative flow (reference nf_example_2d.jl:12-15).
    f_true = ef.compose(
        ef.ScaleShift(a=v(1.3, 0.4), b=v(2.5, -1.2)),
        ef.Householder(V=v(1.0, 0.3)),
        ef.CenterStretch(a=v(4.0, 4.1), b=v(2.0, 2.1), c=v(3.0, 3.1)),
    )
    target = ef.FlowDistribution(bijector=f_true)
    logp = lambda q: target.logpdf(q)

    key = jax.random.PRNGKey(0)
    X = target.sample(key, (50_000,), dim=2)
    true_mean = np.asarray(X).mean(0)
    true_cov = np.cov(np.asarray(X).T)

    # 1. Whitening fit.
    # Johnson stages capture the heavy tails the 2D example's 3-stage
    # model misses — without them the whitened geometry still diverges.
    model = ef.compose(
        ef.Johnson(gamma=v(0.0, 0.0), delta=v(5.0, 5.0),
                   xi=v(0.0, 0.0), lam=v(5.0, 5.0)),
        ef.invert(ef.CenterStretch(a=v(0.0, 0.0), b=v(1.0, 1.0),
                                   c=v(0.0, 0.0))),
        ef.invert(ef.Householder(
            V=jax.random.normal(jax.random.PRNGKey(1), (2,), dt))),
        ef.ScaleShift(a=v(1.0, 1.0), b=v(0.0, 0.0)),
    )
    t0 = time.time()
    fit = optimize_whitening(X, model, optax.adagrad(0.1),
                             nbatches=200, nepochs=10)
    print(f"[1] whitening fit in {time.time()-t0:.1f}s; "
          f"final negll {float(np.mean(np.asarray(fit.negll_history[-50:]))):.3f}")

    # 2. NUTS raw vs preconditioned.
    t0 = time.time()
    s_raw, _, st_raw = sample(logp, jax.random.PRNGKey(2), dim=2,
                              num_chains=64, num_warmup=400,
                              num_samples=500)
    t_raw = time.time() - t0
    ess_raw = ess_per_dim(s_raw).min()

    pre = flow_preconditioned(logp, ef.invert(fit.result))
    t0 = time.time()
    s_pre, _, st_pre = sample(pre.logdensity_fn, jax.random.PRNGKey(3),
                              dim=2, num_chains=64, num_warmup=400,
                              num_samples=500, target_accept=0.9)
    t_pre = time.time() - t0
    z_pre = np.asarray(pre.push_forward(s_pre)).reshape(-1, 2)
    ess_pre = ess_per_dim(np.asarray(pre.push_forward(s_pre))).min()
    div_raw = int(np.asarray(st_raw.divergent).sum())
    div_pre = int(np.asarray(st_pre.divergent).sum())
    print(f"[2] NUTS raw: min-ESS {ess_raw:.0f} in {t_raw:.1f}s "
          f"({div_raw} div) | preconditioned: min-ESS {ess_pre:.0f} in "
          f"{t_pre:.1f}s ({div_pre} div, "
          f"{ess_pre/t_pre/(ess_raw/t_raw):.0f}x ESS/s)")

    # 3. SMC cross-check.
    parts, lw, logz, infos = smc_sample(logp, jax.random.PRNGKey(4),
                                        dim=2, num_particles=32768,
                                        mutation_steps=10,
                                        leapfrog_steps=20)
    w = np.asarray(jax.nn.softmax(lw))
    p = np.asarray(parts)
    smc_mean = (w[:, None] * p).sum(0)
    print(f"[3] SMC: {len(infos)} temperatures, logZ {float(logz):.3f} "
          f"(target is normalized: 0 expected)")

    # 4. Agreement. The target is heavy-tailed (CenterStretch a=4), so
    # medians are the robust cross-check statistic; means carry large MC
    # error at these sample counts.
    nuts_mean = z_pre.mean(0)
    data_med = np.median(np.asarray(X), axis=0)
    nuts_med = np.median(z_pre, axis=0)
    # weighted median per dim for SMC
    def wmedian(vals, w):
        o = np.argsort(vals); cw = np.cumsum(w[o])
        return vals[o][np.searchsorted(cw, 0.5)]
    smc_med = np.array([wmedian(p[:, d], w) for d in range(2)])
    print(f"[4] means:   data {true_mean.round(3)} | "
          f"NUTS {nuts_mean.round(3)} | SMC {smc_mean.round(3)}")
    print(f"    medians: data {data_med.round(3)} | "
          f"NUTS {nuts_med.round(3)} | SMC {smc_med.round(3)}")
    ok = (np.abs(nuts_med - data_med).max() < 0.15
          and np.abs(smc_med - data_med).max() < 0.15
          and abs(float(logz)) < 0.2
          and ess_pre > 10 * ess_raw)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
