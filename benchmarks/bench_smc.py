"""SMC benchmark: particles/s and temperatures-to-convergence, with and
without learned annealing transports (BASELINE.md metric rows).

Target: 100D bimodal mixture (the BASELINE.json "100D multimodal mixture"
config) and a 2D anisotropic Gaussian with analytic log Z for a
correctness-gated timing.

Run: python benchmarks/bench_smc.py
"""
import json
import sys
import time

import jax

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()
import jax.numpy as jnp
import numpy as np

from enflows_tpu.smc import smc_sample, make_transport_fitter
from enflows_tpu.distributions import std_normal_logpdf_sum


def bench_2d(num_particles=65536):
    mu = jnp.asarray([3.0, -2.0], jnp.float32)

    def log_target(q):
        d = q - mu
        return -0.5 * jnp.sum(d * d) / 0.25

    true_logz = np.log(2 * np.pi * 0.25)
    # warm compile
    smc_sample(log_target, jax.random.PRNGKey(9), dim=2,
               num_particles=num_particles, max_temps=3)
    t0 = time.time()
    parts, lw, logz, infos = smc_sample(
        log_target, jax.random.PRNGKey(0), dim=2,
        num_particles=num_particles)
    jax.block_until_ready(parts)
    dt = time.time() - t0
    err = abs(float(logz) - true_logz)
    print(f"[smc-2d] {num_particles} particles, {len(infos)} temps, "
          f"{dt:.2f}s, logZ err {err:.3f}", file=sys.stderr)
    assert err < 0.2, "correctness gate failed"
    return num_particles * len(infos) / dt


def bench_100d(num_particles=32768):
    dim = 100

    def log_target(q):
        a = -0.5 * jnp.sum((q - 1.5) ** 2) + jnp.log(0.5)
        b = -0.5 * jnp.sum((q + 1.5) ** 2) + jnp.log(0.5)
        return jnp.logaddexp(a, b)

    true_logz = dim * 0.5 * np.log(2 * np.pi)
    t0 = time.time()
    parts, lw, logz, infos = smc_sample(
        log_target, jax.random.PRNGKey(0), dim=dim,
        num_particles=num_particles, mutation_steps=8)
    jax.block_until_ready(parts)
    dt = time.time() - t0
    w = np.asarray(jax.nn.softmax(lw))
    frac = float((w * (np.asarray(parts)[:, 0] > 0)).sum())
    err = abs(float(logz) - true_logz)
    print(f"[smc-100d] {num_particles} particles, {len(infos)} temps, "
          f"{dt:.2f}s, mode frac {frac:.3f}, logZ err {err:.2f}",
          file=sys.stderr)
    return num_particles * len(infos) / dt


def bench_transport(num_particles=65536):
    mu = jnp.asarray([3.0, -2.0], jnp.float32)

    def log_target(q):
        d = q - mu
        return -0.5 * jnp.sum(d * d) / 0.25

    fit = make_transport_fitter(lambda q: std_normal_logpdf_sum(q),
                                log_target, nsteps=60)
    t0 = time.time()
    parts, lw, logz, infos = smc_sample(
        log_target, jax.random.PRNGKey(0), dim=2,
        num_particles=num_particles, fit_transport=fit)
    jax.block_until_ready(parts)
    dt = time.time() - t0
    print(f"[smc-transport] {len(infos)} temps in {dt:.2f}s, "
          f"logZ {float(logz):.3f}", file=sys.stderr)
    return len(infos)


def main():
    pps_2d = bench_2d()
    pps_100d = bench_100d()
    temps_t = bench_transport()
    print(json.dumps({
        "smc_2d_particle_temps_per_s": round(pps_2d),
        "smc_100d_particle_temps_per_s": round(pps_100d),
        "smc_transport_temps": temps_t,
    }))


if __name__ == "__main__":
    main()
