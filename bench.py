"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric (BASELINE.md): flow fwd+logdet evaluations/s/chip on the
flagship 5-stage flow (4 reference stages + Householder rotation), f32,
steady-state jit. The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is the ratio against a fixed anchor throughput recorded at
round 1 (ANCHOR_EVALS_PER_S below) — values > 1.0 mean faster than the
first working TPU build, tracking self-improvement across rounds.

Extra context metrics go to stderr; stdout carries exactly one JSON line.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

# Round-1 anchor: first working measurement on one TPU v5e chip
# (728.5M evals/s, 2026-08-17). vs_baseline == 1.0 means parity with it.
ANCHOR_EVALS_PER_S = 728.5e6


def measure(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _flagship_flow
    from enflows_tpu.distributions import std_normal_logpdf_sum

    dim = 2
    batch = 1 << 20          # 1M samples/eval
    flow = _flagship_flow(dim)
    X = jax.random.normal(jax.random.PRNGKey(0), (batch, dim), jnp.float32)

    @jax.jit
    def fwd_logdet(X):
        Y, ladj = flow.forward_and_ladj(X)
        return Y, ladj

    dt = measure(fwd_logdet, X)
    evals_per_s = batch / dt
    print(f"[bench] fwd+logdet: {dt*1e3:.3f} ms / {batch} evals "
          f"({evals_per_s/1e6:.1f}M evals/s)", file=sys.stderr)

    # Context: gradient step throughput (train loop inner step).
    from enflows_tpu.train import mvnormal_negll

    @jax.jit
    def grad_step(X):
        return jax.grad(mvnormal_negll)(flow, X)

    dt_g = measure(grad_step, X, iters=10)
    print(f"[bench] negll grad: {dt_g*1e3:.3f} ms / {batch} samples "
          f"({batch/dt_g/1e6:.1f}M samples/s)", file=sys.stderr)

    print(json.dumps({
        "metric": "flow_fwd_logdet_evals_per_s_per_chip",
        "value": round(evals_per_s),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_s / ANCHOR_EVALS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
