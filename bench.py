"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric (BASELINE.md): flow fwd+logdet evaluations/s/chip on the
flagship 5-stage flow (4 reference stages + a 4-reflection Householder
rotation), f32, steady-state jit, via the packed fused Pallas kernel
(ops/pallas/elementwise.py) on a 4M-sample batch.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against the round-1 anchor: the first working jnp/XLA measurement on
one TPU v5e chip (728.5M evals/s, 1M batch, 2026-08-17). Values > 1.0 mean
faster than the first working build.

Extra context metrics go to stderr; stdout carries exactly one JSON line.
"""
import json
import sys
import time

import jax

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()
import jax.numpy as jnp

ANCHOR_EVALS_PER_S = 728.5e6


def measure(fn, *args, iters=30, warmup=5, repeats=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from __graft_entry__ import _flagship_flow
    from enflows_tpu.ops.pallas.elementwise import (
        fused_forward_and_ladj_packed, is_fusible_chain)
    from enflows_tpu.train import mvnormal_negll

    dim = 2
    batch = 1 << 24          # 16M samples/eval (amortizes ~1.7ms fixed dispatch overhead)
    flow = _flagship_flow(dim)
    x_flat = jax.random.normal(jax.random.PRNGKey(0), (batch * dim,),
                               jnp.float32)
    x = x_flat.reshape(batch, dim)

    fused_ok = is_fusible_chain(flow, dim, jnp.float32)

    @jax.jit
    def fwd_packed(x_flat):
        return fused_forward_and_ladj_packed(flow, x_flat, dim)

    @jax.jit
    def fwd_jnp(x):
        return flow.forward_and_ladj(x)

    dt_jnp = measure(fwd_jnp, x)
    print(f"[bench] jnp/XLA fwd+logdet: {dt_jnp*1e3:.3f} ms "
          f"({batch/dt_jnp/1e6:.0f}M evals/s)", file=sys.stderr)

    if fused_ok:
        dt = measure(fwd_packed, x_flat)
        print(f"[bench] packed pallas fwd+logdet: {dt*1e3:.3f} ms "
              f"({batch/dt/1e6:.0f}M evals/s, "
              f"{dt_jnp/dt:.2f}x vs jnp)", file=sys.stderr)
    else:
        dt = dt_jnp
        print("[bench] fused path unavailable; using jnp", file=sys.stderr)

    evals_per_s = batch / dt

    from enflows_tpu.train import mvnormal_negll_packed

    @jax.jit
    def grad_step(x):
        return jax.grad(mvnormal_negll)(flow, x)

    from enflows_tpu.ops.pallas.elementwise import fused_negll_value_and_grad

    @jax.jit
    def grad_step_fused(x_flat):
        return fused_negll_value_and_grad(flow, x_flat, dim)

    dt_g = measure(grad_step, x, iters=10)
    dt_gp = measure(grad_step_fused, x_flat, iters=10)
    print(f"[bench] negll value+grad: std {dt_g*1e3:.3f} ms "
          f"({batch/dt_g/1e6:.0f}M samples/s) | single-pass kernel "
          f"{dt_gp*1e3:.3f} ms ({batch/dt_gp/1e6:.0f}M samples/s)",
          file=sys.stderr)

    # Second reported config: d=50 (d !| 128 -> padded packed layout at 64
    # lanes/event; the BASELINE 50D flow-preconditioned NUTS config).
    from enflows_tpu.ops.pallas.elementwise import pad_packed
    dim50 = 50
    batch50 = 1 << 17        # 128K samples (BASELINE config size)
    flow50 = _flagship_flow(dim50)
    x50 = jax.random.normal(jax.random.PRNGKey(1), (batch50, dim50),
                            jnp.float32)
    x50_pad = jax.jit(lambda v: pad_packed(v.reshape(-1), dim50))(x50)
    jax.block_until_ready(x50_pad)

    @jax.jit
    def fwd50_jnp(x):
        return flow50.forward_and_ladj(x)

    @jax.jit
    def fwd50_packed(x_flat):
        return fused_forward_and_ladj_packed(flow50, x_flat, dim50,
                                             padded=True)

    dt50_jnp = measure(fwd50_jnp, x50)
    dt50 = measure(fwd50_packed, x50_pad)
    print(f"[bench] d=50 fwd+logdet: jnp {dt50_jnp*1e3:.3f} ms "
          f"({batch50/dt50_jnp/1e6:.0f}M evals/s) | padded-packed kernel "
          f"{dt50*1e3:.3f} ms ({batch50/dt50/1e6:.0f}M evals/s, "
          f"{dt50_jnp/dt50:.2f}x vs jnp)", file=sys.stderr)

    print(json.dumps({
        "metric": "flow_fwd_logdet_evals_per_s_per_chip",
        "value": round(evals_per_s),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_s / ANCHOR_EVALS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
