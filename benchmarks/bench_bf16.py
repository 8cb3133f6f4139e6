"""bf16 validation + speedup benchmark on the real chip (VERDICT r1 #8).

Two claims the library makes about bfloat16 that round 1 never measured:

1. The packed fused Pallas kernel admits bf16 inputs/params
   (``is_fusible_chain`` accepts bfloat16) — measure the packed kernel
   f32 vs bf16 at headline size and report the speedup plus max |err|
   against the f32 jnp oracle (Mosaic has no f64 lowering on TPU; the
   bf16 error under test is ~100x the f32 oracle's own noise floor).
2. ``MLPConditioner(compute_dtype='bfloat16')`` claims "~2x MXU rate" for
   the coupling conditioner — measure forward_and_ladj of a coupling
   stack f32 vs bf16 on the real chip.

Run: python benchmarks/bench_bf16.py   (real TPU; CPU works but speedups
are meaningless there).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import enflows_tpu as ef
from enflows_tpu.bijectors.coupling import coupling_stack
from enflows_tpu.ops.pallas.elementwise import (
    fused_forward_and_ladj_packed, is_fusible_chain)


def slope_measure(body, x, k_lo=4, k_hi=24, repeats=4):
    """Per-iteration device time via the chained two-K slope (cancels the
    tunnel's fixed RPC/fetch latency; see bench_roofline.py)."""
    import functools

    from jax import lax

    @functools.partial(jax.jit, static_argnums=1)
    def chain(v, k):
        out = lax.fori_loop(0, k, lambda i, u: body(u), v)
        return out.reshape(-1)[0].astype(jnp.float32)

    float(chain(x, k_hi))
    float(chain(x, k_lo))

    def best(k):
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chain(x, k))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(k_hi) - best(k_lo)) / (k_hi - k_lo)


def bench_packed(batch=1 << 24, dim=2):
    from __graft_entry__ import _flagship_flow
    flow32 = _flagship_flow(dim)
    assert is_fusible_chain(flow32, dim, jnp.bfloat16)
    flow16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), flow32)

    x32 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (batch * dim,),
                                  jnp.float32)
    x16 = x32.astype(jnp.bfloat16)

    f16 = jax.jit(lambda v: fused_forward_and_ladj_packed(flow16, v, dim))

    dt32 = slope_measure(
        lambda u: fused_forward_and_ladj_packed(flow32, u, dim)[0] * 0.1,
        x32)
    dt16 = slope_measure(
        lambda u: fused_forward_and_ladj_packed(flow16, u, dim)[0]
        * jnp.bfloat16(0.1), x16)

    # accuracy vs the f32 jnp oracle on a small slice (bf16 error dwarfs
    # f32 rounding, so f32 is an adequate reference)
    n_chk = 1 << 14
    xs = x32[: n_chk * dim].reshape(n_chk, dim)
    y_ref, ladj_ref = jax.jit(flow32.forward_and_ladj)(xs)
    y_ref = np.asarray(y_ref, np.float64)
    ladj_ref = np.asarray(ladj_ref, np.float64)
    y16, ladj16 = f16(x16[: n_chk * dim])
    y16 = np.asarray(y16, np.float64).reshape(n_chk, dim)
    err_y = np.max(np.abs(y16 - y_ref) / (1 + np.abs(y_ref)))
    err_l = np.max(np.abs(np.asarray(ladj16, np.float64)[:n_chk] - ladj_ref)
                   / (1 + np.abs(ladj_ref)))

    print(f"[packed f32] {dt32*1e3:.3f} ms ({batch/dt32/1e9:.2f} G evals/s)",
          file=sys.stderr)
    print(f"[packed bf16] {dt16*1e3:.3f} ms ({batch/dt16/1e9:.2f} G "
          f"evals/s, {dt32/dt16:.2f}x vs f32); rel err y {err_y:.2e}, "
          f"ladj {err_l:.2e}", file=sys.stderr)
    return {"packed_f32_evals_per_s": round(batch / dt32),
            "packed_bf16_evals_per_s": round(batch / dt16),
            "packed_bf16_speedup": round(dt32 / dt16, 2),
            "packed_bf16_rel_err_y": float(err_y),
            "packed_bf16_rel_err_ladj": float(err_l)}


def bench_coupling(batch=1 << 17, dim=64, hidden=512, n_layers=4):
    key = jax.random.PRNGKey(0)
    stacks = {}
    for cd in ("float32", "bfloat16"):
        stacks[cd] = coupling_stack(
            key, dim=dim, n_layers=n_layers, hidden=(hidden, hidden),
            compute_dtype=cd)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, dim), jnp.float32)

    results = {}
    for cd, stack in stacks.items():
        dt = slope_measure(
            lambda u, s=stack: s.forward_and_ladj(u)[0] * 0.1, x, k_hi=12)
        results[cd] = dt
        print(f"[coupling {cd}] {dt*1e3:.3f} ms "
              f"({batch/dt/1e6:.1f} M evals/s)", file=sys.stderr)
    sp = results["float32"] / results["bfloat16"]
    print(f"[coupling] bf16 speedup vs f32: {sp:.2f}x", file=sys.stderr)
    return {"coupling_f32_evals_per_s": round(batch / results["float32"]),
            "coupling_bf16_evals_per_s": round(batch / results["bfloat16"]),
            "coupling_bf16_speedup": round(sp, 2)}


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    out = {}
    out.update(bench_packed())
    out.update(bench_coupling())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
