"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric (BASELINE.md): flow fwd+logdet evaluations/s/chip on the
flagship 5-stage flow (4 reference stages + a 4-reflection Householder
rotation), f32, steady-state jit, via the packed fused Pallas kernel
(ops/pallas/elementwise.py) on a 16M-sample batch.

Timing methodology (round 2): the axon tunnel adds ~1 ms per dispatch and
`block_until_ready` is unreliable for small launches, so each measurement
chains K data-dependent iterations inside ONE jit (`lax.fori_loop`),
fetches a scalar, and takes the slope between a small-K and a large-K run
— pure device time, fixed RPC/fetch latency cancelled (see
benchmarks/bench_roofline.py for the full argument).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against the round-1 anchor: the first working jnp/XLA measurement on
one TPU v5e chip (728.5M evals/s, 1M batch, 2026-08-17). Values > 1.0 mean
faster than the first working build.

Extra context metrics go to stderr; stdout carries exactly one JSON line.
"""
import functools
import json
import sys
import time

import jax

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()
import jax.numpy as jnp
from jax import lax

ANCHOR_EVALS_PER_S = 728.5e6

K_LO, K_HI = 4, 24


def slope_stats(body, x, k_lo=K_LO, k_hi=K_HI, rounds=6):
    """Per-iteration device time of ``body`` (carry -> carry, data-
    dependent) via the two-K slope of a chained fori_loop; cancels the
    fixed per-dispatch RPC + fetch latency of the tunnel.

    Returns a stats dict instead of one cherry-pickable number (VERDICT
    r3 next #5): the slope is measured in ``rounds`` INTERLEAVED
    (k_hi, k_lo) pairs — the discipline that bounds this box's ±25%
    run-to-run wobble — and the dict carries ``n_runs``/``min``/
    ``median``/``spread`` (max/min) over per-round slopes, in seconds
    per iteration. BASELINE.md quotes these same fields."""

    @functools.partial(jax.jit, static_argnums=1)
    def chain(v, k):
        out = lax.fori_loop(0, k, lambda i, u: body(u), v)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.reshape(-1)[0]

    float(chain(x, k_hi))        # compile both variants first
    float(chain(x, k_lo))

    def timed(k):
        t0 = time.perf_counter()
        float(chain(x, k))
        return time.perf_counter() - t0

    slopes = []
    for _ in range(rounds):
        t_hi = timed(k_hi)
        t_lo = timed(k_lo)
        slopes.append((t_hi - t_lo) / (k_hi - k_lo))
    pos = sorted(s for s in slopes if s > 0.0) or sorted(slopes)
    stats = {
        "n_runs": len(pos),
        "min": pos[0],
        "median": pos[len(pos) // 2],
        "max": pos[-1],
        "spread": (pos[-1] / pos[0]) if pos[0] > 0 else float("inf"),
    }
    if stats["spread"] > 2.0:
        print(f"[bench] WARNING: slope spread {stats['spread']:.2f}x "
              f"across {rounds} rounds exceeds 2x — box noise is "
              f"dominating; treat medians, not mins", file=sys.stderr)
    return stats


def slope_measure(body, x, k_lo=K_LO, k_hi=K_HI, repeats=6):
    """Back-compat scalar: min-of-rounds slope (see ``slope_stats``)."""
    return slope_stats(body, x, k_lo, k_hi, rounds=repeats)["min"]


def main():
    from __graft_entry__ import _flagship_flow
    from enflows_tpu.ops.pallas.elementwise import (
        fused_forward_and_ladj_packed, fused_negll_value_and_grad,
        is_fusible_chain, pad_packed)
    from enflows_tpu.train import mvnormal_negll

    dim = 2
    batch = 1 << 24          # 16M samples/eval
    flow = _flagship_flow(dim)
    x_flat = jax.random.normal(jax.random.PRNGKey(0), (batch * dim,),
                               jnp.float32)
    x = x_flat.reshape(batch, dim)

    fused_ok = is_fusible_chain(flow, dim, jnp.float32)

    # Every body folds BOTH outputs (y and ladj) into the carry: dropping
    # ladj lets XLA dead-code-eliminate the jnp path's logdet computation
    # while the Pallas kernel always computes it in-kernel (one opaque
    # call), biasing the comparison in jnp's favor (ADVICE.md r2). The
    # fold is a SCALAR sum — every ladj element feeds it, so nothing is
    # DCE-able, and the broadcast-add fuses without any relayout (a
    # ladj[:, None] fold would force the packed layout's 64x relayout).
    def jnp_body(u):
        y, ladj = flow.forward_and_ladj(u)
        return y * 0.1 + 1e-12 * jnp.sum(ladj)

    def packed_body(u):
        y, ladj = fused_forward_and_ladj_packed(flow, u, dim)
        return y * 0.1 + 1e-12 * jnp.sum(ladj)

    st_jnp = slope_stats(jnp_body, x)
    dt_jnp = st_jnp["min"]
    print(f"[bench] jnp/XLA fwd+logdet: min {dt_jnp*1e3:.3f} ms / median "
          f"{st_jnp['median']*1e3:.3f} ms ({batch/st_jnp['median']/1e6:.0f}"
          f"M evals/s median, spread {st_jnp['spread']:.2f}x)",
          file=sys.stderr)

    if fused_ok:
        st = slope_stats(packed_body, x_flat)
        dt = st["min"]
        print(f"[bench] packed pallas fwd+logdet: min {dt*1e3:.3f} ms / "
              f"median {st['median']*1e3:.3f} ms "
              f"({batch/st['median']/1e6:.0f}M evals/s median, spread "
              f"{st['spread']:.2f}x, {st_jnp['median']/st['median']:.2f}x "
              f"vs jnp median)", file=sys.stderr)
    else:
        st = st_jnp
        dt = dt_jnp
        print("[bench] fused path unavailable; using jnp", file=sys.stderr)

    evals_per_s = batch / st["median"]

    # 4M batch for the chained train step (at 16M the kernel's per-tile
    # grad partials exceed the 16 MB scoped-VMEM limit inside fori_loop);
    # throughput is batch-linear here, so report per-sample.
    batch_tr = 1 << 22
    x_tr_flat = x_flat[: batch_tr * dim]
    x_tr = x_tr_flat.reshape(batch_tr, dim)

    # Fold loss AND every gradient leaf into the carry — with only the
    # loss carried, XLA DCEs the std path's entire backward pass and the
    # "value+grad" timing measures forward-only negll (ADVICE.md r2).
    def _fold_grads(u, loss, grads):
        gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return u + 1e-12 * loss + 1e-12 * gsum

    def grad_body_std(u):
        loss, grads = jax.value_and_grad(
            lambda f: mvnormal_negll(f, u))(flow)
        return _fold_grads(u, loss, grads)

    def grad_body_fused(u):
        loss, grads = fused_negll_value_and_grad(flow, u, dim)
        return _fold_grads(u, loss, grads)

    st_g = slope_stats(grad_body_std, x_tr, k_hi=48)
    st_gp = slope_stats(grad_body_fused, x_tr_flat, k_hi=48)
    print(f"[bench] negll value+grad: std median {st_g['median']*1e3:.3f} "
          f"ms ({batch_tr/st_g['median']/1e6:.0f}M samples/s) | "
          f"single-pass kernel median {st_gp['median']*1e3:.3f} ms "
          f"({batch_tr/st_gp['median']/1e6:.0f}M samples/s, "
          f"{st_g['median']/st_gp['median']:.2f}x; spreads "
          f"{st_g['spread']:.2f}/{st_gp['spread']:.2f})", file=sys.stderr)

    # Second reported config: d=50 (the BASELINE 50D flow-preconditioned
    # NUTS config), measured the way a real hot loop runs it — padding
    # hoisted once outside the loop, packed kernel per iteration
    # (optimize_whitening's dispatch; one-shot standard-layout calls pay
    # a per-call relayout that eats the win, see fused_forward_and_ladj).
    # The packed-vs-jnp d-sweep lives in benchmarks/bench_dispatch_sweep.
    dim50 = 50
    batch50 = 1 << 17        # 128K samples (BASELINE config size)
    flow50 = _flagship_flow(dim50)
    x50 = jax.random.normal(jax.random.PRNGKey(1), (batch50, dim50),
                            jnp.float32)
    x50p = jax.jit(lambda v: pad_packed(v.reshape(-1), dim50))(x50)
    jax.block_until_ready(x50p)

    def body50(u):
        y, ladj = fused_forward_and_ladj_packed(flow50, u, dim50,
                                                padded=True)
        return y * 0.1 + 1e-12 * jnp.sum(ladj)

    st50 = slope_stats(body50, x50p, k_hi=64)
    print(f"[bench] d=50 fwd+logdet (dispatched hot-loop path, packed): "
          f"median {st50['median']*1e3:.3f} ms "
          f"({batch50/st50['median']/1e6:.0f}M evals/s, spread "
          f"{st50['spread']:.2f}x)", file=sys.stderr)

    def per_s(stats, n):
        return {"n_runs": stats["n_runs"],
                "min": round(n / stats["max"]),      # worst-round rate
                "median": round(n / stats["median"]),
                "max": round(n / stats["min"]),      # best-round rate
                "spread": round(stats["spread"], 2)}

    # ``value`` is the MEDIAN rate (was best-of-N in rounds 1-3); the
    # min/median/max/spread fields make the driver artifact reconcilable
    # with BASELINE.md field-for-field (VERDICT r3 next #5).
    hs = per_s(st, batch)
    print(json.dumps({
        "metric": "flow_fwd_logdet_evals_per_s_per_chip",
        "value": round(evals_per_s),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_s / ANCHOR_EVALS_PER_S, 3),
        "n_runs": hs["n_runs"],
        "min": hs["min"],
        "median": hs["median"],
        "max": hs["max"],
        "spread": hs["spread"],
        "jnp_baseline_median": round(batch / st_jnp["median"]),
        "speedup_vs_jnp_median": round(st_jnp["median"] / st["median"], 2),
        "d50_evals_per_s": per_s(st50, batch50),
        "train_kernel_samples_per_s": per_s(st_gp, batch_tr),
        "train_std_samples_per_s": per_s(st_g, batch_tr),
    }))


if __name__ == "__main__":
    main()
