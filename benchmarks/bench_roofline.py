"""Roofline accounting for the three headline numbers (VERDICT r1 #3).

Establishes EMPIRICAL per-chip roofs on the real TPU (instead of quoting
datasheet numbers that the toolchain may not reach):

1. HBM bandwidth roof: a pure-copy Pallas kernel (y = x) at headline size.
2. Transcendental roof: a Pallas kernel applying K=64 dependent exps per
   element (so compute strictly dominates the tile's memory traffic),
   giving elem-transcendentals/s.

Then measures the headline kernels, counts their bytes moved and
transcendental slots (static analysis of the stage bodies), and reports
achieved fraction of the BINDING roof:

    time_pred = max(bytes / BW_roof, transcendentals / T_roof)

Timing methodology (important on this box): the axon tunnel adds ~1 ms of
per-dispatch RPC overhead and `block_until_ready` returns before device
work completes for small launches, so naive dispatch loops mis-time in
BOTH directions. Every measurement here therefore chains K iterations
inside ONE jit via `lax.fori_loop` (data-dependent carry, so nothing can
be hoisted or elided), returns a scalar that is fetched to the host, and
takes the SLOPE between a small-K and a large-K run:

    t_iter = (t(K_hi) - t(K_lo)) / (K_hi - K_lo)

which cancels the fixed RPC/fetch latency and measures pure device time.

Results land in BASELINE.md's roofline table.

Run on the real chip: python benchmarks/bench_roofline.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
K_LO, K_HI = 4, 24


def slope_time(chain_k, *args, k_lo=K_LO, k_hi=K_HI, repeats=4):
    """Per-iteration device time of ``chain_k(*args, k)`` via the two-K
    slope; ``chain_k`` must run k data-dependent iterations and return a
    scalar (which we fetch to force completion)."""
    float(chain_k(*args, k_hi))  # compile both K variants
    float(chain_k(*args, k_lo))

    def best(k):
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chain_k(*args, k))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(k_hi) - best(k_lo)) / (k_hi - k_lo)


def _copy_kernel(x_ref, y_ref):
    y_ref[:] = x_ref[:]


N_EXP = 64


def _exp_kernel(x_ref, y_ref):
    t = x_ref[:]
    for _ in range(N_EXP):      # dependent chain: measures raw exp rate
        t = jnp.exp(-jnp.abs(t) * 0.1)
    y_ref[:] = t


def _log_kernel(x_ref, y_ref):
    t = x_ref[:]
    for _ in range(N_EXP):      # dependent chain: raw log rate
        t = jnp.log(jnp.abs(t) + 1.5)
    y_ref[:] = t


def _sqrt_kernel(x_ref, y_ref):
    t = x_ref[:]
    for _ in range(N_EXP):
        t = jnp.sqrt(jnp.abs(t) + 0.5)
    y_ref[:] = t


def _div_kernel(x_ref, y_ref):
    t = x_ref[:]
    for _ in range(N_EXP):
        t = 1.0 / (1.5 + t)
    y_ref[:] = t


def _pallas_map(kernel, x2d):
    rows = x2d.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(rows // TILE,),
        in_specs=[pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x2d)


def _chained_map(kernel):
    @functools.partial(jax.jit, static_argnums=1)
    def f(v, k):
        out = lax.fori_loop(0, k, lambda i, u: _pallas_map(kernel, u), v)
        return out[0, 0]
    return f


# Per-ELEMENT op counts for each stage body, by op CLASS — round 3
# corrected (VERDICT r2 next #2): round 2 modeled every transcendental at
# the exp rate AND miscounted the flagship stages (the chain holds
# CenterCONTRACT = invert(CenterStretch), not CenterStretch — 16
# transcendentals/elem, not 26). Each class now gets its own empirically
# measured dependent-chain roof; divides are counted too.
STAGE_OPS = {
    # (exp, log, sqrt, div)
    "Johnson": (0, 2, 1, 1),       # log(|u|+s), log(s); shared sqrt; /lam
    "CenterStretch": (1, 2, 1, 3),  # round-3 single-exp body
    "CenterContract": (2, 3, 0, 3),  # e1,e2; 2 log1p + log(sig sum); 3 div
    "JohnsonInv": (1, 1, 0, 2),    # e^{-|v|} shared; log1p; 2 div
    "ScaleShift": (0, 0, 0, 0),    # log|a| is a (1,128) row: amortized
    "Householder": (0, 0, 0, 0),   # MXU matmul
}

# Flagship 5-stage chain (bench.py / __graft_entry__._flagship_flow):
# compose(Johnson, invert(CenterStretch), Householder, Johnson,
# invert(CenterStretch)) — the inverts make the applied stages
# CenterContract.
FLAGSHIP = ["Johnson", "CenterContract", "Householder", "Johnson",
            "CenterContract"]


def main():
    print(f"backend={jax.default_backend()} "
          f"kind={jax.devices()[0].device_kind}")
    n_rows = 1 << 17            # 128K rows x 128 lanes = 16.7M f32 elements
    x = jax.random.normal(jax.random.PRNGKey(0), (n_rows, 128), jnp.float32)

    # The microkernels run ~0.2-1 ms/iter, below the tunnel's ~10 ms RPC
    # jitter at the default K spread — use a much wider spread so the
    # slope is signal-dominated.
    # Wide-but-bounded K spreads: the chained program compiles one
    # pallas_call per iteration and the axon tunnel's compile latency
    # scales with program size (k_hi=528 regressed to >40 min round 3).
    dt_copy = slope_time(_chained_map(_copy_kernel), x, k_lo=16, k_hi=272)
    nbytes = x.size * 4 * 2     # read + write
    bw_roof = nbytes / dt_copy
    print(f"copy roof: {dt_copy*1e3:.3f} ms -> {bw_roof/1e9:.0f} GB/s")

    roofs = {}
    for name, kern in [("exp", _exp_kernel), ("log", _log_kernel),
                       ("sqrt", _sqrt_kernel), ("div", _div_kernel)]:
        dt_k = slope_time(_chained_map(kern), x, k_lo=8, k_hi=136)
        dt_compute = max(dt_k - dt_copy, 1e-9)
        roofs[name] = N_EXP * x.size / dt_compute
        print(f"{name} roof: {dt_k*1e3:.3f} ms ({N_EXP} dependent) -> "
              f"{roofs[name]/1e9:.1f} G {name}/s")
    t_roof = roofs["exp"]

    def vpu_time(ops, elems):
        """Per-op-class predicted VPU time for (exp, log, sqrt, div)
        counts per element."""
        n_exp, n_log, n_sqrt, n_div = ops
        return elems * (n_exp / roofs["exp"] + n_log / roofs["log"]
                        + n_sqrt / roofs["sqrt"] + n_div / roofs["div"])

    def chain_ops(stages):
        return tuple(sum(STAGE_OPS[s][i] for s in stages)
                     for i in range(4))

    # ---- headline 1: packed fwd+logdet, flagship d=2, 16M samples.
    from __graft_entry__ import _flagship_flow
    from enflows_tpu.ops.pallas.elementwise import (
        fused_forward_and_ladj_packed, fused_negll_value_and_grad)

    dim, batch = 2, 1 << 24
    flow = _flagship_flow(dim)
    x_flat = jax.random.normal(jax.random.PRNGKey(1), (batch * dim,),
                               jnp.float32)

    @functools.partial(jax.jit, static_argnums=1)
    def chain_fwd(v, k):
        def body(i, u):
            # carry folds y AND ladj (scalar sum: no relayout, nothing
            # DCE-able; bounded, data-dependent)
            y, ladj = fused_forward_and_ladj_packed(flow, u, dim)
            return y * 0.1 + 1e-12 * jnp.sum(ladj)
        return lax.fori_loop(0, k, body, v)[0]

    dt = slope_time(chain_fwd, x_flat)
    evals = batch / dt
    ops = chain_ops(FLAGSHIP)
    elems = batch * dim
    # Kernel traffic: x in, y out, ladj out ((batch/ spd-padded) rows x 64
    # lanes f32); PLUS the fold carry's extra elementwise pass over y and
    # the scalar ladj reduction — the harness pays them, so the model
    # counts them (round-3 honest accounting).
    ladj_bytes = (elems // 2) * 4
    bytes_kernel = elems * 4 * 2 + ladj_bytes
    bytes_carry = elems * 4 * 2 + ladj_bytes      # y r+w, ladj read
    t_mem = (bytes_kernel + bytes_carry) / bw_roof
    t_vpu = vpu_time(ops, elems)
    t_pred = max(t_mem, t_vpu)
    binding = "HBM" if t_mem > t_vpu else "VPU"
    print(f"[fwd+logdet d=2] {dt*1e3:.3f} ms ({evals/1e9:.2f} G evals/s); "
          f"ops/elem (exp,log,sqrt,div)={ops}; "
          f"pred mem {t_mem*1e3:.3f} ms (incl. fold-carry pass), "
          f"pred vpu {t_vpu*1e3:.3f} ms "
          f"-> binding={binding}, achieved {t_pred/dt*100:.0f}% of roof")

    # ---- headline 2: single-pass negll+grad train step.
    # 4M batch for the chained variant: at 16M the kernel's per-tile grad
    # partials exceed the 16 MB scoped-VMEM limit once wrapped in the
    # fori_loop's buffer assignment. Throughput is batch-linear well below
    # that (verified vs the 16M dispatch-loop number), so report per-sample.
    batch_tr = 1 << 22
    x_tr = x_flat[: batch_tr * dim]

    @functools.partial(jax.jit, static_argnums=1)
    def chain_train(v, k):
        def body(i, u):
            # carry folds loss AND every grad leaf so nothing is DCE-able
            loss, grads = fused_negll_value_and_grad(flow, u, dim)
            gsum = sum(jnp.sum(g)
                       for g in jax.tree_util.tree_leaves(grads))
            return u + 1e-12 * loss + 1e-12 * gsum
        return lax.fori_loop(0, k, body, v)[0]

    dt_tr = slope_time(chain_train, x_tr, k_hi=48)
    # fwd + bwd sweep: roughly 2.5x forward transcendentals (bwd re-derives
    # stage adjoints; exp-family adjoints reuse forward values in-kernel,
    # AD emits ~1.5x extra slots), bytes: x read. The chained carry adds a
    # full x rewrite per iteration that the real train step does not pay;
    # the MEASURED (unadjusted) number is the headline, the copy-subtracted
    # estimate is reported alongside for context only (ADVICE.md r2).
    elems_tr = batch_tr * dim
    t_vpu_tr = vpu_time(ops, elems_tr) * 2.5
    # kernel reads x; the chained carry re-writes u (r+w) per iteration.
    bytes_tr = elems_tr * 4 * 3
    dt_tr_adj = max(dt_tr - dt_copy * elems_tr / x.size, 1e-9)
    t_pred_tr = max(bytes_tr / bw_roof, t_vpu_tr)
    binding = "HBM" if bytes_tr / bw_roof > t_vpu_tr else "VPU"
    print(f"[negll+grad d=2] {dt_tr*1e3:.3f} ms @ {batch_tr>>20}M "
          f"({batch_tr/dt_tr/1e9:.2f} G samples/s measured; "
          f"{batch_tr/dt_tr_adj/1e9:.2f} G after subtracting the chained "
          f"carry's copy artifact); "
          f"pred {t_pred_tr*1e3:.3f} ms -> binding={binding}, "
          f"achieved {t_pred_tr/dt_tr*100:.0f}% of roof "
          f"({t_pred_tr/dt_tr_adj*100:.0f}% adjusted)")

    # ---- headline 3: leapfrog+logprob, 8192 chains x 50D Gaussian.
    # The inner leapfrog steps are the chained iterations; slope over L.
    # Wide L spread + extra repeats: at ~17 us/step a 16..64 spread is
    # under 1 ms of signal, below the tunnel's RPC jitter (round 3 saw
    # negative slopes there).
    d50, chains, L_LO, L_HI = 50, 8192, 32, 512
    C = 0.9 * np.ones((d50, d50)) + 0.1 * np.eye(d50)
    P = jnp.asarray(np.linalg.inv(C), jnp.float32)
    logp = lambda q: -0.5 * q @ P @ q
    vg = jax.value_and_grad(logp)
    q0 = jax.random.normal(jax.random.PRNGKey(2), (chains, d50),
                           jnp.float32)
    p0 = jax.random.normal(jax.random.PRNGKey(3), (chains, d50),
                           jnp.float32)

    from enflows_tpu.mcmc.hmc import leapfrog

    @functools.partial(jax.jit, static_argnums=2)
    def chain_lf(q, p, L):
        g = jax.vmap(lambda qq: vg(qq)[1])(q)
        qf, pf, _, _ = jax.vmap(
            lambda q1, p1, g1: leapfrog(vg, q1, p1, g1, 0.05,
                                        jnp.ones(d50), L))(q, p, g)
        return qf[0, 0] + pf[0, 0]

    dt_lf = slope_time(chain_lf, q0, p0, k_lo=L_LO, k_hi=L_HI,
                       repeats=8)
    lf_per_s = chains / dt_lf
    # Per leapfrog step per chain: value_and_grad of q@P q — AD emits
    # ~3 (chains, d) x (d, d) matmuls (fwd qP, bwd cotangent, reuse).
    # ROUND-3 MODEL FIX: the widened L spread exposed that the scan
    # state (3 arrays x 8192 x 50 f32 = 4.8 MB) is VMEM-RESIDENT — the
    # round-2 "HBM round-trip per step" premise was wrong (it measured
    # 465 M steps/s under RPC-jitter-limited spreads and called it 81%
    # of an HBM roof that doesn't bind). The real binding resource is
    # the MXU at f32-accumulation rate.
    flops = chains * 3 * 2 * d50 * d50
    mxu_roof = 197e12 / 4 if jax.default_backend() == "tpu" else 1e12
    t_mxu = flops / mxu_roof
    print(f"[leapfrog 50D] {dt_lf*1e6:.1f} us/step ({lf_per_s/1e6:.0f} M "
          f"leapfrog-steps/s); state VMEM-resident (4.8 MB) -> "
          f"binding=MXU, pred {t_mxu*1e6:.1f} us, "
          f"achieved {t_mxu/dt_lf*100:.0f}% of roof")

    # ---- fused leapfrog kernel on the flow chain (the M5 kernel).
    try:
        import enflows_tpu as ef
        from enflows_tpu.ops.pallas.leapfrog import fused_leapfrog
        v = lambda val: jnp.full((d50,), val, jnp.float32)
        fchain = ef.compose(
            ef.Johnson(gamma=v(0.0), delta=v(5.0), xi=v(0.0), lam=v(5.0)),
            ef.invert(ef.CenterStretch(a=v(0.0), b=v(1.0), c=v(0.0))),
            ef.Householder(V=jax.random.normal(jax.random.PRNGKey(0),
                                               (4, d50))).canonicalize(),
        )

        @functools.partial(jax.jit, static_argnums=2)
        def chain_fused(q, p, L):
            qf, pf, _, _ = fused_leapfrog(fchain, q, p, 0.05, L)
            return qf[0, 0] + pf[0, 0]

        # ~30 us/step: needs a much wider L spread than the jnp path for
        # the slope to clear the tunnel's RPC jitter.
        dt_fl = slope_time(chain_fused, 0.3 * q0, p0, k_lo=64, k_hi=2048)

        # Roofline accounting (VERDICT r2 next #4a — the previously
        # missing row). Per leapfrog step: ONE gradient evaluation =
        # forward through the 3-stage chain (applied stages: Johnson,
        # CenterContract, Householder) + adjoint sweep (~2.5x the forward
        # op counts, same factor as the negll kernel). The kernel
        # computes on PADDED lanes (d=50 -> 64 lanes/event, 78%
        # utilization), so device work counts padded elements. Bytes/step
        # ~ 0: the whole trajectory is VMEM-resident (that is the point),
        # so the binding roof is the VPU; the MXU block-diag matmuls
        # overlap.
        dp50 = 64
        ops_fl = chain_ops(["Johnson", "CenterContract", "Householder"])
        t_vpu_fl = vpu_time(ops_fl, chains * dp50) * 2.5
        print(f"[fused-leapfrog 50D flow] {dt_fl*1e6:.1f} us/step "
              f"({chains/dt_fl/1e6:.0f} M leapfrog-steps/s); "
              f"fwd ops/elem {ops_fl} x2.5 bwd, bytes/step ~0 "
              f"(VMEM-resident) -> binding=VPU, pred {t_vpu_fl*1e6:.1f} "
              f"us, achieved {t_vpu_fl/dt_fl*100:.0f}% of roof "
              f"({t_vpu_fl/dt_fl*100*d50/dp50:.0f}% counting only real "
              f"lanes as useful work)")
    except Exception as e:          # CPU interpret mode may not support it
        print(f"[fused-leapfrog] skipped: {e}")


if __name__ == "__main__":
    main()
