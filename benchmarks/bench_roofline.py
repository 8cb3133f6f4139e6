"""Roofline accounting for the three headline numbers (VERDICT r1 #3).

Establishes EMPIRICAL per-chip roofs on the real TPU (instead of quoting
datasheet numbers that the toolchain may not reach):

1. HBM bandwidth roof: a pure-copy Pallas kernel (y = x) at headline size.
2. Transcendental roof: a Pallas kernel applying K=8 dependent exps per
   element (amortizes memory traffic), giving elem-transcendentals/s.

Then measures the headline kernels, counts their bytes moved and
transcendental slots (static analysis of the stage bodies), and reports
achieved fraction of the BINDING roof:

    time_pred = max(bytes / BW_roof, transcendentals / T_roof)

Results land in BASELINE.md's roofline table.

Run on the real chip: python benchmarks/bench_roofline.py
"""
from __future__ import annotations

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


TILE = 1024


def _copy_kernel(x_ref, y_ref):
    y_ref[:] = x_ref[:]


def _exp_kernel(x_ref, y_ref):
    t = x_ref[:]
    for _ in range(8):          # dependent chain: measures raw exp rate
        t = jnp.exp(-jnp.abs(t) * 0.1)
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


# Transcendental slot counts per ELEMENT for each stage body (read off
# ops/pallas/elementwise.py stage bodies; log1p/logaddexp decompose into
# exp/log slots; sqrt and divide counted separately, cheaper on the VPU).
STAGE_TRANS = {
    # exp, log, sqrt
    "Johnson": (0, 2, 1),          # log(|u|+s), log(s); shared sqrt
    "CenterStretch": (5, 5, 0),    # exp(-m), 2x sigmoid-exp, logaddexp x2
                                   # (exp+log each), log1p, log(sig sum)
    "CenterContract": (2, 3, 0),   # e1, e2 shared; 2 log1p + final log
    "JohnsonInv": (1, 1, 0),       # e^{-|v|} shared; log1p
    "ScaleShift": (0, 1, 0),       # log|a| (pattern row: amortized, ~0)
    "Householder": (0, 0, 0),      # MXU matmul
}

# Flagship 5-stage chain (bench.py / __graft_entry__._flagship_flow):
# Johnson, CenterStretch, Householder, Johnson, CenterStretch.
FLAGSHIP = ["Johnson", "CenterStretch", "Householder", "Johnson",
            "CenterStretch"]


def main():
    print(f"backend={jax.default_backend()}")
    n_rows = 1 << 17            # 128K rows x 128 lanes = 16.7M f32 elements
    x = jax.random.normal(jax.random.PRNGKey(0), (n_rows, 128), jnp.float32)

    copy = jax.jit(lambda v: _pallas_map(_copy_kernel, v))
    dt_copy = measure(copy, x)
    nbytes = x.size * 4 * 2     # read + write
    bw_roof = nbytes / dt_copy
    print(f"copy roof: {dt_copy*1e3:.3f} ms -> {bw_roof/1e9:.0f} GB/s")

    expk = jax.jit(lambda v: _pallas_map(_exp_kernel, v))
    dt_exp = measure(expk, x)
    # 8 exps + 8 |.| + 8 muls per element; attribute to exp slots.
    t_roof = 8 * x.size / dt_exp
    print(f"exp roof: {dt_exp*1e3:.3f} ms -> {t_roof/1e9:.1f} G exp/s")

    # ---- headline 1: packed fwd+logdet, flagship d=2, 16M samples.
    from __graft_entry__ import _flagship_flow
    from enflows_tpu.ops.pallas.elementwise import (
        fused_forward_and_ladj_packed, fused_negll_value_and_grad,
        pad_packed)

    dim, batch = 2, 1 << 24
    flow = _flagship_flow(dim)
    x_flat = jax.random.normal(jax.random.PRNGKey(1), (batch * dim,),
                               jnp.float32)
    fwd = jax.jit(lambda v: fused_forward_and_ladj_packed(flow, v, dim))
    dt = measure(fwd, x_flat)
    evals = batch / dt
    n_exp = sum(STAGE_TRANS[s][0] for s in FLAGSHIP)
    n_log = sum(STAGE_TRANS[s][1] for s in FLAGSHIP)
    n_sqrt = sum(STAGE_TRANS[s][2] for s in FLAGSHIP)
    elems = batch * dim
    # Treat log/sqrt as one transcendental slot each (VPU rates comparable).
    trans_total = (n_exp + n_log + n_sqrt) * elems
    bytes_total = elems * 4 * 2 + batch * 4          # x in, y out, ladj out
    t_mem = bytes_total / bw_roof
    t_vpu = trans_total / t_roof
    t_pred = max(t_mem, t_vpu)
    binding = "HBM" if t_mem > t_vpu else "VPU-transcendental"
    print(f"[fwd+logdet d=2] {dt*1e3:.3f} ms ({evals/1e9:.2f} G evals/s); "
          f"{(n_exp+n_log+n_sqrt)} trans/elem; "
          f"pred mem {t_mem*1e3:.3f} ms, pred vpu {t_vpu*1e3:.3f} ms "
          f"-> binding={binding}, achieved {t_pred/dt*100:.0f}% of roof")

    # ---- headline 2: single-pass negll+grad train step.
    train = jax.jit(lambda v: fused_negll_value_and_grad(flow, v, dim))
    dt_tr = measure(train, x_flat, iters=10)
    # fwd + bwd sweep: roughly 2.5x forward transcendentals (bwd re-derives
    # stage adjoints; exp-family adjoints reuse forward values in-kernel,
    # AD emits ~1.5x extra slots), bytes: x read only (loss+grads are
    # tile-reduced partials).
    trans_tr = trans_total * 2.5
    bytes_tr = elems * 4
    t_pred_tr = max(bytes_tr / bw_roof, trans_tr / t_roof)
    binding = "HBM" if bytes_tr / bw_roof > trans_tr / t_roof else \
        "VPU-transcendental"
    print(f"[negll+grad d=2] {dt_tr*1e3:.3f} ms "
          f"({batch/dt_tr/1e9:.2f} G samples/s); "
          f"pred {t_pred_tr*1e3:.3f} ms -> binding={binding}, "
          f"achieved {t_pred_tr/dt_tr*100:.0f}% of roof")

    # ---- headline 3: leapfrog+logprob, 8192 chains x 50D Gaussian.
    from enflows_tpu.mcmc.hmc import hmc_kernel, init_state
    d50, chains, L = 50, 8192, 64
    C = 0.9 * np.ones((d50, d50)) + 0.1 * np.eye(d50)
    P = jnp.asarray(np.linalg.inv(C), jnp.float32)
    logp = lambda q: -0.5 * q @ P @ q
    kernel = hmc_kernel(logp, num_steps=L)
    q0 = jax.random.normal(jax.random.PRNGKey(2), (chains, d50),
                           jnp.float32)
    states = jax.jit(jax.vmap(lambda q: init_state(logp, q)))(q0)
    keys = jax.random.split(jax.random.PRNGKey(3), chains)
    ones = jnp.ones((d50,), jnp.float32)
    step = jax.jit(lambda ks, st: jax.vmap(
        kernel, in_axes=(0, 0, None, None))(ks, st, 0.05, ones))
    dt_lf = measure(step, keys, states, iters=10)
    lf_per_s = chains * L / dt_lf
    # Per leapfrog step per chain: value_and_grad of q@P q = 1 matvec
    # (2*d^2 flops) fwd + grad = P q reused -> AD does fwd ~2d^2 + bwd
    # ~2d^2 = 4d^2 flops on the MXU.
    flops = chains * L * 4 * d50 * d50
    mxu_roof = 99e12 if jax.default_backend() == "tpu" else 1e12  # f32/s
    t_mxu = flops / mxu_roof
    # Memory: q,p,grad states round-trip HBM per scan step (lax.scan over
    # L): 3 arrays x chains x d x 4B x 2(r+w) per step.
    bytes_lf = L * 3 * chains * d50 * 4 * 2
    t_mem_lf = bytes_lf / bw_roof
    binding = "HBM" if t_mem_lf > t_mxu else "MXU"
    t_pred_lf = max(t_mem_lf, t_mxu)
    print(f"[leapfrog 50D] {dt_lf*1e3:.3f} ms ({lf_per_s/1e6:.0f} M "
          f"leapfrog-steps/s); pred mem {t_mem_lf*1e3:.3f} ms, "
          f"pred mxu {t_mxu*1e3:.3f} ms -> binding={binding}, "
          f"achieved {t_pred_lf/dt_lf*100:.0f}% of roof")


if __name__ == "__main__":
    main()
