"""Spline-epilogue anatomy: is the fused spline kernel's VPU epilogue at
the roof, or is there headroom? (VERDICT r4 next #3.)

Method (the bench_kernel_anatomy standard): decompose the fused kernel's
time into MXU (conditioner matmuls) and VPU (slab epilogue) by measuring
a variant whose epilogue is replaced by a trivial affine tail, then
compare the epilogue's residual cost against a SYNTHETIC pure-VPU kernel
running the same op mix on the same slab shapes. If the real epilogue's
per-element cost matches the synthetic issue rate, the epilogue is at
the VPU roof and further fusion/reordering cannot help — only fewer ops
can, and the measured variants below show the op count is already tight:

* HOISTING the per-bin size/deriv slabs in NARROW (tile, da) form:
  measured IDENTICAL at tile 256 (13.52 vs 13.53 ms at the BASELINE
  config) and SLOWER at tile 512/1024 under a raised vmem limit
  (15.9-16.1 ms) — the epilogue is issue-bound, not
  transcendental-bound.
* RECIPROCAL-hoisting (20 -> 4 divisions/element): identical (13.62 vs
  13.55 ms) — division throughput is not binding either.
* WIDE-BLOCK size/deriv computation — one exp over the full
  (tile, 2K*da) block, one softplus over (tile, (K-1)*da), instead of
  2K/2K narrow ops each occupying a full VPU issue slot at da/128 lane
  utilization: 13.55 -> 12.51 ms (+8%), bit-equivalent to 1.4e-6.
  This IS the production epilogue now (_spline_slab_epilogue); it also
  lifted the spline train step from 1.15x to 1.28x over the std path
  (the backward saves each wide slab once instead of per recompute).
  The remaining per-bin cost is the masked accumulate fan itself,
  whose 6 selects per bin are inherently narrow (the accumulators are
  (tile, da) state threaded through the serial edge cumsum).
* ONE-HOT selects as MXU contractions (VERDICT suggestion): structurally
  inapplicable — the selected quantities q_k(i, j) vary per LANE j (each
  event dim has its own spline), so the select is a per-element
  contraction sum_k oh[i,j,k] * q[i,j,k], not a (tile, K) x (K, ...)
  matmul with shared right operand. No MXU shape exists for it.
* log2(K) BISECTION locate: locating the bin is not the cost — the K
  per-bin fma accumulations that SELECT the located bin's quantities
  are, and bisection still needs them (index arithmetic without gathers
  reduces to the same one-hot fan). A ge-telescoping reformulation
  (every select as sum_k c_k * [x >= edge_k], park-free) was op-counted
  at ~19 vops/bin vs the current ~17 — no win available there either.

Run: python benchmarks/bench_spline_anatomy.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import benchmarks.bench_coupling as bc
import enflows_tpu.ops.pallas.coupling as cp
from enflows_tpu.bijectors.coupling import _ACTIVATIONS
from bench import slope_stats

TILE = 256


def main():
    x = jax.random.normal(jax.random.PRNGKey(1), (bc.BATCH, bc.DIM),
                          jnp.float32)
    spl = bc.build_spline()
    with jax.ensure_compile_time_eval():
        static_plan, flat_params, _ = cp._stack_plan(spl, bc.DIM)
    da = bc.DIM // 2
    K = static_plan[0][3][0]

    def run_kernel(label, epilogue):
        """epilogue(tgt, h, item) -> (new, row); h is the conditioner
        output slab block."""
        def impl(xx):
            n = xx.shape[0]
            n_padded = -(-n // TILE) * TILE
            in_specs = [pl.BlockSpec((TILE, bc.DIM), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)]
            for p in flat_params:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                             memory_space=pltpu.VMEM))

            def kernel(x_ref, *refs):
                y_ref, ladj_ref = refs[-2], refs[-1]
                params = [r[:] for r in refs[:-2]]
                xt = x_ref[:].astype(jnp.float32)
                ha, hb = xt[:, :da], xt[:, da:]
                acc = None
                pi = 0
                for item in static_plan:
                    src = item[1]
                    act = _ACTIVATIONS[item[4]]
                    n_layers = item[5]
                    h = ha if src == 0 else hb
                    for li in range(n_layers):
                        W = params[pi]
                        b = params[pi + 1].astype(jnp.float32)
                        pi += 2
                        h = jax.lax.dot(
                            h, W.astype(jnp.float32),
                            preferred_element_type=jnp.float32) + b
                        if li + 1 < n_layers:
                            h = act(h)
                    tgt = hb if src == 0 else ha
                    new, row = epilogue(tgt, h, item)
                    if src == 0:
                        hb = new
                    else:
                        ha = new
                    acc = row if acc is None else acc + row
                y_ref[:] = jnp.concatenate([ha, hb],
                                           axis=1).astype(y_ref.dtype)
                ladj_ref[:] = acc.astype(ladj_ref.dtype)

            y, l = pl.pallas_call(
                kernel, grid=(n_padded // TILE,), in_specs=in_specs,
                out_specs=(
                    pl.BlockSpec((TILE, bc.DIM), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)),
                out_shape=(
                    jax.ShapeDtypeStruct((n_padded, bc.DIM), xx.dtype),
                    jax.ShapeDtypeStruct((n_padded, 1), jnp.float32)),
                interpret=jax.default_backend() == "cpu",
            )(xx, *flat_params)
            return y * 0.1 + 1e-12 * jnp.sum(l)

        st = slope_stats(impl, x, rounds=4)
        print(f"[spline-anatomy] {label}: {st['median']*1e3:.3f} ms "
              f"({bc.BATCH/st['median']/1e6:.1f}M evals/s, spread "
              f"{st['spread']:.2f}x)")
        return st["median"]

    # 1. Full production epilogue.
    t_full = run_kernel(
        "full spline epilogue",
        lambda tgt, h, item: cp._spline_slab_epilogue(
            tgt, h, da, item[3][0], item[3][1], item[2]))

    # 2. Trivial epilogue — isolates the MXU conditioner cost. The tail
    #    must consume EVERY column of h: a tail reading only h[:, :da]
    #    lets Mosaic DCE 55% of the last matmul's columns and reports a
    #    physically impossible 482% of the f32 roof (measured — the
    #    first version of this bench did exactly that).
    def mxu_tail(tgt, h, item):
        P = 3 * item[3][0] - 1
        hsum = sum(h[:, p * da:(p + 1) * da] for p in range(P))
        return (tgt + 0.01 * hsum,
                jnp.sum(hsum, axis=1, keepdims=True))

    t_mxu = run_kernel("matmuls only (all-column tail)", mxu_tail)

    # 2b. Cost-scaling probe: run the production accumulation loop over
    #     only HALF the bins (not valid spline math — a cost probe). If
    #     epilogue cost is ~linear in K, the per-bin fan dominates.
    def half_bins(tgt, h, item):
        Kb, bound = item[3]
        y2, row2 = cp._spline_slab_epilogue(
            tgt, h[:, : (3 * (Kb // 2) - 1) * da], da, Kb // 2, bound,
            item[2])
        P = 3 * Kb - 1
        hsum = sum(h[:, p * da:(p + 1) * da]
                   for p in range((3 * (Kb // 2) - 1), P))
        return y2 + 1e-9 * hsum, row2

    t_half = run_kernel("half-bins epilogue (cost probe)", half_bins)

    # 3. Synthetic pure-VPU epilogue with the production op MIX and slab
    #    shapes: per bin 2 exp + 2 softplus-class + 2 cmp-class + 8 fma,
    #    plus the rational tail (2 log, 1 sqrt-class, 2 div) — dependent
    #    chains like the real accumulation loop.
    def synthetic(tgt, h, item):
        Kb = item[3][0]
        t = tgt
        a = jnp.zeros_like(tgt)
        for k in range(Kb):
            s1 = jnp.exp(h[:, k * da:(k + 1) * da] * 0.1)
            s2 = jnp.exp(h[:, (Kb + k) * da:(Kb + k + 1) * da] * 0.1)
            sp = jnp.log1p(jnp.exp(
                h[:, (2 * Kb + k % (Kb - 1)) * da:
                  (2 * Kb + k % (Kb - 1) + 1) * da]))
            m = (t * 0.5 + s1 * 0.01)
            ge = (t >= m).astype(t.dtype) * ((t < m + s2).astype(t.dtype))
            a = a + ge * s1 + ge * s2 + ge * m + ge * sp
            t = t + s1 * 0.01 + s2 * 0.01
        num = a * a * (t * t + 2.0 * a * t + a * a)
        den = a + t * a
        y = t + num / jnp.maximum(den, 0.1)
        lr = jnp.log(jnp.abs(num) + 1.0) - 2.0 * jnp.log(
            jnp.abs(den) + 1.0)
        return y, jnp.sum(lr, axis=1, keepdims=True)

    t_syn = run_kernel("synthetic same-op-mix epilogue", synthetic)

    e_real = t_full - t_mxu
    e_syn = t_syn - t_mxu
    e_half = t_half - t_mxu
    print(f"[spline-anatomy] decomposition: MXU {t_mxu*1e3:.2f} ms | "
          f"real epilogue {e_real*1e3:.2f} ms | synthetic same-mix "
          f"epilogue {e_syn*1e3:.2f} ms -> real/synthetic = "
          f"{e_real/max(e_syn, 1e-9):.2f} (1.0 = at the issue roof for "
          f"this op mix)")
    print(f"[spline-anatomy] half-bins epilogue {e_half*1e3:.2f} ms vs "
          f"K-linear prediction {0.5*e_real*1e3:.2f} ms — linearity in "
          f"K means the per-bin select fan dominates")
    # MXU utilisation of the matmul phase (lax.dot DEFAULT precision =
    # the MXU's native bf16x1 pass), for the roofline table.
    fps = bc.spline_flops_per_sample()
    mxu_frac = (bc.BATCH * fps / t_mxu) / 197e12
    print(f"[spline-anatomy] matmul phase alone: "
          f"{100*mxu_frac:.0f}% of the bf16 MXU roof "
          f"({fps/1e6:.2f} MFLOP/sample)")


if __name__ == "__main__":
    main()
