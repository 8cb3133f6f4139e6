"""Packed-kernel vs jnp dispatch crossover sweep (BASELINE.md table).

Measures the packed fused Pallas kernel against XLA's own fusion of the
jnp path across event dims at a fixed total element count, with
slope-method device timing (see bench_roofline.py for why). The result
sets ``PACKED_WIN_MAX_DIM`` in ops/pallas/elementwise.py — the largest
dim at which the packed layout still beats XLA.

Run on the real chip: python benchmarks/bench_dispatch_sweep.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax

from enflows_tpu.ops.pallas.elementwise import (event_pad,
                                                fused_forward_and_ladj_packed,
                                                pad_packed)

DIMS = [2, 4, 8, 16, 32, 50, 64, 100, 128]
TOTAL_ELEMS = 1 << 23


def slope(body, x, lo=4, hi=24, repeats=3):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(v, k):
        return lax.fori_loop(0, k, lambda i, u: body(u), v).reshape(-1)[0]

    float(chain(x, hi))
    float(chain(x, lo))

    def best(k):
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chain(x, k))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(hi) - best(lo)) / (hi - lo)


def main():
    from __graft_entry__ import _flagship_flow
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    for d in DIMS:
        n = TOTAL_ELEMS // d
        flow = _flagship_flow(d)
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
        xp = jax.jit(lambda v: pad_packed(v.reshape(-1), d))(x)
        jax.block_until_ready(xp)
        # Both carries fold y AND ladj (as a scalar sum — forces the full
        # ladj computation with no relayout): with ladj dropped, XLA DCEs
        # the jnp path's logdet computation while the packed kernel always
        # computes it in-kernel — a biased crossover (ADVICE.md r2).
        def jnp_body(u, flow=flow):
            y, ladj = flow.forward_and_ladj(u)
            return y * 0.1 + 1e-12 * jnp.sum(ladj)

        def packed_body(u, flow=flow, d=d):
            y, ladj = fused_forward_and_ladj_packed(flow, u, d,
                                                    padded=True)
            return y * 0.1 + 1e-12 * jnp.sum(ladj)

        dt_j = slope(jnp_body, x)
        dt_p = slope(packed_body, xp)
        print(f"d={d:4d} dp={event_pad(d):3d} n={n}: "
              f"jnp {n/dt_j/1e6:8.0f}M/s  packed {n/dt_p/1e6:8.0f}M/s  "
              f"ratio {dt_j/dt_p:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
