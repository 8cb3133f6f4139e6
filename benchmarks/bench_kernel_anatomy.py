"""Anatomy of the packed fwd+logdet kernel (VERDICT r2 next #2).

Decomposes the headline kernel's 2.4 ms (16M x d=2, flagship 5-stage
chain) into its parts by timing variant kernels on the real chip:

  copy        HBM floor (same tiles, y = x)
  exp26       26 dependent exps/elem — the roofline model's predicted cost
  exp26i      26 INDEPENDENT exps/elem (13 chains of 2) — measures whether
              cross-op dependency chains, not slot count, set the rate
  opmix       the stage bodies' true op histogram without cross-stage
              dependencies (exp/log/div/select/abs in realistic ratio)
  stages      the real 5-stage chain, no Householder matmul, no ladj
              reduction (pure VPU stage cost)
  stages+hh   + the (128,128) block-diagonal HIGHEST-precision matmul
  full        + the ladj segment matmul (the shipping kernel body)

Run: python benchmarks/bench_kernel_anatomy.py
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
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024


def slope(body, x, lo=4, hi=24, repeats=4):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(v, k):
        return lax.fori_loop(0, k, lambda i, u: body(u),
                             v).reshape(-1)[0]

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


def pallas_map(kernel, x2d, extra=()):
    rows = x2d.shape[0]
    in_specs = [pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for e in extra:
        in_specs.append(pl.BlockSpec(e.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(rows // TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x2d, *extra)


def main():
    print(f"backend={jax.default_backend()}")
    n_rows = 1 << 17                 # 16.7M elements
    x = jax.random.normal(jax.random.PRNGKey(0), (n_rows, 128),
                          jnp.float32) * 0.3

    from __graft_entry__ import _flagship_flow
    from enflows_tpu.ops.pallas.elementwise import (
        _chain_static_and_params, _APPLY, _seg_matrix)
    from enflows_tpu.bijectors.householder import Householder

    flow = _flagship_flow(2)
    stage_types, nparams, flat_params = _chain_static_and_params(
        flow, 2, jnp.float32)
    seg = _seg_matrix(2, 2)

    # --- copy
    def k_copy(x_ref, y_ref):
        y_ref[:] = x_ref[:]

    # --- dependent exps
    def mk_exps(n):
        def k(x_ref, y_ref):
            t = x_ref[:]
            for _ in range(n):
                t = jnp.exp(-jnp.abs(t) * 0.1)
            y_ref[:] = t
        return k

    # --- independent exps: 13 chains of length 2 from the same input
    def k_exps_indep(x_ref, y_ref):
        t = x_ref[:]
        acc = t * 0.0
        for i in range(13):
            u = jnp.exp(-jnp.abs(t * (0.1 + 0.01 * i)))
            acc = acc + jnp.exp(-u * 0.1)
        y_ref[:] = acc

    # --- op-mix: per elem 11 exp, 13 log, 5 div, plus the cheap ops the
    # stage bodies use (abs/sign/max/select), no cross-stage deps.
    def k_opmix(x_ref, y_ref):
        t = x_ref[:]
        acc = t * 0.0
        for i in range(5):          # 5 blocks ~ (2exp,2-3log,1div,cheap)
            u = t * (0.3 + 0.1 * i)
            e = jnp.exp(-jnp.abs(u))
            l1 = jnp.log1p(e)
            l2 = jnp.log(jnp.abs(u) + jnp.sqrt(1.0 + u * u))
            d = jnp.where(u >= 0, 1.0, e) / (1.0 + e)
            acc = acc + jnp.maximum(l1, l2) + d + jnp.sign(u)
        e6 = jnp.exp(-jnp.abs(t))
        acc = acc + jnp.log1p(e6) + jnp.log(1.0 + e6 * e6) + \
            jnp.log(jnp.abs(acc) + 1.0)
        y_ref[:] = acc

    # --- real stage chain variants. seg (128, 64) rides as the LAST
    # extra input when used (pallas kernels may not capture constants).
    def mk_chain(with_hh, with_seg):
        def k(x_ref, *refs):
            y_ref = refs[-1]
            prefs = refs[:-1 - (1 if with_seg else 0)]
            seg_ref = refs[-2] if with_seg else None
            t = x_ref[:]
            acc = None
            i = 0
            for st, np_ in zip(stage_types, nparams):
                params = [prefs[i + j][:] for j in range(np_)]
                i += np_
                if st is Householder:
                    if with_hh:
                        t = jax.lax.dot(
                            t, params[0],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                    continue
                t, elem = _APPLY[st](t, *params)
                acc = elem if acc is None else acc + elem
            if with_seg:
                red = jax.lax.dot(
                    acc, seg_ref[:],
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                # fold back so output shape matches (cost negligible)
                t = t + red[:, :1] * 1e-12
            else:
                t = t + acc * 1e-12
            y_ref[:] = t
        return k

    seg_big = _seg_matrix(2, 2)      # (128, 64)

    variants = [
        ("copy", lambda u: pallas_map(k_copy, u) * 0.999),
        ("exp26", lambda u: pallas_map(mk_exps(26), u) * 0.999),
        ("exp26i", lambda u: pallas_map(k_exps_indep, u) * 0.01),
        ("opmix", lambda u: pallas_map(k_opmix, u) * 0.01),
        ("stages", lambda u: pallas_map(mk_chain(False, False), u,
                                        flat_params) * 0.03),
        ("stages+hh", lambda u: pallas_map(mk_chain(True, False), u,
                                           flat_params) * 0.03),
        ("full", lambda u: pallas_map(mk_chain(True, True), u,
                                      tuple(flat_params) + (seg_big,))
         * 0.03),
    ]
    for name, body in variants:
        dt = slope(body, x)
        print(f"{name:10s} {dt*1e3:7.3f} ms  "
              f"({x.size/dt/1e9:6.2f} G elem/s)", flush=True)


if __name__ == "__main__":
    main()
