"""ChEES fused-vg route: 2D (chains x dim) wall-clock crossover sweep.

VERDICT r4 next #7: the auto-route boundary
``mcmc.chees.CHEES_VG_MIN_ELEMENTS`` rested on 3 coarse points
(0.70x/1.06x/1.29x at 128/2048/8192 chains x 50D). This sweep measures
the FULL ChEES run (warmup + sampling wall time, compile excluded) with
the fused route forced ON vs OFF over a chains x dim grid on a fusible
flow-pushforward target, and prints the ratio table the threshold must
match.

Method: both variants run the identical `chees_sample` entry; the route
is forced by overriding the module constant and clearing `_chees_impl`'s
jit cache between variants (the constant is read at trace time). Each
cell is best-of-3 timed runs after a warmup call.

Run: python benchmarks/bench_chees_sweep.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from enflows_tpu.utils.compilation_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp

import enflows_tpu as ef
from enflows_tpu.mcmc import chees, FlowPushforwardTarget

CHAINS = (128, 512, 2048, 8192)
DIMS = (2, 16, 50)
WARMUP, SAMPLES = 200, 200


def make_target(dim):
    v = lambda val: jnp.full((dim,), val, jnp.float32)
    chain = ef.compose(
        ef.Johnson(gamma=v(0.2), delta=v(5.0), xi=v(0.0), lam=v(5.0)),
        ef.ScaleShift(a=v(1.3), b=v(-0.2)),
        ef.invert(ef.CenterStretch(a=v(0.5), b=v(1.2), c=v(0.0))),
    )
    return FlowPushforwardTarget(chain)


def timed_run(target, dim, n_chains, key):
    def go():
        draws, _, stats = chees.chees_sample(
            target, key, dim=dim, num_chains=n_chains,
            num_warmup=WARMUP, num_samples=SAMPLES)
        jax.block_until_ready(draws)
        return draws

    go()                               # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        go()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    table = {}
    for dim in DIMS:
        target = make_target(dim)
        assert target.fused_kernel_available(dim)
        for n in CHAINS:
            chees.CHEES_VG_MIN_ELEMENTS = 1 << 62      # force OFF
            chees._chees_impl.clear_cache()
            t_std = timed_run(target, dim, n, key)
            chees.CHEES_VG_MIN_ELEMENTS = 0            # force ON
            chees._chees_impl.clear_cache()
            t_vg = timed_run(target, dim, n, key)
            r = t_std / t_vg
            table[f"d{dim}_c{n}"] = {
                "elements": n * dim,
                "t_std_s": round(t_std, 3), "t_vg_s": round(t_vg, 3),
                "vg_speedup": round(r, 2)}
            print(f"[chees-sweep] dim={dim:3d} chains={n:5d} "
                  f"(elems {n*dim:>6d}): std {t_std:6.2f}s | "
                  f"fused-vg {t_vg:6.2f}s -> {r:4.2f}x",
                  file=sys.stderr)
    print(json.dumps(table))


if __name__ == "__main__":
    main()
