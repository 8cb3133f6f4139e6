"""Fused bijector-chain kernel: whole-flow forward + ladj in one VMEM pass.

TPU-native replacement for the hot path of the reference's composed
`with_logabsdet_jacobian` recursion (SURVEY.md §3.2) — and the M5 milestone
kernel. One sweep over VMEM tiles applies EVERY stage of a flow chain and
accumulates the per-sample log-abs-det-Jacobian, with transcendental-sharing
rewrites the stage-at-a-time jnp path cannot express:

* center-contract: softplus/sigmoid pairs share exp(-|u|) (2 exps not 4);
* Johnson fwd: asinh and its ladj share sqrt(1+u^2);
* Johnson inv: sinh and logcosh share exp(-|v|) + one reciprocal;
* scale-shift: the constant ladj folds in as a pattern row;
* Householder chains: the reflections collapse to an orthogonal Q (d, d)
  outside the kernel, applied INSIDE the tile as one (128, 128)
  block-diagonal matmul on the MXU (64 samples of d=2 per lane row) —
  zero ladj, zero extra memory traffic.

LAYOUT IS THE WHOLE GAME. A (n, d) f32 array with small d is stored
tile-padded on TPU (minor dim padded to 128 lanes): for d=2 that is 64x
physical storage, and any relayout to a kernel-friendly shape costs
milliseconds of shuffle — measured 3.7 ms for a 1M x 2 batch, versus
0.055 ms for the kernel itself. The fused path therefore works on a
**packed** batch: the row-major flattened (n*d,) vector retiled as
(rows, 128), full lane utilization, no relayout anywhere. Keep batches
packed end-to-end (host numpy row-major -> flat device view is free) and
unpack only at API boundaries.

d | 128 runs fully dense. Other d <= 128 use the PADDED packed layout:
each event occupies ``event_pad(d)`` lanes (the next divisor of 128 —
d=50 -> 64 lanes at 78% utilization, d=100 -> 128 at 78%), pad lanes are
masked out of the ladj segment-matmul and the loss, and the pad/unpad
relayout is a differentiable jnp pad/slice that hot loops hoist outside
their scan (``pad_packed`` / ``padded=True``).

Per-dim parameters become (1, 128) lane-pattern rows (param[c % d]); the
per-sample ladj segment-reduction over runs of d lanes is one
(128, 128/d) 0/1 matmul per tile (HIGHEST precision — the MXU's native
bf16 multiply costs 1e-3 absolute ladj error otherwise).

Gradients: `jax.custom_vjp`. On TPU the backward is ALSO a fused Pallas
kernel (`_build_bwd_kernel`): the forward recomputes tile-resident and each
stage's adjoint is emitted by calling `jax.vjp` on the stage body at trace
time — identical math to the jnp reference by construction. On CPU (and as
a fallback) the backward differentiates a packed-layout jnp mirror
(`_packed_jnp_forward`).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...bijectors.base import Bijector, Chain
from ...bijectors.scale_shift import ScaleShift
from ...bijectors.center_stretch import CenterStretch, CenterContract
from ...bijectors.johnson import Johnson, JohnsonInv
from ...bijectors.householder import Householder, householder_matrix

_LOG2 = 0.6931471805599453
_LOG4 = 1.3862943611198906

ELEMENTWISE_KINDS = (ScaleShift, CenterStretch, CenterContract, Johnson,
                     JohnsonInv)
FUSIBLE_KINDS = ELEMENTWISE_KINDS + (Householder,)

# Largest event dim at which the packed kernel CLEARLY BEATS XLA's own
# fusion of the jnp path (measured on v5e, slope-method device timing, 8M
# elements, DCE-proof carries on both paths). After round 3 moved the
# custom_vjp boundary below parameter construction (pattern rows /
# block-diagonals become jit constants for concrete chains instead of
# per-iteration ops), the kernel wins at every dim up to 64
# (benchmarks/bench_dispatch_sweep.py + stability re-runs, 2026-08-21:
# d=2 6.04x, d=4 5.31x, d=8 2.44x, d=16 1.5-2.1x, d=32 1.7-1.8x,
# d=50 1.8-2.3x, d=64 1.7-3.9x; d=100 ~1.0x and d=128 run-to-run noisy
# 0.6-1.4x — parity, so the dispatch keeps the simpler jnp path there).
# Round 2's threshold of 8 was an artifact of the per-iteration
# param-prep overhead the restructure removed. Auto-dispatch
# (`fused_forward_and_ladj`, `optimize_whitening(use_fused=None)`) uses
# the kernel at or below this dim; the packed variant stays callable at
# any d <= 128.
PACKED_WIN_MAX_DIM = 64


# Largest event dim for the MULTIROW packed layout (d > 128: events span
# ceil(d/128) consecutive lane rows — VERDICT r3 next #8). Beyond this the
# per-event row count makes the tile math silly; use the jnp path.
MAX_MULTIROW_DIM = 2048


def event_pad(dim: int) -> int:
    """Lane stride per event in the packed layout.

    d <= 128: the smallest divisor of 128 that is >= dim (d | 128 -> d
    itself, fully dense rows; d=50 -> 64 lanes at 78% utilization), with
    pad lanes masked out of the ladj reduction and the loss.

    d > 128 (round 4): the MULTIROW layout — each event spans
    R = ceil(d/128) consecutive lane rows (stride R*128); elementwise
    stages are lane-position-only so the same kernels apply with (R, 128)
    pattern blocks, and the per-event ladj folds R masked row sums.
    Raises above MAX_MULTIROW_DIM."""
    for cand in (1, 2, 4, 8, 16, 32, 64, 128):
        if cand >= dim:
            return cand
    if dim <= MAX_MULTIROW_DIM:
        return -(-dim // 128) * 128
    raise ValueError(
        f"event dim {dim} > {MAX_MULTIROW_DIM}: beyond the multirow "
        "packed layout — use the jnp path")


def is_fusible_chain(chain: Bijector, dim: int, dtype=jnp.float32) -> bool:
    """Fused path: elementwise stages + Householder, d <= 128 (d | 128 runs
    dense; other d pad each event to the next divisor of 128 — see
    ``event_pad``), f32/bf16 (Mosaic has no f64 lowering — f64 falls back
    to the jnp path). d in (128, MAX_MULTIROW_DIM]: the MULTIROW layout,
    ELEMENTWISE stages only — a d > 128 Householder is a (d, d) MXU
    matmul where XLA's dense path is already at roof and the in-kernel
    block-diagonal trick no longer fits one lane row."""
    if dim > MAX_MULTIROW_DIM:
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    if jax.config.jax_enable_x64 and jax.default_backend() == "tpu":
        # x64 mode widens kernel index arithmetic to i64, which Mosaic
        # cannot legalize ("func.return (i32, i64)"); interpret mode on
        # CPU is unaffected.
        return False
    stages = chain.stages if isinstance(chain, Chain) else (chain,)
    kinds = ELEMENTWISE_KINDS if dim > 128 else FUSIBLE_KINDS
    return all(isinstance(s, kinds) for s in stages)


# ------------------------------------------------------------------
# Stage bodies (shared-transcendental forms; all lane-parallel).

def _softplus_from_e(u, e):
    # softplus(u) = max(u, 0) + log1p(exp(-|u|))
    return jnp.maximum(u, 0.0) + jnp.log1p(e)


def _sigmoid_from_e(u, e):
    # sigmoid(u) = where(u >= 0, 1, e) / (1 + e),  e = exp(-|u|)
    return jnp.where(u >= 0.0, 1.0, e) / (1.0 + e)


def _apply_scale_shift(t, a, b):
    return t * a + b, jnp.log(jnp.abs(a))


def _apply_center_contract(t, a, b, c):
    xu = t - c
    u1 = b * (xu - a)
    u2 = b * (xu + a)
    e1 = jnp.exp(-jnp.abs(u1))
    e2 = jnp.exp(-jnp.abs(u2))
    y = (_softplus_from_e(u1, e1) - _softplus_from_e(-u2, e2)) / b
    elem = jnp.log(_sigmoid_from_e(u1, e1) + _sigmoid_from_e(-u2, e2))
    return y, elem


def _apply_center_stretch(t, a, b, c):
    # Log-domain inverse (see bijectors.center_stretch), ladj at output —
    # round-3 single-exp derivation (VERDICT r2 next #2). From the
    # quadratic-root form, with em = exp(-|bt|):
    #
    #   log_s = |bt| + ab - log2 + log((1-em) + sqrt((1-em)^2
    #                                               + 4 e^{-2ab} em))
    #   y     = c + sign(t) * log_s / b
    #
    # (identical to the previous 2x-logaddexp chain, but every inner
    # exp/log collapses algebraically: e^{log1p(-em)} = 1-em and
    # e^{logaddexp(...)/2} = the sqrt — 1 exp + 1 log replace 5 exp +
    # 4 log, and the (1-em)+sqrt(...) argument is strictly positive so
    # the old m-clamp singularity guard is unnecessary). The ladj at the
    # output, elem = -log(sigmoid(w-ab) + sigmoid(-w-ab)) with
    # w = |b(y-c)| = log_s, reuses em through A*e^{-w} =
    # 2 em/((1-em)+sqrt(...)) — the e^{ab} factors cancel, so nothing
    # overflows for large ab and NO additional transcendental is spent
    # (the second sigmoid's e^{2ab} row factor is a (1,128) constant).
    ab = a * b
    m = jnp.abs(b * t)
    # Keep m away from 0: denom below is ~2(1-em) when the c1 row
    # underflows (ab > 44), and 1-em -> 0 at m = 0 would give log(0)
    # in that corner; 1e-6 is below f32 noise for the result.
    m = jnp.maximum(m, 1e-6)
    em = jnp.exp(-m)
    one_m = 1.0 - em
    c1 = 4.0 * jnp.exp(-2.0 * ab)            # (1,128) row constant
    r = jnp.sqrt(one_m * one_m + c1 * em)
    denom = one_m + r
    log_s = m + ab - _LOG2 + jnp.log(denom)
    y = c + jnp.sign(t) * log_s / b
    ae = 2.0 * em / denom                    # = e^{ab} * e^{-log_s}
    a2 = jnp.exp(2.0 * ab)                   # (1,128) row constant
    s_sum = 1.0 / (1.0 + ae) + ae / (ae + a2)
    elem = -jnp.log(s_sum)
    return y, elem


def _apply_johnson(t, gamma, delta, xi, lam):
    u = (t - xi) / lam
    s = jnp.sqrt(1.0 + u * u)
    asinh_u = jnp.sign(u) * jnp.log(jnp.abs(u) + s)
    y = gamma + delta * asinh_u
    elem = jnp.log(jnp.abs(delta / lam)) - jnp.log(s)
    return y, elem


def _apply_johnson_inv(t, gamma, delta, xi, lam):
    v = (t - gamma) / delta
    av = jnp.abs(v)
    ei = jnp.exp(-av)            # e^{-|v|}
    e = 1.0 / ei                 # e^{|v|}
    sinh_v = jnp.sign(v) * 0.5 * (e - ei)
    y = lam * sinh_v + xi
    logcosh = av + jnp.log1p(ei * ei) - _LOG2
    elem = jnp.log(jnp.abs(lam / delta)) + logcosh
    return y, elem


_APPLY = {
    ScaleShift: _apply_scale_shift,
    CenterContract: _apply_center_contract,
    CenterStretch: _apply_center_stretch,
    Johnson: _apply_johnson,
    JohnsonInv: _apply_johnson_inv,
}


def _stage_params(stage) -> tuple:
    if isinstance(stage, ScaleShift):
        return (stage.a, stage.b)
    if isinstance(stage, (CenterStretch, CenterContract)):
        return (stage.a, stage.b, stage.c)
    if isinstance(stage, Householder):
        return (stage.V,)
    return (stage.gamma, stage.delta, stage.xi, stage.lam)


def _pattern_rows(params: Sequence[jax.Array], dim: int, dtype,
                  dp: int | None = None):
    """Per-dim params (d,) or scalars -> lane-pattern blocks: (1, 128)
    rows for dp <= 128, (R, 128) blocks for the multirow layout (the
    kernel tiles them down the batch rows).

    Pure jnp gathers, so this is differentiable: grads w.r.t. a pattern row
    scatter-add back onto the original (d,) parameter. With ``dp > dim``
    (padded events) the pad lanes repeat param[dim-1] — any in-range value
    keeps the arithmetic finite there; their cotangents are exactly zero
    (pad lanes are masked out of the ladj reduction and the y/loss
    cotangents), so nothing spurious scatters back.
    """
    dp = dim if dp is None else dp
    if dp <= 128:
        idx = np.minimum(np.arange(128) % dp, dim - 1)
        shape = (1, 128)
    else:
        idx = np.minimum(np.arange(dp), dim - 1)
        shape = (dp // 128, 128)
    rows = []
    for p in params:
        p = jnp.asarray(p, dtype)
        if p.ndim == 0:
            p = jnp.full((dim,), p, dtype)
        rows.append(p[idx].reshape(shape))
    return rows


def _householder_blockdiag(stage: Householder, dim: int, dtype,
                           dp: int | None = None):
    """(128, 128) block-diagonal right-multiply matrix: per lane group of
    dp lanes, y_group[:dim] = x_group[:dim] @ Q^T (Q = product of
    reflections); pad lanes (dim <= lane%dp < dp) pass through as identity
    so their garbage stays finite and in-lane."""
    dp = dim if dp is None else dp
    V = stage.V
    if V.ndim == 1:
        V = V[None, :]
    Q = householder_matrix(V, dtype=jnp.float32)     # (d, d)
    groups = (np.arange(128) // dp)
    same_group = groups[:, None] == groups[None, :]
    lane = np.arange(128) % dp
    valid = lane < dim
    lane_c = np.minimum(lane, dim - 1)
    QT_big = Q.T[np.ix_(lane_c, lane_c)]             # (128,128) tiled Q^T
    mask = jnp.asarray(same_group & valid[:, None] & valid[None, :],
                       jnp.float32)
    eye_pad = jnp.asarray(np.diag((~valid).astype(np.float32)))
    return (QT_big * mask + eye_pad).astype(dtype)


def _expand_pattern(p, T):
    """Tile an (R, 128) multirow pattern block down a (T, 128) tile;
    (1, 128) rows broadcast as-is."""
    if p.shape[0] == 1 or p.shape[0] == T:
        return p
    return jnp.tile(p, (T // p.shape[0], 1))


def _multirow_mask(dim, dp, T):
    """(T, 128) validity mask for the multirow layout: lane position
    (row % R)*128 + col within the event is real iff < dim."""
    R = dp // 128
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
    return (((rows % R) * 128 + cols) < dim).astype(jnp.float32)


def _build_kernel(stage_types, nparams_per_stage, dim, dp):
    multirow = dp > 128

    def kernel(x_ref, seg_ref, *refs):
        y_ref, ladj_ref = refs[-2], refs[-1]
        prefs = refs[:-2]
        # Compute in f32 regardless of storage dtype: bf16 only halves the
        # HBM traffic; the VPU transcendentals run f32 either way, and
        # storing f32 intermediates to a bf16 ref is invalid on hardware.
        t = x_ref[:].astype(jnp.float32)
        T = t.shape[0]
        acc = None
        i = 0
        for st, np_ in zip(stage_types, nparams_per_stage):
            params = [prefs[i + j][:].astype(jnp.float32)
                      for j in range(np_)]
            i += np_
            if st is Householder:
                t = jax.lax.dot(t, params[0],
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                continue             # orthogonal: ladj contribution is 0
            if multirow:
                params = [_expand_pattern(p, T) for p in params]
            t, elem = _APPLY[st](t, *params)
            elem = jnp.broadcast_to(elem, t.shape)
            acc = elem if acc is None else acc + elem
        y_ref[:] = t.astype(y_ref.dtype)
        if acc is None:
            ladj_ref[:] = jnp.zeros_like(ladj_ref)
        elif multirow:
            # Masked per-ROW sums; the host folds each event's R rows
            # (cheap: one (n, R) sum on a tiny array).
            acc = acc * _multirow_mask(dim, dp, T)
            ladj_ref[:] = jnp.sum(acc, axis=1,
                                  keepdims=True).astype(ladj_ref.dtype)
        else:
            # Per-sample segment reduction over runs of d lanes: one small
            # (128, 128/d) 0/1 matmul (HIGHEST precision, see module doc).
            ladj_ref[:] = jax.lax.dot(
                acc, seg_ref[:].astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32).astype(ladj_ref.dtype)

    return kernel


def _chain_static_and_params(chain: Bijector, dim: int, dtype,
                             dp: int | None = None):
    dp = dim if dp is None else dp
    stages = chain.stages if isinstance(chain, Chain) else (chain,)
    # When the chain's parameters are CONCRETE (inference / a constant
    # flow closed over by a jitted loop body), evaluate the pattern-row
    # gathers and the Householder block-diagonal product at TRACE time so
    # they become jit constants. Without this, the ~30 small prep ops land
    # inside the caller's loop body and XLA does not hoist them across the
    # pallas_call: measured 0.5 ms/iteration on the 16M-sample headline —
    # 30% of the total (bench_kernel_anatomy.py, round 3). Tracer params
    # (training) trace through unchanged inside the same context.
    stage_types, nparams, flat_params = [], [], []
    with jax.ensure_compile_time_eval():
        for s in stages:
            stage_types.append(type(s))
            if isinstance(s, Householder):
                nparams.append(1)
                flat_params.append(
                    _householder_blockdiag(s, dim, dtype, dp))
            else:
                ps = _stage_params(s)
                nparams.append(len(ps))
                flat_params.extend(_pattern_rows(ps, dim, dtype, dp))
    return tuple(stage_types), tuple(nparams), tuple(flat_params)


def _seg_matrix(dim: int, dp: int):
    """(128, spd) 0/1 ladj segment-reduction matrix: lane l contributes to
    sample slot l // dp iff it is a real event lane (l % dp < dim)."""
    spd = 128 // dp
    lanes = np.arange(128)
    seg = ((lanes // dp)[:, None] == np.arange(spd)[None, :]) \
        & ((lanes % dp) < dim)[:, None]
    return jnp.asarray(seg, jnp.float32)


def pad_packed(x_flat: jax.Array, dim: int) -> jax.Array:
    """Tight packed (n*dim,) -> padded packed (n*dp,) (dp = event_pad(dim)).

    Identity when d | 128. Differentiable (pad/slice), so pad-lane
    cotangents vanish automatically through AD.
    """
    dp = event_pad(dim)
    if dp == dim:
        return x_flat
    n = x_flat.shape[0] // dim
    x = x_flat.reshape(n, dim)
    # Pad with ones (not zeros): stage gradients can be singular at 0 and
    # pad lanes still flow through every stage body.
    return jnp.pad(x, ((0, 0), (0, dp - dim)),
                   constant_values=1.0).reshape(-1)


def unpad_packed(y_flat: jax.Array, dim: int) -> jax.Array:
    """Inverse of pad_packed: (n*dp,) -> (n*dim,)."""
    dp = event_pad(dim)
    if dp == dim:
        return y_flat
    n = y_flat.shape[0] // dp
    return y_flat.reshape(n, dp)[:, :dim].reshape(-1)


# Rows (of 128 lanes) per grid step in the packed kernels, swept on v5e
# (flagship 5-stage chain, 16M batch): forward 5.15->5.45 G evals/s going
# 256->1024; the full backward holds every stage's input tile plus gy/gx
# so 1024 blows the 16 MB VMEM budget — 512 is its sweet spot (2.46->2.56
# G samples/s). The single-pass negll kernel also holds all stage inputs:
# at 1024 rows it sat ~12% UNDER the scoped-VMEM limit for the flagship
# chain but ~12% OVER for an equal-length chain with a different stage
# order (caught by tests_tpu on real hardware, round 4 — CPU interpret
# mode enforces no VMEM budget), and the 1024-row gain was only 4.6%
# (2.58->2.70 G), so it now uses 512 everywhere.
_TILE_ROWS = 1024
_TILE_ROWS_NEGLL = 512
_TILE_ROWS_BWD = 512


@functools.partial(jax.jit, static_argnums=(0,))
def _fused_packed_impl(static, x_flat, flat_params):
    """x_flat: (n*dp,) PADDED packed batch. Returns (y_flat (n*dp,),
    ladj (n,)); dp = event lane stride (== dim when d | 128)."""
    stage_types, nparams, dim, dp, tile_m = (static + (_TILE_ROWS,))[:5]
    dtype = x_flat.dtype
    multirow = dp > 128
    R = dp // 128 if multirow else 1
    spd = 1 if multirow else 128 // dp       # ladj slots per lane row
    total = x_flat.shape[0]
    n = total // dp
    rows = -(-total // 128)
    # Don't pad small batches up to a huge tile: shrink the tile to the
    # 8-sublane-aligned row count when the batch is smaller than one tile.
    # Multirow: the tile must hold whole events (R | tile_m).
    align = (8 * R // np.gcd(8, R)) if multirow else 8   # lcm(8, R)
    tile_m = min(tile_m, -(-rows // align) * align)
    tile_m = -(-tile_m // align) * align
    rows_padded = -(-rows // tile_m) * tile_m
    pad = rows_padded * 128 - total
    # Pad with ones, not zeros: several stage gradients are singular at
    # exactly 0 and padded lanes feed the (discarded) ladj reduction.
    flat = (jnp.pad(x_flat, (0, pad), constant_values=1.0)
            if pad else x_flat)
    xt = flat.reshape(rows_padded, 128)

    # Multirow masks in-kernel via iota; the seg matmul is the <= 128 path.
    seg = (jnp.zeros((128, 1), jnp.float32) if multirow
           else _seg_matrix(dim, dp))

    grid = (rows_padded // tile_m,)
    in_specs = [
        pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(seg.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = (
        pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, spd), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    )
    kernel = _build_kernel(stage_types, nparams, dim, dp)
    y_t, ladj_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((rows_padded, 128), dtype),
            jax.ShapeDtypeStruct((rows_padded, spd), jnp.float32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(xt, seg, *flat_params)

    y_flat = y_t.reshape(-1)[:total]
    if multirow:
        # Fold each event's R masked row sums (tiny (n, R) reduction).
        ladj = ladj_t.reshape(-1)[: n * R].reshape(n, R).sum(-1) \
            .astype(dtype)
    else:
        ladj = ladj_t.reshape(-1)[:n].astype(dtype)
    return y_flat, ladj


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_packed_params_op(static, x_flat, flat_params):
    """static = (stage_types, nparams, dim, dp); x_flat is PADDED packed
    (n*dp,); flat_params are the pattern rows / block-diagonals from
    ``_chain_static_and_params``.

    The custom_vjp boundary sits BELOW the parameter construction on
    purpose: the construction is plain differentiable jnp at the call
    site, so (a) AD maps the kernel's pattern-row cotangents back onto
    chain leaves with no hand-written plumbing, and (b) when the chain is
    concrete (inference loops), ``ensure_compile_time_eval`` in
    ``_chain_static_and_params`` turns the ~30 prep ops into jit
    constants instead of per-iteration work — measured 0.5 ms/iteration
    on the 16M headline before this split (bench_kernel_anatomy.py).
    """
    return _fused_packed_impl(static, x_flat, flat_params)


def _fused_packed_op(dimdp, chain, x_flat):
    """Compatibility wrapper: (dim, dp) + chain -> fused (y, ladj)."""
    dim, dp = dimdp
    static_types, nparams, flat_params = _chain_static_and_params(
        chain, dim, x_flat.dtype, dp)
    return _fused_packed_params_op((static_types, nparams, dim, dp),
                                   x_flat, flat_params)


def _build_bwd_kernel(stage_types, nparams_per_stage, dim, dp):
    """Fused backward: one tile pass computes gx AND all param grads.

    The forward is recomputed tile-resident (inputs of every stage stay in
    VMEM/registers); each stage's backward is emitted by calling `jax.vjp`
    on the stage body AT TRACE TIME — the AD-generated ops compile into the
    kernel like any others, so the math is identical to the jnp reference
    by construction (no hand-derived adjoints to get wrong).

    Per-tile param grads: non-Householder params enter as (1, 128) pattern
    rows, so their vjp comes back already row-reduced; Householder stages
    yield a (128, 128) block-diagonal cotangent via the matmul vjp. Each
    grid step writes its partials to its own output slot; the host sums
    over tiles and pulls the grads back onto chain leaves by vjp-ing the
    pattern-row construction.
    """

    multirow = dp > 128

    def kernel(x_ref, segT_ref, gy_ref, gladj_ref, *refs):
        nstages = len(stage_types)
        n_params_total = sum(nparams_per_stage)
        prefs = refs[:n_params_total]
        gx_ref = refs[n_params_total]
        pgrad_refs = refs[n_params_total + 1:]

        # Forward recompute, storing each stage's input tile.
        # f32 internal compute regardless of storage dtype (see
        # _build_kernel); cotangents likewise.
        t = x_ref[:].astype(jnp.float32)
        T = t.shape[0]
        inputs = []
        i = 0
        all_params = []
        for st, np_ in zip(stage_types, nparams_per_stage):
            params = [prefs[i + j][:].astype(jnp.float32)
                      for j in range(np_)]
            all_params.append(params)
            i += np_
            inputs.append(t)
            if st is Householder:
                t = jax.lax.dot(t, params[0],
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
            else:
                ps = [_expand_pattern(p, T) for p in params] \
                    if multirow else params
                t, _ = _APPLY[st](t, *ps)

        if multirow:
            # gladj arrives per ROW (each event's cotangent repeated R
            # times); mask selects the real lanes of each row position.
            ce = gladj_ref[:].astype(jnp.float32) \
                * _multirow_mask(dim, dp, T)
        else:
            # Ladj cotangent per element: (tile, spd) @ (spd, 128).
            ce = jax.lax.dot(gladj_ref[:].astype(jnp.float32),
                             segT_ref[:].astype(jnp.float32),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        cy = gy_ref[:].astype(jnp.float32)

        # Backward sweep; vjp at trace time emits stage adjoints.
        pg_out = [None] * len(pgrad_refs)
        pidx = n_params_total
        for k in range(nstages - 1, -1, -1):
            st = stage_types[k]
            np_ = nparams_per_stage[k]
            pidx -= np_
            t_in = inputs[k]
            params = all_params[k]
            if st is Householder:
                def f_h(t, B):
                    return jax.lax.dot(
                        t, B, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)

                _, vjp = jax.vjp(f_h, t_in, params[0])
                ct, cB = vjp(cy)
                pg_out[pidx] = cB
            else:
                def f_e(t, *ps):
                    # Multirow pattern blocks tile INSIDE the
                    # differentiated fn, so their cotangents come back
                    # already folded to (R, 128).
                    if multirow:
                        ps = [_expand_pattern(p, t.shape[0]) for p in ps]
                    y, e = _APPLY[st](t, *ps)
                    return y, jnp.broadcast_to(e, t.shape)

                _, vjp = jax.vjp(f_e, t_in, *params)
                grads = vjp((cy, ce))
                ct = grads[0]
                for j in range(np_):
                    pg_out[pidx + j] = grads[1 + j]
            cy = ct

        gx_ref[:] = cy.astype(gx_ref.dtype)
        for ref, val in zip(pgrad_refs, pg_out):
            ref[:] = val.astype(ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,))
def _fused_packed_bwd_impl(static, x_flat, flat_params, gy_flat, gladj):
    """Pallas fused backward. Returns (gx_flat, tuple_of_pattern_grads).
    Padded packed layout: gy_flat must carry ZERO on pad lanes (guaranteed
    when the pad/unpad wrappers are jnp pad/slice ops — AD zeroes them)."""
    stage_types, nparams, dim, dp, tile_m = \
        (static + (_TILE_ROWS_BWD,))[:5]
    dtype = x_flat.dtype
    multirow = dp > 128
    R = dp // 128 if multirow else 1
    spd = 1 if multirow else 128 // dp
    total = x_flat.shape[0]
    n = total // dp
    rows = -(-total // 128)
    # Don't pad small batches up to a huge tile: shrink the tile to the
    # 8-sublane-aligned row count when the batch is smaller than one tile.
    # Multirow: whole events per tile (R | tile_m).
    align = (8 * R // np.gcd(8, R)) if multirow else 8   # lcm(8, R)
    tile_m = min(tile_m, -(-rows // align) * align)
    tile_m = -(-tile_m // align) * align
    rows_padded = -(-rows // tile_m) * tile_m
    num_tiles = rows_padded // tile_m

    pad = rows_padded * 128 - total
    # Ones-padding for x (see forward); ZERO cotangent padding so padded
    # lanes contribute nothing to parameter gradients.
    xt = (jnp.pad(x_flat, (0, pad), constant_values=1.0) if pad else x_flat
          ).reshape(rows_padded, 128)
    gyt = (jnp.pad(gy_flat, (0, pad)) if pad else gy_flat
           ).reshape(rows_padded, 128)
    if multirow:
        # Per-row event cotangents: each event's gladj repeated R times.
        gl = jnp.pad(jnp.repeat(gladj.astype(jnp.float32), R),
                     (0, rows_padded - n * R)).reshape(rows_padded, 1)
        segT = jnp.zeros((1, 128), jnp.float32)    # unused in-kernel
    else:
        gl = jnp.pad(gladj.astype(jnp.float32),
                     (0, rows_padded * spd - n)).reshape(rows_padded, spd)
        segT = _seg_matrix(dim, dp).T

    in_specs = [
        pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(segT.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, spd), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((rows_padded, 128), dtype)]
    out_specs = [pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for p in flat_params:
        out_shapes.append(
            jax.ShapeDtypeStruct((num_tiles,) + p.shape, jnp.float32))
        out_specs.append(
            pl.BlockSpec((1,) + p.shape,
                         lambda i: (i,) + (0,) * len(p.shape),
                         memory_space=pltpu.VMEM))

    kernel = _build_bwd_kernel(stage_types, nparams, dim, dp)

    # Kernel writes (1, *p.shape) blocks; wrap to match by reshaping refs —
    # pallas delivers the block with the leading 1, so write val[None].
    def kernel_wrapped(x_ref, segT_ref, gy_ref, gladj_ref, *refs):
        npar = len(flat_params)
        prefs = refs[:npar]
        gx_ref = refs[npar]
        praw = refs[npar + 1:]

        class _W:
            def __init__(self, ref):
                self.ref = ref

            @property
            def dtype(self):
                return self.ref.dtype

            def __setitem__(self, idx, val):
                self.ref[0] = val

        wrapped = tuple(_W(r) for r in praw)
        # Reuse the main kernel body with wrapped param-grad refs.
        kernel(x_ref, segT_ref, gy_ref, gladj_ref, *prefs, gx_ref,
               *wrapped)

    out = pl.pallas_call(
        kernel_wrapped,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=jax.default_backend() == "cpu",
    )(xt, segT, gyt, gl, *flat_params)

    gx = out[0].reshape(-1)[:total]
    pattern_grads = tuple(jnp.sum(o, axis=0) for o in out[1:])
    return gx, pattern_grads


_LOG_2PI = 1.8378770664093453


def _build_negll_grad_kernel(stage_types, nparams_per_stage, dim, dp,
                             total, tile_m):
    """ONE tile pass = whitening loss partials + all parameter gradients.

    The negll objective's output cotangents are analytic (cy = y/n,
    ce = -1/n), so no standalone forward, no gy/gladj inputs, and no y/gx
    writes are needed: per tile this computes the masked loss partial
    (sum of logpdf + elem-ladj over real elements) and immediately runs the
    stage-adjoint sweep for parameter grads. Roughly halves train-step
    HBM traffic and removes the redundant forward of value_and_grad.
    """

    def kernel(x_ref, *refs):
        n_params_total = sum(nparams_per_stage)
        prefs = refs[:n_params_total]
        loss_ref = refs[n_params_total]
        pgrad_refs = refs[n_params_total + 1:]

        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile_m, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_m, 128), 1)
        flat_idx = (i * tile_m + rows) * 128 + cols
        # Real elements only: inside the batch AND on a non-pad event lane.
        # Real elements only: inside the batch AND on a real event lane
        # (flat_idx % dp covers both the <= 128 padded-event layout and
        # the multirow layout, where events span dp = R*128 elements).
        emask = ((flat_idx < total)
                 & (flat_idx % dp < dim)).astype(jnp.float32)
        multirow = dp > 128

        # Forward, storing stage inputs tile-resident (f32 internal
        # compute regardless of storage dtype, see _build_kernel).
        t = x_ref[:].astype(jnp.float32)
        inputs, all_params = [], []
        acc = None
        pi = 0
        for st, np_ in zip(stage_types, nparams_per_stage):
            params = [prefs[pi + j][:].astype(jnp.float32)
                      for j in range(np_)]
            all_params.append(params)
            pi += np_
            inputs.append(t)
            if st is Householder:
                t = jax.lax.dot(t, params[0],
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
            else:
                ps = [_expand_pattern(p, tile_m) for p in params] \
                    if multirow else params
                t, elem = _APPLY[st](t, *ps)
                elem = jnp.broadcast_to(elem, t.shape)
                acc = elem if acc is None else acc + elem

        logpdf = -(t * t + _LOG_2PI) * 0.5
        tot = logpdf if acc is None else logpdf + acc
        loss_ref[0] = jnp.sum(emask * tot, axis=0,
                              keepdims=True).astype(loss_ref.dtype)

        # Backward with the analytic negll cotangents (unscaled by 1/n —
        # the host divides; signs: negll = -(sum)/n so c_y = +y/n etc.
        # folded as c_y = -dlogpdf/dy = y, c_e = -1, scaled outside).
        cy = emask * t
        ce = -emask

        pg_out = [None] * len(pgrad_refs)
        pidx = sum(nparams_per_stage)
        for k in range(len(stage_types) - 1, -1, -1):
            st = stage_types[k]
            np_ = nparams_per_stage[k]
            pidx -= np_
            t_in = inputs[k]
            params = all_params[k]
            if st is Householder:
                def f_h(tt, B):
                    return jax.lax.dot(
                        tt, B, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)

                _, vjp = jax.vjp(f_h, t_in, params[0])
                ct, cB = vjp(cy)
                pg_out[pidx] = cB
            else:
                def f_e(tt, *ps):
                    # Multirow pattern blocks tile inside the
                    # differentiated fn -> cotangents fold to (R, 128).
                    if multirow:
                        ps = [_expand_pattern(p, tt.shape[0]) for p in ps]
                    y, e = _APPLY[st](tt, *ps)
                    return y, jnp.broadcast_to(e, tt.shape)

                _, vjp = jax.vjp(f_e, t_in, *params)
                grads = vjp((cy, ce))
                ct = grads[0]
                for j in range(np_):
                    pg_out[pidx + j] = grads[1 + j]
            cy = ct

        for ref, val in zip(pgrad_refs, pg_out):
            ref[0] = val.astype(ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,))
def _fused_negll_grad_impl(static, x_flat, flat_params):
    stage_types, nparams, dim, dp, tile_m = \
        (static + (_TILE_ROWS_NEGLL,))[:5]
    dtype = x_flat.dtype
    total = x_flat.shape[0]
    n = total // dp
    rows = -(-total // 128)
    # Don't pad small batches up to a huge tile: shrink the tile to the
    # 8-sublane-aligned row count when the batch is smaller than one tile.
    # Multirow pattern blocks tile down the rows, so R | tile_m.
    R = dp // 128 if dp > 128 else 1
    align = 8 * R // np.gcd(8, R)                        # lcm(8, R)
    tile_m = min(tile_m, -(-rows // align) * align)
    tile_m = -(-tile_m // align) * align
    rows_padded = -(-rows // tile_m) * tile_m
    num_tiles = rows_padded // tile_m
    pad = rows_padded * 128 - total
    xt = (jnp.pad(x_flat, (0, pad), constant_values=1.0)
          if pad else x_flat).reshape(rows_padded, 128)

    in_specs = [pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    # Leading singleton on every per-tile output: Mosaic requires the last
    # two block dims to divide (8, 128) or equal the array dims, so blocks
    # are (1, *shape) over (num_tiles, *shape) arrays.
    out_shapes = [jax.ShapeDtypeStruct((num_tiles, 1, 128), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    for p in flat_params:
        out_shapes.append(
            jax.ShapeDtypeStruct((num_tiles,) + p.shape, jnp.float32))
        out_specs.append(
            pl.BlockSpec((1,) + p.shape,
                         lambda i: (i,) + (0,) * len(p.shape),
                         memory_space=pltpu.VMEM))

    kernel = _build_negll_grad_kernel(stage_types, nparams, dim, dp,
                                      total, tile_m)
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=jax.default_backend() == "cpu",
    )(xt, *flat_params)

    inv_n = 1.0 / n
    negll = (-jnp.sum(out[0]) * inv_n).astype(dtype)
    pattern_grads = tuple(jnp.sum(o, axis=0) * inv_n for o in out[1:])
    return negll, pattern_grads


def fused_negll_value_and_grad(chain: Bijector, x_flat: jax.Array,
                               dim: int, *, padded: bool = False):
    """(negll, d negll/d chain) in a single fused kernel pass.

    The packed fast path for the whitening train step; falls back to
    value_and_grad over the packed loss when the chain is unsupported.
    ``padded=True`` declares x_flat already in the padded packed layout
    (n * event_pad(dim),) — pre-pad once outside the train scan via
    ``pad_packed`` so the per-step relayout cost vanishes for d !| 128.
    """
    if not is_fusible_chain(chain, dim, x_flat.dtype) or \
            jax.default_backend() not in ("tpu", "cpu"):
        assert not padded, "fallback path expects tight packing"
        from ...train.whitening import mvnormal_negll_packed
        return jax.value_and_grad(
            lambda c: mvnormal_negll_packed(c, x_flat, dim))(chain)
    dp = event_pad(dim)
    if not padded:
        x_flat = pad_packed(x_flat, dim)
    static_types, nparams, flat_params = _chain_static_and_params(
        chain, dim, x_flat.dtype, dp)
    with jax.named_scope("enflows.pallas.fused_negll_grad"):
        negll, pattern_grads = _fused_negll_grad_impl(
            (static_types, nparams, dim, dp), x_flat, flat_params)
    _, vjp_params = jax.vjp(
        lambda c: _chain_static_and_params(c, dim, x_flat.dtype, dp)[2],
        chain)
    gc, = vjp_params(tuple(
        pg.astype(fp.dtype)
        for pg, fp in zip(pattern_grads, flat_params)))
    return negll, gc


def _packed_jnp_forward(stage_types, nparams, dim, dp, x_flat, flat_params):
    """Pure-jnp mirror of the kernel body on the (padded) PACKED layout.

    Exists for the backward pass: differentiating this gives XLA a fully
    lane-utilized (rows, 128) computation — ~4x faster than AD through the
    (n, d) standard-layout chain for small d, with identical math.
    """
    total = x_flat.shape[0]
    n = total // dp
    rows = -(-total // 128)
    pad = rows * 128 - total
    flat = jnp.pad(x_flat, (0, pad), constant_values=1.0) if pad else x_flat
    t = flat.reshape(rows, 128)
    acc = None
    i = 0
    for st, np_ in zip(stage_types, nparams):
        params = [flat_params[i + j] for j in range(np_)]
        i += np_
        if st is Householder:
            t = jax.lax.dot(t, params[0],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            continue
        if dp > 128:
            params = [jnp.tile(p, (rows // p.shape[0], 1))
                      if p.shape[0] > 1 else p for p in params]
        t, elem = _APPLY[st](t, *params)
        elem = jnp.broadcast_to(elem, t.shape)
        acc = elem if acc is None else acc + elem
    y_flat = t.reshape(-1)[:total]
    if acc is None:
        ladj = jnp.zeros((n,), x_flat.dtype)
    else:
        # Per-event fold works for both layouts: events are contiguous
        # runs of dp flattened elements (rows*128 is divisible by dp).
        ladj = acc.reshape(-1, dp)[:, :dim] \
            .sum(-1)[:n].astype(x_flat.dtype)
    return y_flat, ladj


def _fused_packed_fwd(static, x_flat, flat_params):
    return (_fused_packed_params_op(static, x_flat, flat_params),
            (x_flat, flat_params))


# When True (TPU default), the backward also runs as a fused Pallas kernel;
# on CPU the packed-jnp AD path is used (interpret-mode kernels are slow).
# Set to "force" to use the kernel on CPU too (interpret mode, for tests).
_PALLAS_BACKWARD = True


def _fused_packed_bwd(static, res, g):
    stage_types, nparams, dim, dp = static
    x_flat, flat_params = res
    gy_flat, gladj = g

    if _PALLAS_BACKWARD == "force" or (
            _PALLAS_BACKWARD and jax.default_backend() == "tpu"):
        gx, pattern_grads = _fused_packed_bwd_impl(
            static, x_flat, flat_params, gy_flat, gladj)
        return gx.astype(x_flat.dtype), tuple(
            pg.astype(fp.dtype)
            for pg, fp in zip(pattern_grads, flat_params))

    def ref(xf, fps):
        return _packed_jnp_forward(stage_types, nparams, dim, dp, xf,
                                   fps)

    _, vjp = jax.vjp(ref, x_flat, flat_params)
    gx, gfp = vjp(g)
    return gx, gfp


_fused_packed_params_op.defvjp(_fused_packed_fwd, _fused_packed_bwd)


def fused_forward_and_ladj_packed(chain: Bijector, x_flat: jax.Array,
                                  dim: int, *, padded: bool = False):
    """Fused (y_flat, ladj) on a PACKED batch: x_flat is the row-major
    flattened (n, dim) batch. The fast path — no layout shuffles when
    d | 128; other d <= 128 pad each event to ``event_pad(dim)`` lanes
    (pass ``padded=True`` with pre-padded input to hoist that cost out of
    hot loops; output y is then returned in the padded layout too)."""
    if not is_fusible_chain(chain, dim, x_flat.dtype):
        assert not padded
        y, ladj = chain.forward_and_ladj(x_flat.reshape(-1, dim))
        return y.reshape(-1), ladj
    dp = event_pad(dim)
    with jax.named_scope("enflows.pallas.fused_fwd_ladj_packed"):
        if padded or dp == dim:
            return _fused_packed_op((dim, dp), chain, x_flat)
        y_pad, ladj = _fused_packed_op((dim, dp), chain,
                                       pad_packed(x_flat, dim))
        return unpad_packed(y_pad, dim), ladj


# The standard-layout "rowwise" kernel ((TILE_N, d) tiles) was removed in
# round 4 (VERDICT r3 next #6): it LOST at its only target shape (0.59x vs
# jnp at d=50, BASELINE.md crossover section) because a d-lane minor dim
# forces Mosaic into padded sublane layouts that forgo everything the
# packed layout wins. Coverage is: packed kernel for d <= 128 (padded
# events), jnp/XLA beyond.


# One-shot standard-layout dispatch pays a physical relayout per call and
# measures 0.34-0.69x vs jnp at EVERY dim (round 3, BASELINE.md crossover
# caveat) — so the public convenience entry defaults to the jnp path, and
# PACKED_WIN_MAX_DIM governs only packed-layout hot-loop dispatch
# (optimize_whitening, packed callers). ADVICE r3. force_packed=True
# exercises the kernel through this entry regardless (tests;
# relayout-free callers).
ONESHOT_PACKED_MAX_DIM = 0


def fused_forward_and_ladj(chain: Bijector, x: jax.Array,
                           force_packed: bool = False):
    """Fused (y, per-sample ladj) for a standard-layout (n, d) batch.

    PERFORMANCE CAVEAT (measured round 3): a one-shot standard-layout
    call pays a physical relayout that costs more than the kernel saves
    (0.34-0.69x vs jnp at every dim), so this entry dispatches to the
    plain jnp path by default (``ONESHOT_PACKED_MAX_DIM = 0``). The
    packed kernel's 1.5-6x wins require the packed layout end-to-end:
    hot loops hoist ``pad_packed`` outside and call
    ``fused_forward_and_ladj_packed(..., padded=True)`` (as
    ``optimize_whitening`` does). ``force_packed=True`` routes through
    the packed kernel anyway (correctness surface / packed-resident
    callers).
    """
    if x.ndim != 2:
        return chain.forward_and_ladj(x)
    n, dim = x.shape
    packed_ok = dim <= (PACKED_WIN_MAX_DIM if force_packed
                        else ONESHOT_PACKED_MAX_DIM)
    if packed_ok and is_fusible_chain(chain, dim, x.dtype):
        dp = event_pad(dim)
        with jax.named_scope("enflows.pallas.fused_fwd_ladj_packed"):
            if dp == dim:
                y_flat, ladj = _fused_packed_op((dim, dp), chain,
                                                x.reshape(-1))
                return y_flat.reshape(n, dim), ladj
            x_pad = jnp.pad(x, ((0, 0), (0, dp - dim)),
                            constant_values=1.0).reshape(-1)
            y_pad, ladj = _fused_packed_op((dim, dp), chain, x_pad)
            return y_pad.reshape(n, dp)[:, :dim], ladj
    return chain.forward_and_ladj(x)
