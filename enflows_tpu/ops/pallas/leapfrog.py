"""Fused leapfrog+log-prob Pallas kernel for flow-preconditioned HMC.

SURVEY.md §7 M5 ("fused leapfrog+logprob where profitable") and the
optimization candidate named by the round-1 roofline review: when the
target is a flow-preconditioned standard normal — the framework's core
sampling configuration (mcmc.logdensity.flow_preconditioned over a fusible
chain f) — the log-density is

    logp(q) = -||f(q)||^2 / 2 + ladj_f(q)      (+ const)

and one leapfrog step needs grad logp: a forward sweep through the chain
followed by the adjoint sweep with analytic output cotangents
(cy = -f(q), ce = +1) — exactly the single-pass structure of the fused
negll kernel (elementwise.py), minus the parameter gradients.

The XLA path (lax.scan over leapfrog steps) round-trips (q, p, grad)
through HBM every step. This kernel keeps a (TILE, 128) block of chains
resident in VMEM for the ENTIRE L-step trajectory: HBM traffic drops from
O(L * state) to O(state), and the L gradient evaluations run back-to-back
on the VPU/MXU. Packed layout identical to elementwise.py (event =
``event_pad(dim)`` lanes, pad lanes masked).

Scope: diagonal mass matrix (a (1, 128) pattern row; identity is the
point of preconditioning), static L. Returns (q_L, p_L, logp_0, logp_L)
so the caller runs the MH correction; ``fused_flow_hmc_kernel`` wraps it
into a drop-in ``(key, state, step_size, inv_mass) -> (state, info)``
HMC transition for ``mcmc.sample``-style drivers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...bijectors.base import Bijector
from .elementwise import (_APPLY, _chain_static_and_params, _seg_matrix,
                          event_pad, is_fusible_chain, pad_packed,
                          unpad_packed)
from ...bijectors.householder import Householder

_LOG_2PI = 1.8378770664093453
_TILE_ROWS_LF = 256     # bwd-sweep stage inputs stay tile-resident


def _chain_fwd_bwd(stage_types, nparams_per_stage, prefs, t, valid,
                   mu, iv):
    """Forward through the chain storing stage inputs, then the adjoint
    sweep with the analytic preconditioned-normal cotangents.

    ``mu``/``iv``: (1, 128) diagonal-Gaussian base mean / inverse-variance
    pattern rows (0 / 1 for the standard normal — generalized round 3,
    VERDICT r2 next #4: the base is free in-kernel, two fused multiply-
    adds per element).

    Returns (gx, elem_acc, y): input-gradient tile, per-element ladj
    accumulator (None if all-orthogonal), final output tile.
    """
    inputs, all_params = [], []
    acc = None
    i = 0
    for st, np_ in zip(stage_types, nparams_per_stage):
        params = [prefs[i + j][:] for j in range(np_)]
        all_params.append(params)
        i += np_
        inputs.append(t)
        if st is Householder:
            t = jax.lax.dot(t, params[0],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        else:
            t, elem = _APPLY[st](t, *params)
            elem = jnp.broadcast_to(elem, t.shape)
            acc = elem if acc is None else acc + elem
    y = t

    # d logp / d y = -(y - mu)/var;  d logp / d elem-ladj = +1.
    cy = -(y - mu) * iv * valid
    ce = valid
    for k in range(len(stage_types) - 1, -1, -1):
        st = stage_types[k]
        t_in = inputs[k]
        params = all_params[k]
        if st is Householder:
            def f_h(tt, B):
                return jax.lax.dot(
                    tt, B, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)

            _, vjp = jax.vjp(f_h, t_in, params[0])
            cy = vjp(cy)[0]
        else:
            def f_e(tt, *ps):
                yy, e = _APPLY[st](tt, *ps)
                return yy, jnp.broadcast_to(e, tt.shape)

            _, vjp = jax.vjp(f_e, t_in, *params)
            cy = vjp((cy, ce))[0]
    return cy, acc, y


def _build_leapfrog_kernel(stage_types, nparams_per_stage, dim, dp,
                           num_steps):
    def kernel(q_ref, p_ref, seg_ref, eps_ref, im_ref, mu_ref, iv_ref,
               *refs):
        n_params = sum(nparams_per_stage)
        prefs = refs[:n_params]
        qo_ref, po_ref, lp0_ref, lpL_ref = refs[n_params:]

        cols = jax.lax.broadcasted_iota(jnp.int32, q_ref.shape, 1)
        valid = (cols % dp < dim).astype(jnp.float32)
        eps = eps_ref[0, 0]
        im = im_ref[:]                       # (1, 128) inv-mass pattern
        mu = mu_ref[:]                       # (1, 128) base-mean pattern
        iv = iv_ref[:]                       # (1, 128) base inv-variance
        # log var row (once per tile; 128 logs — noise).
        lv = -jnp.log(iv)

        def logp_parts(acc, y):
            d = y - mu
            lp_elem = -(d * d * iv + _LOG_2PI + lv) * 0.5
            tot = lp_elem if acc is None else lp_elem + acc
            return jax.lax.dot(tot * valid, seg_ref[:],
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)

        q = q_ref[:]
        p = p_ref[:]
        g, acc0, y0 = _chain_fwd_bwd(stage_types, nparams_per_stage,
                                     prefs, q, valid, mu, iv)
        lp0_ref[:] = logp_parts(acc0, y0)

        def step(_, carry):
            q, p, g = carry
            p = p + 0.5 * eps * g
            q = q + eps * p * im
            g, _, _ = _chain_fwd_bwd(stage_types, nparams_per_stage,
                                     prefs, q, valid, mu, iv)
            p = p + 0.5 * eps * g
            return q, p, g

        q, p, g = jax.lax.fori_loop(0, num_steps, step, (q, p, g))

        _, accL, yL = _chain_fwd_bwd(stage_types, nparams_per_stage,
                                     prefs, q, valid, mu, iv)
        lpL_ref[:] = logp_parts(accL, yL)
        qo_ref[:] = q
        po_ref[:] = p

    return kernel


@functools.partial(jax.jit, static_argnums=(0,))
def _fused_leapfrog_impl(static, q_flat, p_flat, eps, inv_mass_row,
                         mu_row, iv_row, flat_params):
    stage_types, nparams, dim, dp, num_steps = static
    dtype = q_flat.dtype
    spd = 128 // dp
    total = q_flat.shape[0]
    n = total // dp
    rows = -(-total // 128)
    tile_m = min(_TILE_ROWS_LF, -(-rows // 8) * 8)
    rows_padded = -(-rows // tile_m) * tile_m
    pad = rows_padded * 128 - total
    qt = (jnp.pad(q_flat, (0, pad), constant_values=1.0)
          if pad else q_flat).reshape(rows_padded, 128)
    pt = (jnp.pad(p_flat, (0, pad)) if pad else p_flat
          ).reshape(rows_padded, 128)

    seg = _seg_matrix(dim, dp)
    eps2d = jnp.asarray(eps, jnp.float32).reshape(1, 1)

    grid = (rows_padded // tile_m,)
    in_specs = [
        pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128, spd), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for fp in flat_params:
        in_specs.append(pl.BlockSpec(fp.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = (
        pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, spd), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, spd), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    )
    kernel = _build_leapfrog_kernel(stage_types, nparams, dim, dp,
                                    num_steps)
    q2, p2, lp0, lpL = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((rows_padded, 128), dtype),
            jax.ShapeDtypeStruct((rows_padded, 128), dtype),
            jax.ShapeDtypeStruct((rows_padded, spd), jnp.float32),
            jax.ShapeDtypeStruct((rows_padded, spd), jnp.float32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(qt, pt, seg, eps2d, inv_mass_row, mu_row, iv_row, *flat_params)

    q_out = q2.reshape(-1)[:total]
    p_out = p2.reshape(-1)[:total]
    return (q_out, p_out, lp0.reshape(-1)[:n].astype(dtype),
            lpL.reshape(-1)[:n].astype(dtype))


def fused_leapfrog(chain: Bijector, q: jax.Array, p: jax.Array,
                   step_size, num_steps: int,
                   inv_mass_diag: jax.Array | None = None,
                   base_mean: jax.Array | None = None,
                   base_var: jax.Array | None = None):
    """L leapfrog steps of ALL chains in one kernel launch.

    chain: whitened->data bijector f (fusible; see elementwise.py).
    q, p: (n_chains, dim) positions/momenta in the whitened space.
    Returns (q_L, p_L, logp_0, logp_L) with logp(q) = sum diag-normal
    logpdf(f(q); base_mean, base_var) + ladj_f(q) — the
    flow-preconditioned log density (mcmc.logdensity.flow_preconditioned
    semantics, constants included). ``base_mean``/``base_var`` (scalar or
    (dim,)) generalize the base from the hardcoded N(0, I) to any
    diagonal Gaussian at zero kernel cost (two extra fused
    multiply-adds/element — VERDICT r2 next #4).
    """
    n, dim = q.shape
    if not is_fusible_chain(chain, dim, q.dtype):
        raise ValueError("chain is not fusible; use the jnp HMC path")
    dp = event_pad(dim)
    static_types, nparams, flat_params = _chain_static_and_params(
        chain, dim, q.dtype, dp)
    idx = np.minimum(np.arange(128) % dp, dim - 1)

    def _row(v, default):
        if v is None:
            return jnp.full((1, 128), default, jnp.float32)
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 0:
            return jnp.full((1, 128), v, jnp.float32)
        return v[idx][None, :]

    mu_row = _row(base_mean, 0.0)
    iv_row = 1.0 / _row(base_var, 1.0)
    if inv_mass_diag is None:
        im_row = jnp.ones((1, 128), jnp.float32)
    else:
        im_row = jnp.asarray(inv_mass_diag, jnp.float32)[idx][None, :]
    q_flat = pad_packed(q.reshape(-1), dim)
    p_flat = pad_packed(p.reshape(-1), dim)
    # Zero pad-lane momenta so pad lanes stay put (their q feeds nothing).
    if dp != dim:
        lane_valid = (jnp.arange(dp) < dim)
        p_flat = (p_flat.reshape(-1, dp)
                  * lane_valid[None, :]).reshape(-1)
    with jax.named_scope("enflows.pallas.fused_leapfrog"):
        q2, p2, lp0, lpL = _fused_leapfrog_impl(
            (static_types, nparams, dim, dp, num_steps),
            q_flat, p_flat, step_size, im_row, mu_row, iv_row,
            flat_params)
    return (unpad_packed(q2, dim).reshape(n, dim),
            unpad_packed(p2, dim).reshape(n, dim), lp0, lpL)


def fused_flow_hmc_step(chain: Bijector, key, q: jax.Array,
                        step_size, num_steps: int,
                        inv_mass_diag: jax.Array | None = None,
                        base_mean: jax.Array | None = None,
                        base_var: jax.Array | None = None):
    """One full vectorized HMC transition over all chains via the fused
    trajectory kernel: momentum refresh, L leapfrog steps, MH correction.

    Returns (q_new, logp_new (n,), accept_prob (n,), accepted (n,)).
    Identity mass by default (the whitened-space geometry);
    ``base_mean``/``base_var`` select a diagonal-Gaussian base (see
    ``fused_leapfrog``).
    """
    n, dim = q.shape
    dtype = q.dtype
    k_mom, k_acc = jax.random.split(key)
    if inv_mass_diag is None:
        p0 = jax.random.normal(k_mom, (n, dim), dtype)
        ke = lambda p: 0.5 * jnp.sum(p * p, axis=-1)
    else:
        std = jnp.sqrt(1.0 / inv_mass_diag).astype(dtype)
        p0 = jax.random.normal(k_mom, (n, dim), dtype) * std
        ke = lambda p: 0.5 * jnp.sum(p * p * inv_mass_diag, axis=-1)
    q1, p1, lp0, lp1 = fused_leapfrog(chain, q, p0, step_size, num_steps,
                                      inv_mass_diag, base_mean=base_mean,
                                      base_var=base_var)
    h0 = -lp0 + ke(p0)
    h1 = -lp1 + ke(p1)
    delta = h0 - h1
    delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
    accept_prob = jnp.minimum(1.0, jnp.exp(delta))
    u = jax.random.uniform(k_acc, (n,), dtype)
    accepted = u < accept_prob
    q_new = jnp.where(accepted[:, None], q1, q)
    logp_new = jnp.where(accepted, lp1, lp0)
    return q_new, logp_new, accept_prob, accepted
