"""Stan-style windowed warmup: dual-averaging step size + Welford mass matrix.

No reference counterpart (SURVEY.md §2b "Warmup adaptation" row). Design
follows Stan's three-phase schedule — fast initial buffer, doubling slow
windows accumulating a diagonal mass matrix, fast terminal buffer — with the
window boundaries computed *statically* (Python ints at trace time) so the
whole warmup is one `lax.scan`.

Multi-chip determinism (SURVEY.md §5 hard requirement (e)): all chains share
ONE step size and ONE mass matrix; the dual-averaging statistic and Welford
moments are averaged over the chains axis *before* the update (a `jnp.mean`
that XLA lowers to a psum when chains are sharded over a mesh), so every
host holds bit-identical adaptation state.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# -------------------------------------------------------------------------
# Dual averaging (Nesterov primal-dual; Stan defaults).

class DualAveragingState(NamedTuple):
    log_step: jax.Array
    log_step_avg: jax.Array
    h_bar: jax.Array
    t: jax.Array
    mu: jax.Array


def da_init(initial_step_size, dtype=jnp.float32) -> DualAveragingState:
    s = jnp.asarray(initial_step_size, dtype)
    return DualAveragingState(
        log_step=jnp.log(s),
        log_step_avg=jnp.log(s),
        h_bar=jnp.zeros((), dtype),
        t=jnp.zeros((), dtype),
        mu=jnp.log(10.0 * s),
    )


def da_update(state: DualAveragingState, accept_prob, target=0.8,
              gamma=0.05, t0=10.0, kappa=0.75) -> DualAveragingState:
    t = state.t + 1.0
    eta_h = 1.0 / (t + t0)
    h_bar = (1.0 - eta_h) * state.h_bar + eta_h * (target - accept_prob)
    log_step = state.mu - jnp.sqrt(t) / gamma * h_bar
    eta_x = t ** (-kappa)
    log_step_avg = eta_x * log_step + (1.0 - eta_x) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_bar, t, state.mu)


# -------------------------------------------------------------------------
# Welford running moments (over chains and steps) for the mass matrix.

class WelfordState(NamedTuple):
    mean: jax.Array     # (dim,)
    m2: jax.Array       # (dim,)
    count: jax.Array    # scalar


def welford_init(dim, dtype=jnp.float32) -> WelfordState:
    return WelfordState(mean=jnp.zeros(dim, dtype),
                        m2=jnp.zeros(dim, dtype),
                        count=jnp.zeros((), dtype))


def welford_update(state: WelfordState, x: jax.Array) -> WelfordState:
    """Add one observation x (dim,)."""
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_update_batch(state: WelfordState, X: jax.Array,
                         axis_name: str | None = None) -> WelfordState:
    """Add a batch of observations X (chains, dim) via Chan's parallel merge.

    Under a sharded chains axis the means/m2 below become psum-backed
    collectives — the distributed moment accumulation of SURVEY.md §5.
    ``axis_name`` (inside ``shard_map``): X is the LOCAL chain block; the
    batch moments are reduced over the mesh axis with explicit
    pmean/psum, so every shard merges the identical GLOBAL batch."""
    if axis_name is None:
        nb = jnp.asarray(X.shape[0], X.dtype)
        mean_b = jnp.mean(X, axis=0)
        m2_b = jnp.sum((X - mean_b) ** 2, axis=0)
    else:
        nb = jnp.asarray(X.shape[0], X.dtype) * jax.lax.psum(
            jnp.ones((), X.dtype), axis_name)
        mean_b = jax.lax.pmean(jnp.mean(X, axis=0), axis_name)
        m2_b = jax.lax.psum(jnp.sum((X - mean_b) ** 2, axis=0), axis_name)
    delta = mean_b - state.mean
    count = state.count + nb
    mean = state.mean + delta * nb / count
    m2 = (state.m2 + m2_b
          + delta * delta * state.count * nb / count)
    return WelfordState(mean, m2, count)


def welford_variance(state: WelfordState, regularize: bool = True):
    """Sample variance with Stan's shrink-to-unit regularization."""
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


# -------------------------------------------------------------------------
# Stan's window schedule (static, computed in numpy at trace time).

def build_schedule(num_warmup: int, init_buffer: int = 75,
                   term_buffer: int = 50, first_window: int = 25):
    """Per-step flags: (in_slow_window, is_window_end) as numpy bool arrays.

    Mirrors Stan's logic: if warmup is too short for the three phases, the
    buffers shrink proportionally.
    """
    if num_warmup < 20:
        return (np.zeros(num_warmup, bool), np.zeros(num_warmup, bool))
    if init_buffer + term_buffer + first_window > num_warmup:
        frac = num_warmup / (init_buffer + term_buffer + first_window)
        init_buffer = int(0.15 * num_warmup)
        term_buffer = int(0.10 * num_warmup)
        first_window = num_warmup - init_buffer - term_buffer

    in_slow = np.zeros(num_warmup, bool)
    window_end = np.zeros(num_warmup, bool)
    pos = init_buffer
    size = first_window
    slow_end = num_warmup - term_buffer
    while pos < slow_end:
        # last window absorbs the remainder
        if pos + 2 * size > slow_end:
            size = slow_end - pos
        in_slow[pos:pos + size] = True
        window_end[pos + size - 1] = True
        pos += size
        size *= 2
    return in_slow, window_end
