"""CenterStretch / CenterContract: smooth move-mass-from/toward-center pair.

TPU-native counterpart of /root/reference/src/center_stretch.jl. The
*contract* direction is a double-softplus

    y = (softplus(b*(x - c - a)) - softplus(-b*(x - c + a))) / b

(center_contract, reference :11-15), with analytic elementwise ladj

    log| sigmoid(b*(x-c-a)) + sigmoid(-b*(x-c+a)) |

(center_contract_ladj, reference :17-22). The *stretch* direction is its
closed-form inverse; the reference's expression (center_stretch, :4-8)
overflows at |b*x| ≳ 88 in float32 (it materializes exp(|b x|)), so here it
is re-derived fully in the log domain (SURVEY.md §7 hard part (d)):

with m = |b x|, q = exp(-a b), solving the contract equation for s = e^{b t}
gives the quadratic  q s^2 + (1 - e^m) s - e^m q = 0, whose positive root in
log form is

    log s = m + a b - log 2 + logaddexp(log A, 0.5 * logaddexp(2 log A, log B))
    log A = log1p(-e^{-m}),   log B = log 4 - 2 a b - m

and y = c + sign(x) * log(s)/b  (odd symmetry of the map around x = 0, the
same sign trick as the reference). No term can overflow for finite b*x.

Forward (stretch) ladj uses the reference's inverse-ladj-at-output trick:
``-contract_ladj(y)`` (convention #6, reference :39-43).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .base import Bijector, sum_ladjs

_LOG2 = 0.6931471805599453
_LOG4 = 1.3862943611198906


def center_contract(x, a, b, c):
    xu = x - c
    sp = jax.nn.softplus
    return (sp(b * (xu - a)) - sp(-b * (xu + a))) / b


def center_contract_ladj(x, a, b, c):
    """Elementwise log|dy/dx| of center_contract (reference :17-22)."""
    xu = x - c
    dy_dx = jax.nn.sigmoid(b * (xu - a)) + jax.nn.sigmoid(-b * (xu + a))
    return jnp.log(jnp.abs(dy_dx))


def center_stretch(x, a, b, c):
    """Log-domain closed-form inverse of center_contract (see module doc).

    Round-3 single-exp form: with em = e^{-m}, the quadratic root's
    logaddexp chain collapses algebraically (e^{log1p(-em)} = 1 - em and
    e^{logaddexp(...)/2} is a sqrt), leaving ONE exp and ONE log per
    element instead of five of each — same values, same no-overflow
    guarantee, and the (1-em)+sqrt(...) argument is strictly positive so
    the old m-clamp singularity guard is only needed for the
    c1-underflow corner (a*b > 44)."""
    m = jnp.abs(b * x)
    m = jnp.maximum(m, 1e-6)
    ab = a * b
    em = jnp.exp(-m)
    one_m = 1.0 - em
    c1 = 4.0 * jnp.exp(-2.0 * ab)
    r = jnp.sqrt(one_m * one_m + c1 * em)
    log_s = m + ab - _LOG2 + jnp.log(one_m + r)
    return c + jnp.sign(x) * log_s / b


@pytree_dataclass
class CenterStretch(Bijector):
    """Stretch mass away from the center (reference :25-45).

    Params ``a`` (half-width), ``b`` (sharpness, > 0), ``c`` (center);
    scalars or per-dim vectors. Defaults a=0, b=1, c=0 give the identity.
    """

    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray

    @classmethod
    def init(cls, a=0.0, b=1.0, c=0.0, dtype=jnp.float32):
        return cls(a=jnp.asarray(a, dtype), b=jnp.asarray(b, dtype),
                   c=jnp.asarray(c, dtype))

    def forward(self, x):
        return center_stretch(x, self.a, self.b, self.c)

    def forward_and_ladj(self, x):
        # Same convention-#6 value as -contract_ladj(y) but computed by
        # sharing the forward's em/denom intermediates (the e^{ab}
        # factors cancel into ae = 2 em/denom), so the whole fwd+ladj is
        # 1 exp + 2 log + 1 sqrt per element — the kernel's round-3
        # derivation (ops/pallas/elementwise._apply_center_stretch).
        m = jnp.maximum(jnp.abs(self.b * x), 1e-6)
        ab = self.a * self.b
        em = jnp.exp(-m)
        one_m = 1.0 - em
        c1 = 4.0 * jnp.exp(-2.0 * ab)
        r = jnp.sqrt(one_m * one_m + c1 * em)
        denom = one_m + r
        log_s = m + ab - _LOG2 + jnp.log(denom)
        y = self.c + jnp.sign(x) * log_s / self.b
        ae = 2.0 * em / denom
        a2 = jnp.exp(2.0 * ab)
        s_sum = 1.0 / (1.0 + ae) + ae / (ae + a2)
        elem = -jnp.log(s_sum)
        return y, sum_ladjs(jnp.broadcast_to(elem, jnp.shape(y)))

    def inverse(self):
        return CenterContract(a=self.a, b=self.b, c=self.c)


@pytree_dataclass
class CenterContract(Bijector):
    """Contract mass toward the center (reference :49-69)."""

    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray

    @classmethod
    def init(cls, a=0.0, b=1.0, c=0.0, dtype=jnp.float32):
        return cls(a=jnp.asarray(a, dtype), b=jnp.asarray(b, dtype),
                   c=jnp.asarray(c, dtype))

    def forward(self, x):
        return center_contract(x, self.a, self.b, self.c)

    def forward_and_ladj(self, x):
        y = self.forward(x)
        elem = center_contract_ladj(x, self.a, self.b, self.c)
        return y, sum_ladjs(jnp.broadcast_to(elem, jnp.shape(y)))

    def inverse(self):
        return CenterStretch(a=self.a, b=self.b, c=self.c)
