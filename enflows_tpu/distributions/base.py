"""Base densities and flow-pushforward distributions.

``std_normal_logpdf`` matches the reference scalar kernel
(/root/reference/src/optimize_whitening.jl:4). ``FlowDistribution`` is the
library-level formalization of what the reference examples do by hand: a
base standard normal pushed through a bijector, with exact log-density via
the change of variables (examples/nf_variational_1d.jl:81-86).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from ..bijectors.base import Bijector

_LOG_2PI = 1.8378770664093453


def std_normal_logpdf(x: jax.Array) -> jax.Array:
    """Elementwise standard-normal log-density (reference :4)."""
    return -(x * x + _LOG_2PI) / 2.0


def std_normal_logpdf_sum(x: jax.Array) -> jax.Array:
    """Per-sample N(0, I) log-density: sum over the trailing event axis."""
    elem = std_normal_logpdf(x)
    if jnp.ndim(elem) == 0:
        return elem
    return jnp.sum(elem, axis=-1)


@pytree_dataclass
class FlowDistribution:
    """Pushforward of N(0, I_dim) through ``bijector`` (base -> target).

    ``sample``: z ~ N(0,I); x = bijector(z).
    ``logpdf``: log p(x) = logN(f^{-1}(x)) + ladj(f^{-1}, x).
    """

    bijector: Bijector

    def sample(self, key, shape, dim: int, dtype=jnp.float32):
        z = jax.random.normal(key, tuple(shape) + (dim,), dtype=dtype)
        return self.bijector.forward(z)

    def sample_and_logpdf(self, key, shape, dim: int, dtype=jnp.float32):
        z = jax.random.normal(key, tuple(shape) + (dim,), dtype=dtype)
        x, ladj = self.bijector.forward_and_ladj(z)
        return x, std_normal_logpdf_sum(z) - ladj

    def logpdf(self, x):
        z, ladj = self.bijector.inverse().forward_and_ladj(x)
        return std_normal_logpdf_sum(z) + ladj
