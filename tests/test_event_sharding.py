"""Event-dimension sharding tests (SURVEY.md §5 long-context analogue)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import enflows_tpu as ef
from enflows_tpu.parallel import (
    make_mesh, event_sharded_forward_and_ladj, shard_event_batch,
)

DT = jnp.float64


def _chain(dim):
    return ef.compose(
        ef.Johnson(gamma=jnp.zeros(dim, DT), delta=jnp.full(dim, 5.0, DT),
                   xi=jnp.zeros(dim, DT), lam=jnp.full(dim, 5.0, DT)),
        ef.ScaleShift(a=jnp.linspace(0.5, 2.0, dim, dtype=DT),
                      b=jnp.zeros(dim, DT)),
        ef.invert(ef.CenterStretch(a=jnp.full(dim, 0.5, DT),
                                   b=jnp.ones(dim, DT),
                                   c=jnp.zeros(dim, DT))),
    )


def test_event_sharded_matches_local():
    dim = 64
    mesh = make_mesh({"dim": 8}, axis_name="dim")
    chain = _chain(dim)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, dim), DT)
    y_ref, l_ref = chain.forward_and_ladj(x)
    run = event_sharded_forward_and_ladj(chain, mesh)
    y_sh, l_sh = run(shard_event_batch(x, mesh))
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(l_sh), np.asarray(l_ref),
                               rtol=1e-12)


def test_householder_rejected():
    mesh = make_mesh({"dim": 8}, axis_name="dim")
    c = ef.Chain.of(ef.Householder(
        V=jax.random.normal(jax.random.PRNGKey(1), (2, 64), DT)))
    with pytest.raises(ValueError, match="mixes event dims"):
        event_sharded_forward_and_ladj(c, mesh)
