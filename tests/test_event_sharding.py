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
    # check_vma=False declares the psum'd per-sample ladj replicated over
    # the dim axis; machine-check it (VERDICT r4 next #6).
    from enflows_tpu.utils import assert_replicated_consistent
    assert_replicated_consistent(l_sh, "event_sharded.ladj")


def test_2d_mesh_negll_and_grads_match_local():
    """dp x event-sharding composed on a 2D mesh: loss AND parameter
    gradients must match the unsharded whitening negll bit-for-bit in f64."""
    from enflows_tpu.parallel import event_sharded_negll_fn
    from enflows_tpu.train import mvnormal_negll
    from jax.sharding import NamedSharding, PartitionSpec as P

    dim = 16
    mesh = make_mesh({"batch": 2, "dim": 4})
    chain = _chain(dim)
    x = jax.random.normal(jax.random.PRNGKey(2), (64, dim), DT)

    negll_ref, grads_ref = jax.value_and_grad(mvnormal_negll)(chain, x)

    fn = event_sharded_negll_fn(mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("batch", "dim")))
    cs = jax.device_put(chain, NamedSharding(mesh, P("dim")))
    negll_sh, grads_sh = jax.jit(jax.value_and_grad(fn))(cs, xs)

    np.testing.assert_allclose(float(negll_sh), float(negll_ref),
                               rtol=1e-12)
    for g_sh, g_ref in zip(jax.tree.leaves(grads_sh),
                           jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                                   rtol=1e-10, atol=1e-12)


def test_householder_rejected():
    mesh = make_mesh({"dim": 8}, axis_name="dim")
    c = ef.Chain.of(ef.Householder(
        V=jax.random.normal(jax.random.PRNGKey(1), (2, 64), DT)))
    with pytest.raises(ValueError, match="mixes event dims"):
        event_sharded_forward_and_ladj(c, mesh)
