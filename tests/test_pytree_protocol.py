"""Pytree/equality/hash protocol tests.

Ports reference pattern "equality/hash stability under deepcopy"
(/root/reference/test/test_center_stretch.jl:45-47) and checks the pytree
registration contract every other subsystem relies on.
"""
import copy

import jax
import jax.numpy as jnp
import numpy as np

from enflows_tpu import (
    ScaleShift, CenterStretch, Johnson, Householder, Chain, compose,
)


def _flow():
    return compose(
        Johnson(gamma=jnp.asarray([0.1]), delta=jnp.asarray([5.0]),
                xi=jnp.asarray([0.0]), lam=jnp.asarray([5.0])),
        CenterStretch(a=jnp.asarray([0.5]), b=jnp.asarray([1.0]),
                      c=jnp.asarray([0.0])),
    )


def test_equality_and_deepcopy():
    f = _flow()
    g = copy.deepcopy(f)
    assert f == g
    # compose() applies the last argument first: stages[0] is the
    # CenterStretch, stages[1] the Johnson.
    h = g.stages[0].replace(a=jnp.asarray([0.6]))
    assert h != g.stages[0]
    # Different types never compare equal.
    assert ScaleShift(a=jnp.ones(1), b=jnp.zeros(1)) != \
        CenterStretch(a=jnp.ones(1), b=jnp.ones(1), c=jnp.zeros(1))


def test_pytree_round_trip():
    f = _flow()
    leaves, treedef = jax.tree.flatten(f)
    g = treedef.unflatten(leaves)
    assert f == g
    # jit/vmap treat the flow as a pytree argument.
    x = jnp.ones((4, 1))
    out = jax.jit(lambda fl, x: fl.forward(x))(f, x)
    np.testing.assert_allclose(out, f.forward(x))


def test_static_fields_are_aux_data():
    h = Householder(V=jnp.ones((2, 4)), mode="dense")
    leaves, treedef = jax.tree.flatten(h)
    assert len(leaves) == 1            # V only; mode is aux
    h2 = treedef.unflatten(leaves)
    assert h2.mode == "dense"
    # mode participates in treedef (different mode -> different treedef).
    h3 = Householder(V=jnp.ones((2, 4)), mode="scan")
    assert jax.tree.flatten(h3)[1] != treedef


def test_tree_map_preserves_type():
    f = _flow()
    g = jax.tree.map(lambda x: x * 2.0, f)
    assert isinstance(g, Chain)
    assert float(g.stages[0].b[0]) == 2.0


def test_keypath_flatten():
    f = _flow()
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_leaves_with_path(f)]
    assert any("stages" in p and "gamma" in p for p in paths), paths
