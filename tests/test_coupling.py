"""Affine coupling + Permute: the five reference test patterns (SURVEY §4)
applied to the coupling family — AD-Jacobian oracle for the analytic ladj,
round-trip/antisymmetry/involution properties, dtype checks, and a trainer
convergence test on a correlated target the elementwise+rotation families
cannot whiten from this initialization alone."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import enflows_tpu as ef
from enflows_tpu.bijectors import init_affine_coupling, coupling_stack
from _gradcheck import check_grads


def _layer(dim=4, key=0, **kw):
    c = init_affine_coupling(jax.random.PRNGKey(key), dim, hidden=(16, 16),
                             dtype=jnp.float64, **kw)
    # Perturb the zero-initialized final layer so the map is non-trivial.
    W, b = c.conditioner.layers[-1]
    kW, kb = jax.random.split(jax.random.PRNGKey(key + 100))
    layers = c.conditioner.layers[:-1] + (
        (0.3 * jax.random.normal(kW, W.shape, W.dtype),
         0.2 * jax.random.normal(kb, b.shape, b.dtype)),)
    return c.replace(conditioner=c.conditioner.replace(layers=layers))


def test_identity_initialization():
    c = init_affine_coupling(jax.random.PRNGKey(0), 6, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 6), jnp.float64)
    y, ladj = c.forward_and_ladj(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ladj), 0.0)


def test_round_trip_and_ladj_antisymmetry():
    c = _layer()
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 4), jnp.float64)
    y, ladj = c.forward_and_ladj(x)
    x_back, ladj_inv = c.inverse().forward_and_ladj(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                               atol=1e-12)
    # Convention #6: inverse ladj at the output = negated forward ladj.
    np.testing.assert_allclose(np.asarray(ladj_inv), -np.asarray(ladj),
                               atol=1e-12)
    assert c.inverse().inverse() == c


def test_ladj_matches_ad_jacobian():
    c = _layer()
    xs = jax.random.normal(jax.random.PRNGKey(3), (8, 4), jnp.float64)
    _, ladj = c.forward_and_ladj(xs)
    for i in range(8):
        J = jax.jacfwd(lambda v: c.forward_and_ladj(v)[0])(xs[i])
        sign, logdet = np.linalg.slogdet(np.asarray(J))
        assert sign == 1.0
        np.testing.assert_allclose(float(ladj[i]), logdet, rtol=1e-9)


def test_gradients_vs_finite_differences():
    c = _layer(dim=3)
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 3), jnp.float64)

    def loss(c, x):
        y, ladj = c.forward_and_ladj(x)
        return jnp.sum(y ** 2) - 2.0 * jnp.sum(ladj)

    check_grads(loss, (c, x), atol=2e-4, rtol=2e-4, eps=1e-5)


def test_permute_round_trip_and_zero_ladj():
    p = ef.Permute(perm=(2, 0, 3, 1))
    x = jax.random.normal(jax.random.PRNGKey(5), (10, 4), jnp.float64)
    y, ladj = p.forward_and_ladj(x)
    np.testing.assert_allclose(np.asarray(ladj), 0.0)
    np.testing.assert_allclose(np.asarray(p.inverse().forward(y)),
                               np.asarray(x))
    assert p.inverse().inverse() == p


def test_coupling_stack_round_trip_f32():
    stack = coupling_stack(jax.random.PRNGKey(6), 4, n_layers=3,
                           hidden=(32,))
    # Perturb every coupling's final layer (stack is identity-initialized).
    def bump(s, i):
        if not isinstance(s, ef.AffineCoupling):
            return s
        W, b = s.conditioner.layers[-1]
        layers = s.conditioner.layers[:-1] + (
            (0.1 * jax.random.normal(jax.random.PRNGKey(i), W.shape,
                                     W.dtype), b),)
        return s.replace(conditioner=s.conditioner.replace(layers=layers))

    stack = ef.Chain(stages=tuple(bump(s, i)
                                  for i, s in enumerate(stack.stages)))
    x = jax.random.normal(jax.random.PRNGKey(7), (128, 4), jnp.float32)
    y, ladj = jax.jit(stack.forward_and_ladj)(x)
    assert y.dtype == jnp.float32 and ladj.shape == (128,)
    x_back = jax.jit(stack.inverse().forward)(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                               atol=2e-5)


def test_whitening_trains_coupling_on_correlated_gaussian():
    # A correlated, nonlinearly warped 2D target: optimize_whitening over a
    # coupling stack must drive cov(f(X)) toward identity.
    import optax
    from enflows_tpu.train import optimize_whitening, mvnormal_negll

    key = jax.random.PRNGKey(8)
    z = jax.random.normal(key, (20_000, 2), jnp.float32)
    X = jnp.stack([z[:, 0], 0.5 * z[:, 1] + 0.8 * z[:, 0] ** 2], axis=-1)

    model = coupling_stack(jax.random.PRNGKey(9), 2, n_layers=4,
                           hidden=(32, 32))
    res = optimize_whitening(X, model, optax.adam(1e-2), nbatches=20,
                             nepochs=30)
    Y = res.result.forward(X)
    C = np.cov(np.asarray(Y), rowvar=False)
    np.testing.assert_allclose(C, np.eye(2), atol=0.12)
    hist = np.asarray(res.negll_history)
    assert hist[-1] < hist[0] - 0.3
