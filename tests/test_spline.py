"""Rational-quadratic spline bijectors: the five reference test patterns
(SURVEY §4) applied to the neural-spline-flow family — AD-Jacobian oracle
for the analytic ladj, exact-inverse round trips, ladj antisymmetry
(convention #6), identity initialization, monotonicity/tail properties,
dtype checks, finite-difference gradient validation, and a whitening
convergence gate on a bimodal target that no *linear* map can whiten."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import enflows_tpu as ef
from enflows_tpu.bijectors import (
    init_rq_spline_coupling, init_elementwise_rq_spline,
    spline_coupling_stack,
)
from enflows_tpu.bijectors.spline import rq_spline
from _gradcheck import check_grads


def _layer(dim=4, key=0, n_bins=6, **kw):
    c = init_rq_spline_coupling(jax.random.PRNGKey(key), dim,
                                hidden=(16, 16), n_bins=n_bins,
                                dtype=jnp.float64, **kw)
    # Perturb the zero-initialized final layer so the map is non-trivial.
    W, b = c.conditioner.layers[-1]
    kW, kb = jax.random.split(jax.random.PRNGKey(key + 100))
    layers = c.conditioner.layers[:-1] + (
        (0.4 * jax.random.normal(kW, W.shape, W.dtype),
         0.3 * jax.random.normal(kb, b.shape, b.dtype)),)
    return c.replace(conditioner=c.conditioner.replace(layers=layers))


def _elem(dim=4, key=10, n_bins=8):
    es = init_elementwise_rq_spline(dim, n_bins=n_bins, dtype=jnp.float64)
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return es.replace(
        w_raw=0.6 * jax.random.normal(ks[0], es.w_raw.shape, jnp.float64),
        h_raw=0.6 * jax.random.normal(ks[1], es.h_raw.shape, jnp.float64),
        d_raw=0.6 * jax.random.normal(ks[2], es.d_raw.shape, jnp.float64))


def test_identity_initialization():
    st = spline_coupling_stack(jax.random.PRNGKey(0), 6, n_layers=3,
                               dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 6), jnp.float64) * 2
    y, ladj = st.forward_and_ladj(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-13)
    np.testing.assert_allclose(np.asarray(ladj), 0.0, atol=1e-13)
    es = init_elementwise_rq_spline(6, dtype=jnp.float64)
    y, ladj = es.forward_and_ladj(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-13)
    np.testing.assert_allclose(np.asarray(ladj), 0.0, atol=1e-13)


def test_round_trip_and_ladj_antisymmetry():
    c = _layer()
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 4), jnp.float64)
    y, ladj = c.forward_and_ladj(x)
    x_back, ladj_inv = c.inverse().forward_and_ladj(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ladj_inv), -np.asarray(ladj),
                               atol=1e-9)
    assert c.inverse().inverse() == c


def test_elementwise_round_trip_and_antisymmetry():
    es = _elem()
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 4), jnp.float64) * 3
    y, ladj = es.forward_and_ladj(x)
    x_back, ladj_inv = es.inverse().forward_and_ladj(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ladj_inv), -np.asarray(ladj),
                               atol=1e-9)


def test_ladj_matches_ad_jacobian():
    c = _layer()
    xs = jax.random.normal(jax.random.PRNGKey(4), (6, 4), jnp.float64)
    _, ladj = c.forward_and_ladj(xs)
    for i in range(6):
        J = jax.jacfwd(lambda v: c.forward_and_ladj(v)[0])(xs[i])
        sign, logdet = np.linalg.slogdet(np.asarray(J))
        assert sign == 1.0
        np.testing.assert_allclose(float(ladj[i]), logdet, rtol=1e-8)


def test_elementwise_ladj_matches_ad_derivative():
    es = _elem(dim=1)
    xs = jnp.linspace(-4.5, 4.5, 23, dtype=jnp.float64)[:, None]
    _, ladj = es.forward_and_ladj(xs)
    for i in range(xs.shape[0]):
        d = jax.jacfwd(lambda v: es.forward_and_ladj(v)[0])(xs[i])[0, 0]
        np.testing.assert_allclose(float(ladj[i]), np.log(abs(float(d))),
                                   rtol=1e-8)


def test_monotone_and_identity_tails():
    g = jnp.linspace(-6.0, 6.0, 2001, dtype=jnp.float64)
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    w = 1.5 * jax.random.normal(ks[0], (8,), jnp.float64)
    h = 1.5 * jax.random.normal(ks[1], (8,), jnp.float64)
    d = 1.5 * jax.random.normal(ks[2], (7,), jnp.float64)
    y, ladj = rq_spline(g, w, h, d, bound=4.0)
    assert bool(jnp.all(jnp.diff(y) > 0))
    out = jnp.abs(g) >= 4.0
    np.testing.assert_allclose(np.asarray(y[out]), np.asarray(g[out]))
    np.testing.assert_allclose(np.asarray(ladj[out]), 0.0)
    # C^1 continuity at the boundary: the boundary knot derivative is
    # pinned to 1, so infinitesimally inside +-bound the map is the
    # identity and the ladj vanishes.
    edge = jnp.asarray([-4.0 + 1e-9, 4.0 - 1e-9], jnp.float64)
    ye, le = rq_spline(edge, w, h, d, bound=4.0)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(edge), atol=1e-7)
    np.testing.assert_allclose(np.asarray(le), 0.0, atol=1e-6)


def test_gradients_vs_finite_differences():
    c = _layer(dim=3, n_bins=4)
    x = jax.random.normal(jax.random.PRNGKey(6), (12, 3), jnp.float64)

    def loss(c, x):
        y, ladj = c.forward_and_ladj(x)
        return jnp.sum(y ** 2) - 2.0 * jnp.sum(ladj)

    check_grads(loss, (c, x), atol=3e-4, rtol=3e-4, eps=1e-5)


def test_float32_dtype_and_round_trip():
    c = init_rq_spline_coupling(jax.random.PRNGKey(7), 4, hidden=(16,),
                                dtype=jnp.float32)
    W, b = c.conditioner.layers[-1]
    kW = jax.random.PRNGKey(8)
    layers = c.conditioner.layers[:-1] + (
        (0.4 * jax.random.normal(kW, W.shape, jnp.float32), b),)
    c = c.replace(conditioner=c.conditioner.replace(layers=layers))
    x = jax.random.normal(jax.random.PRNGKey(9), (256, 4), jnp.float32)
    y, ladj = c.forward_and_ladj(x)
    assert y.dtype == jnp.float32 and ladj.dtype == jnp.float32
    x_back = c.inverse().forward(y)
    # The inverse direction amplifies an f32 ulp of y by the local inverse
    # slope wherever the forward map compresses (steep splines near the
    # bound), so the x-space error bound must carry that condition number;
    # re-applying the forward contracts it back to f32 exactness.
    y_rt = c.forward(x_back)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y), atol=1e-5)
    slope = jax.jacfwd(lambda v: c.inverse().forward(v))
    err = np.abs(np.asarray(x_back - x))
    bad = np.argwhere(err > 1e-4)
    for i, j in bad[:8]:
        amp = float(np.abs(np.asarray(slope(y[i]))).max())
        assert err[i, j] < 64 * amp * np.finfo(np.float32).eps * 5.0, \
            (i, j, err[i, j], amp)
    assert np.quantile(err, 0.9) < 2e-5


def test_conditioner_width_validation():
    c = _layer(dim=4)
    bad = c.replace(n_bins=5)  # wrong K for the emitted param width
    x = jax.random.normal(jax.random.PRNGKey(10), (4, 4), jnp.float64)
    with pytest.raises(ValueError, match="needs"):
        bad.forward_and_ladj(x)


def _perturbed_stack(dim=8, n_layers=3, n_bins=6, scale=0.05, key=0):
    st = spline_coupling_stack(jax.random.PRNGKey(key), dim,
                               n_layers=n_layers, hidden=(32,),
                               n_bins=n_bins)
    return jax.tree.map(
        lambda p: p + scale * jax.random.normal(
            jax.random.PRNGKey(p.size % 97), p.shape, p.dtype), st)


def test_fused_kernel_matches_jnp_forward_and_inverse():
    """The fused coupling kernel (ops/pallas/coupling.py) accepts spline
    stacks; interpret-mode equivalence vs the jnp path on well-conditioned
    inputs (bound-squashed points are f32-ill-conditioned on BOTH paths —
    the gate for those is right-inverse self-consistency below)."""
    from enflows_tpu.ops.pallas.coupling import (
        fused_coupling_forward_and_ladj, is_fusible_coupling_stack)

    st = _perturbed_stack()
    assert is_fusible_coupling_stack(st, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 8), jnp.float32) * 2
    y_ref, l_ref = st.forward_and_ladj(x)
    y_f, l_f = fused_coupling_forward_and_ladj(st, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_ref),
                               atol=2e-4)
    inv = st.inverse()
    z = jax.random.normal(jax.random.PRNGKey(2), (64, 8), jnp.float32)
    a, la = inv.forward_and_ladj(z)
    b, lb = fused_coupling_forward_and_ladj(inv, z)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la), atol=2e-4)


def test_fused_kernel_right_inverse_self_consistency():
    from enflows_tpu.ops.pallas.coupling import \
        fused_coupling_forward_and_ladj

    st = _perturbed_stack(scale=0.1)
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 8), jnp.float32) * 2
    y, _ = fused_coupling_forward_and_ladj(st, x)
    x_back, _ = fused_coupling_forward_and_ladj(st.inverse(), y)
    y_rt, _ = fused_coupling_forward_and_ladj(st, x_back)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y), atol=1e-3)


def test_fused_kernel_mixed_affine_spline_stack():
    from enflows_tpu.bijectors import coupling_stack
    from enflows_tpu.bijectors.base import Chain
    from enflows_tpu.ops.pallas.coupling import (
        fused_coupling_forward_and_ladj, is_fusible_coupling_stack)

    aff = coupling_stack(jax.random.PRNGKey(5), 8, n_layers=2, hidden=(16,))
    spl = _perturbed_stack()
    mix = Chain.of(*(aff.stages + spl.stages))
    mix = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(p.size % 89), p.shape, p.dtype), mix)
    assert is_fusible_coupling_stack(mix, 8)
    x = jax.random.normal(jax.random.PRNGKey(6), (32, 8), jnp.float32)
    y_ref, l_ref = mix.forward_and_ladj(x)
    y_f, l_f = fused_coupling_forward_and_ladj(mix, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_ref),
                               atol=1e-3)


def test_fused_kernel_gradients_match_jnp():
    """custom_vjp backward routes through the jnp path; with the jnp
    forward's own outputs in the loss the gradients must coincide."""
    from enflows_tpu.ops.pallas.coupling import \
        fused_coupling_forward_and_ladj

    st = _perturbed_stack(scale=0.03)
    x = jax.random.normal(jax.random.PRNGKey(7), (32, 8), jnp.float32)

    def loss(fwd):
        def f(c, x):
            y, l = fwd(c, x)
            return jnp.sum(jnp.tanh(y)) - 0.1 * jnp.sum(l)
        return f

    gf = jax.grad(loss(fused_coupling_forward_and_ladj))(st, x)
    gr = jax.grad(loss(lambda c, u: c.forward_and_ladj(u)))(st, x)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_whitening_trainer_dispatches_spline_stack():
    """optimize_whitening's fused-coupling auto-dispatch now admits spline
    stacks (is_fusible_coupling_stack returns True); forcing the fused
    route must train to the same quality as the standard route."""
    import optax
    from enflows_tpu.train import optimize_whitening

    rng = np.random.default_rng(1)
    n = 2048
    x0 = rng.normal(0, 1.0, n)
    x1 = 0.6 * x0 + rng.normal(0, 0.8, n)
    X = jnp.asarray(np.stack([x0, x1] * 2, 1), jnp.float32)  # dim 4

    st = spline_coupling_stack(jax.random.PRNGKey(12), 4, n_layers=2,
                               hidden=(16,), n_bins=6)
    kw = dict(nbatches=2, nepochs=3)
    res_std = optimize_whitening(X, st, optax.adam(5e-3),
                                 use_fused=False, **kw)
    res_fused = optimize_whitening(X, st, optax.adam(5e-3),
                                   use_fused="coupling", **kw)
    np.testing.assert_allclose(np.asarray(res_fused.negll_history),
                               np.asarray(res_std.negll_history),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(res_fused.result),
                    jax.tree.leaves(res_std.result)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_whitening_convergence_beats_linear_bound():
    """A bimodal marginal no linear (or orthogonal) whitening map can fix:
    the spline stack's trained negll must beat the best *Gaussian* fit —
    the analytic optimum of every linear-map flow — by a clear margin."""
    import optax
    from enflows_tpu.train import optimize_whitening

    rng = np.random.default_rng(0)
    n = 4096
    comp = rng.integers(0, 2, n)
    x0 = rng.normal(0, 0.5, n) + np.where(comp, 2.0, -2.0)
    x1 = 0.5 * x0 + rng.normal(0, 0.8, n)
    X = jnp.asarray(np.stack([x0, x1], 1), jnp.float32)

    st = spline_coupling_stack(jax.random.PRNGKey(11), 2, n_layers=2,
                               hidden=(32,), n_bins=8, bound=6.0)
    res = optimize_whitening(X, st, optax.adam(5e-3), nbatches=8,
                             nepochs=40)
    negll = float(res.negll_history[-1])

    # Gaussian MLE negll (nats/sample) = d/2 (1 + log 2pi) + 1/2 log|cov|:
    # the optimum of any affine map pushed to N(0, I).
    cov = np.cov(np.asarray(X).T)
    gauss = 0.5 * 2 * (1 + np.log(2 * np.pi)) \
        + 0.5 * np.linalg.slogdet(cov)[1]
    assert negll < gauss - 0.25, (negll, gauss)
    # And the map actually whitens: unit covariance within tolerance.
    Y = np.asarray(res.result.forward(X))
    c = np.cov(Y.T)
    np.testing.assert_allclose(c, np.eye(2), atol=0.25)
