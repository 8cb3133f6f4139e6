"""Chain composition and JohnsonSU distribution tests.

Composition semantics mirror the reference's ``Base.∘`` protocol (SURVEY.md
§3.2, §3.4); JohnsonSU checks port test_johnson_trafo.jl:12-16 (statistical
sampler validation) plus pdf/cdf/quantile consistency.
"""
import jax
import jax.numpy as jnp
import numpy as np

from enflows_tpu import (
    Chain, CenterStretch, Johnson, Householder, ScaleShift, compose, invert,
    JohnsonSU, FlowDistribution,
)


def _example_2d_truth():
    # Ground-truth flow of /root/reference/examples/nf_example_2d.jl:12-15.
    return compose(
        ScaleShift(a=jnp.asarray([1.3, 0.4], jnp.float64),
                   b=jnp.asarray([2.5, -1.2], jnp.float64)),
        Householder(V=jnp.asarray([1.0, 0.3], jnp.float64)),
        CenterStretch(a=jnp.asarray([4.0, 4.1], jnp.float64),
                      b=jnp.asarray([2.0, 2.1], jnp.float64),
                      c=jnp.asarray([3.0, 3.1], jnp.float64)),
    )


def test_compose_order():
    # compose(f, g)(x) == f(g(x)): last argument applied first.
    f = ScaleShift(a=jnp.float64(2.0), b=jnp.float64(0.0))
    g = ScaleShift(a=jnp.float64(1.0), b=jnp.float64(3.0))
    x = jnp.asarray([[1.0]], jnp.float64)
    np.testing.assert_allclose(compose(f, g).forward(x), 2.0 * (1.0 + 3.0))
    # >> is data-flow order: f >> g applies f first.
    np.testing.assert_allclose((g >> f).forward(x), 2.0 * (1.0 + 3.0))


def test_chain_ladj_accumulates():
    f = _example_2d_truth()
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 2), dtype=jnp.float64)
    y, ladj = f.forward_and_ladj(x)
    # Oracle: AD Jacobian per sample.
    for i in range(0, 64, 16):
        J = jax.jacrev(f.forward)(x[i])  # jacrev: Householder uses custom_vjp
        _, logdet = jnp.linalg.slogdet(J)
        np.testing.assert_allclose(ladj[i], logdet, rtol=1e-8)


def test_chain_inverse_round_trip():
    f = _example_2d_truth()
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 2), dtype=jnp.float64)
    y = f.forward(x)
    x2 = invert(f).forward(y)
    np.testing.assert_allclose(x2, x, rtol=1e-8, atol=1e-9)
    # Antisymmetry through the whole chain.
    _, ladj = f.forward_and_ladj(x)
    _, ladj_inv = invert(f).forward_and_ladj(y)
    np.testing.assert_allclose(ladj_inv, -ladj, rtol=1e-7, atol=1e-8)


def test_chain_flattens():
    a = ScaleShift(a=jnp.float64(2.0), b=jnp.float64(0.0))
    c = Chain.of(a, Chain.of(a, a))
    assert len(c) == 3


def test_johnson_su_sampler_statistics():
    # Port of test_johnson_trafo.jl:12-16: 10^6 draws vs transformed-normal
    # draws, mean-of-sorted-|.| within 1%.
    d = JohnsonSU.init(gamma=2.0, delta=3.0, xi=1.0, lam=1.5,
                       dtype=jnp.float64)
    n = 10**6
    s1 = d.sample(jax.random.PRNGKey(0), (n,))
    z = jax.random.normal(jax.random.PRNGKey(1), (n,), dtype=jnp.float64)
    s2 = d.lam * jnp.sinh((z - d.gamma) / d.delta) + d.xi
    m1 = jnp.mean(jnp.sort(jnp.abs(s1)))
    m2 = jnp.mean(jnp.sort(jnp.abs(s2)))
    np.testing.assert_allclose(m1, m2, rtol=0.01)
    # Moments vs analytic formulas.
    np.testing.assert_allclose(jnp.mean(s1), d.mean(), rtol=0.02)
    np.testing.assert_allclose(jnp.var(s1), d.var(), rtol=0.05)
    np.testing.assert_allclose(jnp.median(s1), d.median(), atol=0.01)


def test_johnson_su_pdf_cdf_quantile():
    d = JohnsonSU.init(gamma=2.0, delta=3.0, xi=1.0, lam=1.5,
                       dtype=jnp.float64)
    x = jnp.linspace(-5.0, 5.0, 41, dtype=jnp.float64)
    # quantile(cdf(x)) == x (atol limited by cdf saturation near 1)
    np.testing.assert_allclose(d.quantile(d.cdf(x)), x, atol=1e-4)
    # pdf == d/dx cdf
    dcdf = jax.vmap(jax.grad(d.cdf))(x)
    np.testing.assert_allclose(d.pdf(x), dcdf, rtol=1e-7)
    # pdf integrates to ~1
    xs = jnp.linspace(-60.0, 60.0, 20001, dtype=jnp.float64)
    integral = jnp.trapezoid(d.pdf(xs), xs)
    np.testing.assert_allclose(integral, 1.0, rtol=1e-4)
    # ccdf complements (ccdf uses the more accurate sf; 1-cdf saturates)
    np.testing.assert_allclose(d.ccdf(x), 1.0 - d.cdf(x), rtol=1e-4)


def test_flow_distribution_logpdf_consistency():
    flow = _example_2d_truth()
    dist = FlowDistribution(bijector=flow)
    key = jax.random.PRNGKey(5)
    x, lp = dist.sample_and_logpdf(key, (256,), dim=2, dtype=jnp.float64)
    np.testing.assert_allclose(dist.logpdf(x), lp, rtol=1e-7)


def test_johnson_su_distributions_api_surface():
    # minimum/maximum/params/location/scale (reference johnson_trafo.jl:15-22).
    d = JohnsonSU.init(gamma=2.0, delta=3.0, xi=1.0, lam=1.5,
                      dtype=jnp.float64)
    assert float(d.minimum()) == -np.inf and float(d.maximum()) == np.inf
    g, de, xi, lam = d.params()
    assert (float(g), float(de), float(xi), float(lam)) == (2.0, 3.0, 1.0, 1.5)
    np.testing.assert_allclose(float(d.location()), float(d.mean()))
    np.testing.assert_allclose(float(d.scale()), float(d.var()))
