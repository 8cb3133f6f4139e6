"""Sticking-the-landing VI gradients (train/vi.py neg_elbo_stl).

Three gates: (1) the defining STL property — PER-SAMPLE zero gradient
at q = p, where the standard estimator only has zero mean; (2) measured
gradient-variance reduction near convergence; (3) value equivalence with
the standard nELBO and unchanged convergence through optimize_elbo."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import enflows_tpu as ef
from enflows_tpu.train import neg_elbo, neg_elbo_stl, optimize_elbo

_LOG_2PI = 1.8378770664093453


def _std_normal_logp(z):
    return -0.5 * jnp.sum(z * z, axis=-1) \
        - 0.5 * z.shape[-1] * _LOG_2PI


def _flow(dim=2, key=0, scale=0.0):
    st = ef.spline_coupling_stack(jax.random.PRNGKey(key), dim,
                                  n_layers=2, hidden=(16,), n_bins=6,
                                  dtype=jnp.float64)
    if scale:
        st = jax.tree.map(
            lambda p: p + scale * jax.random.normal(
                jax.random.PRNGKey(p.size % 97), p.shape, p.dtype), st)
    return st


def _grad_norm(g):
    return float(jnp.sqrt(sum(jnp.sum(a * a)
                              for a in jax.tree.leaves(g))))


def test_stl_gradient_is_pointwise_zero_at_optimum():
    """Target = N(0, I), flow = exact identity -> q = p exactly. The STL
    gradient must vanish PER MINIBATCH (up to fp); the standard
    estimator's per-minibatch gradient does not."""
    flow = _flow(scale=0.0)  # identity-initialized -> exact identity
    xi = jax.random.normal(jax.random.PRNGKey(1), (64, 2), jnp.float64)
    g_stl = jax.grad(neg_elbo_stl)(flow, _std_normal_logp, xi)
    g_std = jax.grad(neg_elbo)(flow, _std_normal_logp, xi)
    assert _grad_norm(g_stl) < 1e-10, _grad_norm(g_stl)
    assert _grad_norm(g_std) > 1e-3   # score-function noise survives


def test_stl_value_matches_standard_nelbo():
    """Per batch the two values differ exactly by the empirical-vs-
    analytic base entropy (the flow roundtrip contributes only fp)."""
    flow = _flow(scale=0.3)
    xi = jax.random.normal(jax.random.PRNGKey(2), (128, 2), jnp.float64)
    a = float(neg_elbo(flow, _std_normal_logp, xi))
    b = float(neg_elbo_stl(flow, _std_normal_logp, xi))
    # b - a = mean(log N(ξ)) + H  (the negated empirical-entropy gap).
    ent_gap = float(jnp.mean(_std_normal_logp(xi))
                    + 0.5 * (_LOG_2PI + 1.0) * 2)
    np.testing.assert_allclose(b - a, ent_gap, atol=1e-5)


def test_stl_reduces_gradient_variance_near_convergence():
    """Near (not at) the optimum the score-function term dominates the
    standard estimator's SPREAD around the (common) true gradient; STL's
    spread must collapse."""
    flow = _flow(scale=0.005)  # small perturbation off the optimum
    keys = jax.random.split(jax.random.PRNGKey(3), 24)

    def grad_spread(loss):
        gfun = jax.jit(jax.grad(
            lambda f, xi: loss(f, _std_normal_logp, xi)))
        flats = []
        for k in keys:
            xi = jax.random.normal(k, (32, 2), jnp.float64)
            g = gfun(flow, xi)
            flats.append(np.concatenate(
                [np.asarray(a).ravel() for a in jax.tree.leaves(g)]))
        G = np.stack(flats)
        return float(np.mean(G.var(axis=0)))

    v_stl = grad_spread(neg_elbo_stl)
    v_std = grad_spread(neg_elbo)
    assert v_stl < 0.05 * v_std, (v_stl, v_std)


def test_optimize_elbo_stl_converges_on_mixture():
    """The reference VI mixture workload trains as well with stl=True."""
    def logp(z):
        x = z[..., 0]
        return jnp.logaddexp(-0.5 * ((x - 2.0) / 0.6) ** 2,
                             -0.5 * ((x + 2.0) / 0.6) ** 2) \
            - 0.5 * (z[..., 1] / 1.0) ** 2

    flow = ef.spline_coupling_stack(jax.random.PRNGKey(7), 2,
                                    n_layers=2, hidden=(24,), n_bins=8)
    res = optimize_elbo(logp, flow, optax.adam(5e-3), dim=2,
                        batch_size=256, nsteps=400, stl=True,
                        key=jax.random.PRNGKey(8))
    res2 = optimize_elbo(logp, flow, optax.adam(5e-3), dim=2,
                         batch_size=256, nsteps=400, stl=False,
                         key=jax.random.PRNGKey(8))
    tail = float(jnp.mean(res.nelbo_history[-50:]))
    tail2 = float(jnp.mean(res2.nelbo_history[-50:]))
    assert tail < tail2 + 0.05, (tail, tail2)
    # Pushforward captures both modes.
    z = res.result.forward(
        jax.random.normal(jax.random.PRNGKey(9), (8192, 2), jnp.float32))
    frac_pos = float(jnp.mean(z[:, 0] > 0))
    assert 0.3 < frac_pos < 0.7
