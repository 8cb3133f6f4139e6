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


def _perturbed_stack(key, dim, n_layers=3, hidden=(32, 32), **kw):
    stack = coupling_stack(jax.random.PRNGKey(key), dim,
                           n_layers=n_layers, hidden=hidden,
                           dtype=jnp.float32, **kw)
    return jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(p.size % 97), p.shape, p.dtype), stack)


@pytest.mark.parametrize("dim", [4, 8, 64])
def test_fused_coupling_kernel_matches_jnp(dim):
    """The whole-stack fused kernel (ops.pallas.coupling, interpret mode
    on CPU) matches the jnp path in value, ladj, gradient, and the
    permute-absorption bookkeeping (logical output order)."""
    from enflows_tpu.ops.pallas.coupling import (
        fused_coupling_forward_and_ladj, is_fusible_coupling_stack)

    stack = _perturbed_stack(dim, dim)
    assert is_fusible_coupling_stack(stack, dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (200, dim), jnp.float32)
    y1, l1 = stack.forward_and_ladj(x)
    y2, l2 = fused_coupling_forward_and_ladj(stack, x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=3e-4, atol=3e-4)

    def loss_f(c):
        y, l = fused_coupling_forward_and_ladj(c, x)
        return jnp.sum(jnp.sin(y)) + jnp.sum(l)

    def loss_r(c):
        y, l = c.forward_and_ladj(x)
        return jnp.sum(jnp.sin(y)) + jnp.sum(l)

    gf = jax.grad(loss_f)(stack)
    gr = jax.grad(loss_r)(stack)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_coupling_kernel_inverse_roundtrip():
    """forward and inverse BOTH through the kernel: exact round trip (the
    inverse recomputes the identical conditioner in-kernel) and negated
    ladj."""
    from enflows_tpu.ops.pallas.coupling import (
        fused_coupling_forward_and_ladj)

    stack = _perturbed_stack(5, 8)
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 8), jnp.float32)
    y, l = fused_coupling_forward_and_ladj(stack, x)
    xb, lb = fused_coupling_forward_and_ladj(stack.inverse(), y)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb), -np.asarray(l),
                               rtol=1e-4, atol=1e-4)


def test_fused_coupling_template_with_elementwise_stages():
    """coupling_flow_template chains (ScaleShift/JohnsonInv wrappers
    around the stack) fuse whole: elementwise stages run in-kernel with
    permutation-mapped pattern rows."""
    from enflows_tpu.infer import coupling_flow_template
    from enflows_tpu.ops.pallas.coupling import (
        fused_coupling_forward_and_ladj, is_fusible_coupling_stack)

    dim = 6
    tmpl = coupling_flow_template(3, (16, 16))(dim, jax.random.PRNGKey(3))
    tmpl = jax.tree.map(
        lambda p: p + 0.03 * jax.random.normal(
            jax.random.PRNGKey(p.size % 89), p.shape, p.dtype), tmpl)
    assert is_fusible_coupling_stack(tmpl, dim)
    x = jax.random.normal(jax.random.PRNGKey(4), (77, dim), jnp.float32)
    y1, l1 = tmpl.forward_and_ladj(x)
    y2, l2 = fused_coupling_forward_and_ladj(tmpl, x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=3e-4, atol=3e-4)


def test_fused_coupling_fallbacks():
    """Odd dims, non-half-preserving permutes, and oversized conditioners
    fall back to the jnp path bitwise."""
    from enflows_tpu.bijectors import Permute
    from enflows_tpu.ops.pallas.coupling import (
        fused_coupling_forward_and_ladj, is_fusible_coupling_stack)

    # Odd dim.
    s5 = coupling_stack(jax.random.PRNGKey(5), 5, n_layers=2,
                        hidden=(8, 8))
    assert not is_fusible_coupling_stack(s5, 5)
    x5 = jax.random.normal(jax.random.PRNGKey(6), (10, 5), jnp.float32)
    ya, la = fused_coupling_forward_and_ladj(s5, x5)
    yb, lb = s5.forward_and_ladj(x5)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))

    # A permute that mixes halves.
    mix = Permute(perm=(0, 4, 2, 6, 1, 5, 3, 7))
    s8 = _perturbed_stack(7, 8, n_layers=1)
    mixed = ef.Chain.of(mix, *s8.stages)
    assert not is_fusible_coupling_stack(mixed, 8)


def test_whitening_trainer_coupling_dispatch_matches_std():
    """optimize_whitening's fused coupling loss (VERDICT r3 next #1
    wiring; auto-dispatched on TPU, use_fused="coupling" forces it on any
    backend) converges to the same result as the explicit jnp path."""
    import optax
    from enflows_tpu.train import optimize_whitening

    dim = 8
    key = jax.random.PRNGKey(8)
    A = jax.random.normal(key, (dim, dim), jnp.float32) * 0.3 \
        + jnp.eye(dim, dtype=jnp.float32)
    X = jax.random.normal(jax.random.fold_in(key, 1), (8192, dim),
                          jnp.float32) @ A.T
    stack = coupling_stack(jax.random.fold_in(key, 2), dim,
                           n_layers=2, hidden=(16, 16))
    r_auto = optimize_whitening(X, stack, optax.adam(3e-3),
                                nbatches=2, nepochs=3,
                                use_fused="coupling")
    r_std = optimize_whitening(X, stack, optax.adam(3e-3),
                               nbatches=2, nepochs=3, use_fused=False)
    np.testing.assert_allclose(np.asarray(r_auto.negll_history),
                               np.asarray(r_std.negll_history),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(r_auto.result),
                    jax.tree.leaves(r_std.result)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_vi_trainer_coupling_dispatch_runs():
    """optimize_elbo's fused coupling route (auto on TPU;
    use_fused_coupling=True forces it here) still fits the target."""
    import optax
    from enflows_tpu.train import optimize_elbo

    dim = 4
    mean = jnp.asarray([1.0, -1.0, 0.5, 0.0], jnp.float32)

    def logp(z):
        return -0.5 * jnp.sum((z - mean) ** 2, axis=-1)

    stack = coupling_stack(jax.random.PRNGKey(9), dim, n_layers=2,
                           hidden=(16, 16))
    # A shift is outside the pure coupling family at identity init unless
    # the stack trains; couple with a ScaleShift head like the template.
    flow = ef.Chain.of(ef.ScaleShift(a=jnp.ones(dim, jnp.float32),
                                     b=jnp.zeros(dim, jnp.float32)),
                       *stack.stages)
    res = optimize_elbo(logp, flow, optax.adam(1e-2), dim=dim,
                        batch_size=256, nsteps=300,
                        key=jax.random.PRNGKey(10),
                        use_fused_coupling=True)
    z = res.result.forward(
        jax.random.normal(jax.random.PRNGKey(11), (20000, dim),
                          jnp.float32))
    np.testing.assert_allclose(np.asarray(z).mean(0), np.asarray(mean),
                               atol=0.15)


def test_pick_tile_big_weights_second_tier():
    """Chains whose weights exceed the default scoped-VMEM budget get the
    raised-vmem tier (round 5) instead of the jnp fallback; truly huge
    chains still decline."""
    import numpy as np
    from enflows_tpu.ops.pallas.coupling import (_pick_tile, _stack_plan,
                                                 _VMEM_BUDGET)

    big = coupling_stack(jax.random.PRNGKey(0), 64, n_layers=4,
                         hidden=(1024, 1024))
    with jax.ensure_compile_time_eval():
        plan, params, _ = _stack_plan(big, 64)
        wbytes = sum(int(np.prod(p.shape)) * 4 for p in params)
        assert wbytes > _VMEM_BUDGET          # really is a tier-2 case
        picked = _pick_tile(params, 64, plan)
    assert picked is not None
    tile, vmem = picked
    assert tile >= 64 and vmem is not None    # raised-limit tier

    small = coupling_stack(jax.random.PRNGKey(0), 8, n_layers=2,
                           hidden=(16, 16))
    with jax.ensure_compile_time_eval():
        plan_s, params_s, _ = _stack_plan(small, 8)
        tile_s, vmem_s = _pick_tile(params_s, 8, plan_s)
    assert vmem_s is None                     # default tier unchanged

    huge = coupling_stack(jax.random.PRNGKey(0), 64, n_layers=6,
                          hidden=(2048, 2048))
    with jax.ensure_compile_time_eval():
        plan_h, params_h, _ = _stack_plan(huge, 64)
        assert _pick_tile(params_h, 64, plan_h) is None
