"""Kernel-vs-oracle tolerance checks ON THE REAL TPU CHIP.

Every production Pallas path (packed fwd/bwd, single-pass train kernel,
bf16 variants, fused leapfrog) runs compiled-on-hardware here and is
compared against the jnp reference evaluated in f64 on the CPU backend
(`jax.experimental.enable_x64` scope — x64 stays off globally because
Mosaic kernels don't lower under x64-on-TPU). The escape class this
gates: kernels that are valid in CPU interpret mode (where tests/ runs
them) but wrong on hardware — round 2's f32-stored-into-bf16-ref bug
(BASELINE.md bf16 section) is the existence proof.

Oracle tolerances are f32-calibrated: the kernel's error vs the f64
truth must be comparable to the TPU jnp path's own f32 error (both are
"correct at f32"), with an absolute floor for well-conditioned values.
"""
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import enflows_tpu as ef

F = jnp.float32


@contextlib.contextmanager
def x64_cpu(cpu):
    with jax.enable_x64(True), jax.default_device(cpu):
        yield


def to64(tree):
    return jax.tree.map(
        lambda p: jnp.asarray(np.asarray(p, np.float64)), tree)


def chain_for(d, dtype=F):
    key = jax.random.PRNGKey(0)
    return ef.compose(
        ef.Johnson(gamma=jnp.full(d, 0.3, dtype),
                   delta=jnp.full(d, 5.0, dtype),
                   xi=jnp.zeros(d, dtype), lam=jnp.full(d, 5.0, dtype)),
        ef.Householder(V=jax.random.normal(
            key, (3, d), dtype)).canonicalize()
        if d > 1 else ef.ScaleShift(a=jnp.full(d, 1.2, dtype),
                                    b=jnp.zeros(d, dtype)),
        ef.invert(ef.CenterStretch(a=jnp.full(d, 1.0, dtype),
                                   b=jnp.full(d, 1.5, dtype),
                                   c=jnp.full(d, 0.1, dtype))),
        ef.ScaleShift(a=jnp.full(d, 1.3, dtype),
                      b=jnp.full(d, -0.4, dtype)),
        ef.CenterStretch(a=jnp.full(d, 0.4, dtype),
                         b=jnp.full(d, 2.0, dtype), c=jnp.zeros(d, dtype)),
    )


def _gate(kernel_out, jnp_tpu_out, f64_out, label, slack=4.0,
          floor_rel=2e-5):
    """Kernel error vs f64 truth must be <= slack x the TPU jnp path's own
    f32 error (or an absolute floor scaled to the value range)."""
    truth = np.asarray(f64_out, np.float64)
    scale = np.abs(truth).max() + 1.0
    e_kernel = np.abs(np.asarray(kernel_out, np.float64) - truth).max()
    e_jnp = np.abs(np.asarray(jnp_tpu_out, np.float64) - truth).max()
    assert e_kernel <= max(slack * e_jnp, floor_rel * scale), \
        f"{label}: kernel err {e_kernel:.3e} vs jnp-f32 err {e_jnp:.3e} " \
        f"(scale {scale:.3e})"


@pytest.mark.parametrize("d", [2, 50])
def test_packed_forward_ladj_on_hardware(cpu, d):
    from enflows_tpu.ops.pallas.elementwise import (
        fused_forward_and_ladj_packed, is_fusible_chain)

    chain = chain_for(d)
    assert is_fusible_chain(chain, d, F)
    x = jax.random.normal(jax.random.PRNGKey(1), (4096, d), F)

    y_k, l_k = fused_forward_and_ladj_packed(chain, x.reshape(-1), d)
    y_j, l_j = chain.forward_and_ladj(x)

    with x64_cpu(cpu):
        y_64, l_64 = to64(chain).forward_and_ladj(
            jnp.asarray(np.asarray(x, np.float64)))
    _gate(np.asarray(y_k).reshape(4096, d), y_j, y_64, f"fwd y d={d}")
    _gate(l_k, l_j, l_64, f"fwd ladj d={d}")


@pytest.mark.parametrize("d", [2, 50])
def test_packed_backward_on_hardware(cpu, d):
    """The fused Pallas BACKWARD kernel's param/input grads vs f64 AD."""
    from enflows_tpu.ops.pallas.elementwise import (
        fused_forward_and_ladj_packed)

    chain = chain_for(d)
    x_flat = jax.random.normal(jax.random.PRNGKey(2), (512 * d,), F)

    def loss_k(c, xf):
        y, l = fused_forward_and_ladj_packed(c, xf, d)
        return jnp.sum(jnp.sin(y)) + jnp.sum(l * l)

    def loss_j(c, xf):
        y, l = c.forward_and_ladj(xf.reshape(-1, d))
        return jnp.sum(jnp.sin(y.reshape(-1))) + jnp.sum(l * l)

    gk = jax.grad(loss_k, argnums=(0, 1))(chain, x_flat)
    gj = jax.grad(loss_j, argnums=(0, 1))(chain, x_flat)
    with x64_cpu(cpu):
        g64 = jax.grad(loss_j, argnums=(0, 1))(
            to64(chain), jnp.asarray(np.asarray(x_flat, np.float64)))
    for a, b, c in zip(jax.tree.leaves(gk), jax.tree.leaves(gj),
                       jax.tree.leaves(g64)):
        _gate(a, b, c, f"grad d={d}", slack=6.0, floor_rel=5e-5)


@pytest.mark.parametrize("d", [2, 16, 50])
def test_train_step_kernel_on_hardware(cpu, d):
    """Single-pass negll+grad kernel vs f64 value_and_grad on CPU."""
    from enflows_tpu.ops.pallas.elementwise import (
        fused_negll_value_and_grad)
    from enflows_tpu.train.whitening import mvnormal_negll

    chain = chain_for(d)
    x = 0.7 * jax.random.normal(jax.random.PRNGKey(3), (2048, d), F)
    v_k, g_k = fused_negll_value_and_grad(chain, x.reshape(-1), d)
    v_j, g_j = jax.value_and_grad(mvnormal_negll)(chain, x)
    with x64_cpu(cpu):
        v_64, g_64 = jax.value_and_grad(mvnormal_negll)(
            to64(chain), jnp.asarray(np.asarray(x, np.float64)))
    _gate(v_k, v_j, v_64, f"negll d={d}")
    for a, b, c in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_j),
                       jax.tree.leaves(g_64)):
        _gate(a, b, c, f"negll grad d={d}", slack=6.0, floor_rel=5e-5)


@pytest.mark.parametrize("d", [2, 50])
def test_bf16_kernel_on_hardware(cpu, d):
    """bf16 packed kernel on the chip: errors vs the f64 truth comparable
    to the bf16 jnp path's own error — the exact gate that would have
    caught round 2's f32-into-bf16-ref store bug on hardware."""
    from enflows_tpu.ops.pallas.elementwise import (
        fused_forward_and_ladj_packed, is_fusible_chain)

    chain32 = chain_for(d)
    assert is_fusible_chain(chain32, d, jnp.bfloat16)
    chain16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), chain32)
    x32 = jax.random.normal(jax.random.PRNGKey(4), (2048, d), F)
    x16 = x32.astype(jnp.bfloat16)

    y_k, l_k = fused_forward_and_ladj_packed(chain16, x16.reshape(-1), d)
    assert y_k.dtype == jnp.bfloat16
    y_j, l_j = chain16.forward_and_ladj(x16)
    with x64_cpu(cpu):
        y_64, l_64 = to64(chain32).forward_and_ladj(
            jnp.asarray(np.asarray(x32, np.float64)))
    _gate(np.asarray(y_k, np.float32).reshape(2048, d),
          np.asarray(y_j, np.float32), y_64, f"bf16 y d={d}",
          slack=4.0, floor_rel=1e-2)
    _gate(np.asarray(l_k, np.float32), np.asarray(l_j, np.float32),
          l_64, f"bf16 ladj d={d}", slack=4.0, floor_rel=1e-2)


def test_bf16_train_step_kernel_on_hardware(cpu):
    from enflows_tpu.ops.pallas.elementwise import (
        fused_negll_value_and_grad)
    from enflows_tpu.train.whitening import mvnormal_negll

    d = 2
    chain32 = chain_for(d)
    chain16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), chain32)
    x32 = 0.7 * jax.random.normal(jax.random.PRNGKey(5), (2048, d), F)
    x16 = x32.astype(jnp.bfloat16)
    v_k, g_k = fused_negll_value_and_grad(chain16, x16.reshape(-1), d)
    with x64_cpu(cpu):
        v_64, g_64 = jax.value_and_grad(mvnormal_negll)(
            to64(chain32), jnp.asarray(np.asarray(x32, np.float64)))
    assert abs(float(v_k) - float(v_64)) < 2e-2 * (abs(float(v_64)) + 1.0)
    for a, c in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_64)):
        scale = np.abs(np.asarray(c, np.float64)).max() + 1.0
        err = np.abs(np.asarray(a, np.float64)
                     - np.asarray(c, np.float64)).max()
        assert err < 3e-2 * scale, (err, scale)


def test_fused_leapfrog_on_hardware(cpu):
    """Fused leapfrog+logprob trajectories vs an f64 CPU leapfrog over
    the identical flow-preconditioned log density."""
    from enflows_tpu.ops.pallas.leapfrog import fused_leapfrog

    d, n, L, eps = 50, 256, 5, 0.05
    chain = chain_for(d)
    key = jax.random.PRNGKey(6)
    q0 = 0.5 * jax.random.normal(key, (n, d), F)
    p0 = jax.random.normal(jax.random.fold_in(key, 1), (n, d), F)

    qf, pf, lp0, lpL = fused_leapfrog(chain, q0, p0, eps, L)

    _LOG_2PI = 1.8378770664093453

    def make_logp(c):
        def f(q):
            y, ladj = c.forward_and_ladj(q)
            return jnp.sum(-(y * y + _LOG_2PI) * 0.5, -1) + ladj
        return f

    def jnp_leapfrog(logp, q, p):
        grad = jax.vmap(jax.grad(lambda v: logp(v[None, :])[0]))
        g = grad(q)
        for _ in range(L):
            p = p + 0.5 * eps * g
            q = q + eps * p
            g = grad(q)
            p = p + 0.5 * eps * g
        return q, p

    with x64_cpu(cpu):
        c64 = to64(chain)
        logp64 = make_logp(c64)
        q64 = jnp.asarray(np.asarray(q0, np.float64))
        p64 = jnp.asarray(np.asarray(p0, np.float64))
        qr, pr = jnp_leapfrog(logp64, q64, p64)
        lp0_64 = logp64(q64)
        lpL_64 = logp64(qr)

    # TPU f32 jnp trajectory for the calibration arm.
    logp32 = make_logp(chain)
    q32, p32 = jnp_leapfrog(logp32, q0, p0)
    _gate(qf, q32, qr, "leapfrog q", slack=6.0, floor_rel=1e-4)
    _gate(pf, p32, pr, "leapfrog p", slack=6.0, floor_rel=1e-4)
    _gate(lp0, logp32(q0), lp0_64, "leapfrog logp0", slack=6.0,
          floor_rel=1e-4)
    _gate(lpL, logp32(q32), lpL_64, "leapfrog logpL", slack=6.0,
          floor_rel=5e-4)


def test_householder_dense_vs_scan_on_hardware(cpu):
    """Both Householder execution paths (scan custom-VJP and dense
    collapse-to-Q MXU) vs the f64 dense oracle, on the chip."""
    from enflows_tpu.bijectors.householder import (
        householder_chain, householder_chain_dense)

    d, k, n = 16, 8, 1024
    V = jax.random.normal(jax.random.PRNGKey(7), (k, d), F)
    h = ef.Householder(V=V).canonicalize()
    x = jax.random.normal(jax.random.PRNGKey(8), (n, d), F)
    y_scan = householder_chain(h.V, x)
    y_dense = householder_chain_dense(h.V, x)
    with x64_cpu(cpu):
        h64 = to64(h)
        y_64 = householder_chain(
            h64.V, jnp.asarray(np.asarray(x, np.float64)))
    _gate(y_scan, y_dense, y_64, "householder scan", slack=8.0)
    _gate(y_dense, y_scan, y_64, "householder dense", slack=8.0)


def test_fused_coupling_stack_on_hardware(cpu):
    """The whole-stack fused coupling kernel (ops.pallas.coupling) vs the
    f64 CPU oracle — MXU matmuls at DEFAULT precision are the same
    numerics class as the jnp path's, so the calibrated gate applies."""
    from enflows_tpu.bijectors import coupling_stack
    from enflows_tpu.ops.pallas.coupling import (
        fused_coupling_forward_and_ladj, is_fusible_coupling_stack)

    dim = 16
    stack = coupling_stack(jax.random.PRNGKey(20), dim, n_layers=3,
                           hidden=(64, 64))
    stack = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(p.size % 97), p.shape, p.dtype), stack)
    assert is_fusible_coupling_stack(stack, dim)
    x = jax.random.normal(jax.random.PRNGKey(21), (2048, dim), F)

    y_k, l_k = fused_coupling_forward_and_ladj(stack, x)
    y_j, l_j = stack.forward_and_ladj(x)
    with x64_cpu(cpu):
        y_64, l_64 = to64(stack).forward_and_ladj(
            jnp.asarray(np.asarray(x, np.float64)))
    _gate(y_k, y_j, y_64, "coupling y", slack=6.0, floor_rel=1e-3)
    _gate(l_k, l_j, l_64, "coupling ladj", slack=6.0, floor_rel=1e-3)

    # Round trip through the kernel on hardware: the error floor is
    # mathematical (affine rounding amplified by e^{|s|} per layer, the
    # same in any implementation), so the gate is calibrated against the
    # jnp path's own round-trip error on the identical stack.
    xb, _ = fused_coupling_forward_and_ladj(stack.inverse(), y_k)
    xbj = stack.inverse().forward(y_j)
    e_k = np.abs(np.asarray(xb, np.float64)
                 - np.asarray(x, np.float64)).max()
    e_j = np.abs(np.asarray(xbj, np.float64)
                 - np.asarray(x, np.float64)).max()
    assert e_k <= max(4.0 * e_j, 1e-4), (e_k, e_j)


def test_fused_spline_stack_on_hardware(cpu):
    """The fused coupling kernel's RQ-SPLINE leg vs the f64 CPU oracle on
    the chip — the slab-layout epilogue (softmax knots, one-hot bin
    selects, stable two-root inverse) has no CPU-interpret coverage of
    its Mosaic lowering, exactly the round-2 escape class."""
    from enflows_tpu.bijectors import spline_coupling_stack
    from enflows_tpu.ops.pallas.coupling import (
        fused_coupling_forward_and_ladj, is_fusible_coupling_stack)

    dim = 16
    stack = spline_coupling_stack(jax.random.PRNGKey(30), dim,
                                  n_layers=3, hidden=(64, 64), n_bins=8)
    stack = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(p.size % 97), p.shape, p.dtype), stack)
    assert is_fusible_coupling_stack(stack, dim)
    x = jax.random.normal(jax.random.PRNGKey(31), (2048, dim), F)

    y_k, l_k = fused_coupling_forward_and_ladj(stack, x)
    y_j, l_j = stack.forward_and_ladj(x)
    with x64_cpu(cpu):
        y_64, l_64 = to64(stack).forward_and_ladj(
            jnp.asarray(np.asarray(x, np.float64)))
    _gate(y_k, y_j, y_64, "spline y", slack=6.0, floor_rel=1e-3)
    _gate(l_k, l_j, l_64, "spline ladj", slack=6.0, floor_rel=1e-3)

    # Inverse leg on hardware (fresh, well-conditioned inputs — the
    # bound-squashed regime is f32-ill-conditioned on every path):
    inv = stack.inverse()
    z = jax.random.normal(jax.random.PRNGKey(32), (2048, dim), F)
    yi_k, li_k = fused_coupling_forward_and_ladj(inv, z)
    yi_j, li_j = inv.forward_and_ladj(z)
    with x64_cpu(cpu):
        yi_64, li_64 = to64(inv).forward_and_ladj(
            jnp.asarray(np.asarray(z, np.float64)))
    _gate(yi_k, yi_j, yi_64, "spline inv y", slack=6.0, floor_rel=1e-3)
    _gate(li_k, li_j, li_64, "spline inv ladj", slack=6.0,
          floor_rel=1e-3)


def test_multirow_packed_on_hardware(cpu):
    """d > 128 multirow layout on the chip: fwd/ladj and the Pallas
    backward vs the f64 CPU oracle (round-4 layout; CPU interpret mode
    cannot see its Mosaic lowering)."""
    from enflows_tpu.ops.pallas.elementwise import (
        fused_forward_and_ladj_packed, is_fusible_chain)

    d = 256
    v = lambda val: jnp.full((d,), val, F)
    key = jax.random.PRNGKey(30)
    chain = ef.compose(
        ef.Johnson(gamma=v(0.3), delta=v(5.0), xi=v(0.0), lam=v(5.0)),
        ef.invert(ef.CenterStretch(a=v(1.0), b=v(1.5), c=v(0.1))),
        ef.ScaleShift(a=1.0 + 0.5 * jax.random.uniform(key, (d,), F),
                      b=v(-0.2)),
    )
    assert is_fusible_chain(chain, d, F)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1024, d), F)
    y_k, l_k = fused_forward_and_ladj_packed(chain, x.reshape(-1), d)
    y_j, l_j = chain.forward_and_ladj(x)
    with x64_cpu(cpu):
        y_64, l_64 = to64(chain).forward_and_ladj(
            jnp.asarray(np.asarray(x, np.float64)))
    _gate(np.asarray(y_k).reshape(1024, d), y_j, y_64, "multirow y")
    _gate(l_k, l_j, l_64, "multirow ladj")

    def loss_k(c):
        y, l = fused_forward_and_ladj_packed(c, x.reshape(-1), d)
        return jnp.sum(jnp.sin(y)) + jnp.sum(l * l)

    def loss_j(c):
        y, l = c.forward_and_ladj(x)
        return jnp.sum(jnp.sin(y.reshape(-1))) + jnp.sum(l * l)

    gk = jax.grad(loss_k)(chain)
    gj = jax.grad(loss_j)(chain)
    with x64_cpu(cpu):
        g64 = jax.grad(loss_j)(to64(chain))
    for a, b, c in zip(jax.tree.leaves(gk), jax.tree.leaves(gj),
                       jax.tree.leaves(g64)):
        _gate(a, b, c, "multirow grad", slack=6.0, floor_rel=5e-5)


def test_fused_vg_route_on_hardware(cpu):
    """FlowPushforwardTarget.batched_value_and_grad (the NUTS/HMC fused
    gradient route) on the chip vs f64 CPU oracles."""
    from enflows_tpu.mcmc import FlowPushforwardTarget

    d = 50
    v = lambda val: jnp.full((d,), val, F)
    transport = ef.compose(
        ef.ScaleShift(a=1.0 + 0.5 * jax.random.uniform(
            jax.random.PRNGKey(31), (d,), F), b=v(0.3)),
        ef.invert(ef.Johnson(gamma=v(0.0), delta=v(5.0), xi=v(0.0),
                             lam=v(5.0))),
    )
    target = FlowPushforwardTarget(transport)
    vg = target.batched_value_and_grad(d)
    assert vg is not None
    q = jax.random.normal(jax.random.PRNGKey(32), (256, d), F)
    lp_k, g_k = jax.vmap(vg)(q)
    lp_j, g_j = jax.vmap(jax.value_and_grad(target.__call__))(q)
    with x64_cpu(cpu):
        t64 = FlowPushforwardTarget(to64(transport))
        lp64, g64 = jax.vmap(jax.value_and_grad(t64.__call__))(
            jnp.asarray(np.asarray(q, np.float64)))
    _gate(lp_k, lp_j, lp64, "vg logp", slack=6.0, floor_rel=1e-4)
    _gate(g_k, g_j, g64, "vg grad", slack=6.0, floor_rel=1e-4)


def test_fused_train_under_shard_map_on_hardware(cpu):
    """Fused kernels UNDER the mesh (VERDICT r4 next #1), compiled on the
    real chip: optimize_whitening with a (1-device) batch mesh keeps the
    packed-kernel dispatch inside jax.shard_map and matches the
    unsharded fused run. n>1-shard equivalence is gated on the 8-device
    CPU mesh (tests/test_parallel.py); this row proves the pallas_call +
    shard_map + pmean composition lowers and runs ON HARDWARE."""
    import optax
    from enflows_tpu.parallel import make_mesh
    from enflows_tpu.train import optimize_whitening

    d = 2
    chain = chain_for(d)
    X = 1.2 * jax.random.normal(jax.random.PRNGKey(12), (1 << 17, d), F)
    mesh = make_mesh({"batch": 1}, axis_name="batch")
    r_sh = optimize_whitening(X, chain, optax.adagrad(0.05), nbatches=2,
                              nepochs=2, mesh=mesh)
    r_un = optimize_whitening(X, chain, optax.adagrad(0.05), nbatches=2,
                              nepochs=2)
    # Auto dispatch must have selected the fused path on BOTH sides
    # (batch 64K x d=2 over 1 shard clears the 1<<16 element threshold);
    # equality of histories to f32 tolerance proves the same math ran.
    np.testing.assert_allclose(np.asarray(r_sh.negll_history),
                               np.asarray(r_un.negll_history),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(r_sh.result),
                    jax.tree.leaves(r_un.result)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_coupling_pallas_backward_on_hardware(cpu):
    """The PALLAS coupling backward (round 5: recompute-in-VMEM vjp
    under the raised vmem limit) vs f64 CPU AD, compiled on the chip —
    affine and spline stacks. The escape class: a backward that is
    valid in CPU interpret mode but OOMs or mis-lowers under Mosaic."""
    from enflows_tpu.bijectors import coupling_stack, spline_coupling_stack
    from enflows_tpu.ops.pallas.coupling import (
        fused_coupling_forward_and_ladj, _pick_tile_bwd, _stack_plan)

    dim = 16
    for name, stack in [
        ("affine", coupling_stack(jax.random.PRNGKey(30), dim,
                                  n_layers=2, hidden=(64, 64))),
        ("spline", spline_coupling_stack(jax.random.PRNGKey(31), dim,
                                         n_layers=2, hidden=(64, 64),
                                         n_bins=8)),
    ]:
        stack = jax.tree.map(
            lambda p: p + 0.05 * jax.random.normal(
                jax.random.PRNGKey(p.size % 89), p.shape, p.dtype), stack)
        with jax.ensure_compile_time_eval():
            plan = _stack_plan(stack, dim)
            assert _pick_tile_bwd(plan[0], plan[1], dim) is not None, \
                f"{name}: pallas backward must be in reach at this size"
        x = 0.8 * jax.random.normal(jax.random.PRNGKey(32), (1024, dim), F)

        def loss(c, xx, fwd):
            y, l = fwd(c, xx)
            return jnp.sum(jnp.sin(y)) + 2.0 * jnp.sum(l)

        gk = jax.grad(loss, argnums=(0, 1))(
            stack, x, fused_coupling_forward_and_ladj)
        gj = jax.grad(loss, argnums=(0, 1))(
            stack, x, lambda c, xx: c.forward_and_ladj(xx))
        with x64_cpu(cpu):
            g64 = jax.grad(loss, argnums=(0, 1))(
                to64(stack), jnp.asarray(np.asarray(x, np.float64)),
                lambda c, xx: c.forward_and_ladj(xx))
        for a, b, c in zip(jax.tree.leaves(gk), jax.tree.leaves(gj),
                           jax.tree.leaves(g64)):
            _gate(a, b, c, f"{name} pallas-bwd grad", slack=8.0,
                  floor_rel=2e-4)
