"""One-call inference API tests: infer() end-to-end on known targets.

Covers the raw path, auto flow preconditioning (VI transport), explicit
flow injection, ChEES and SMC methods, and the diagnostics summary keys.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import enflows_tpu as ef

DT = jnp.float64

MU = jnp.asarray([1.5, -0.5], DT)
SD = jnp.asarray([1.0, 2.0], DT)


def _gauss_logp(q):
    return -0.5 * jnp.sum(((q - MU) / SD) ** 2)


def test_infer_raw_nuts_moments_and_diagnostics():
    res = ef.infer(_gauss_logp, dim=2, key=jax.random.PRNGKey(0),
                   precondition=None, num_chains=8, num_warmup=300,
                   num_samples=400, dtype=DT)
    assert res.flow is None
    assert res.draws.shape == (8, 400, 2)
    d = res.diagnostics
    np.testing.assert_allclose(d["mean"], np.asarray(MU), atol=0.12)
    np.testing.assert_allclose(d["sd"], np.asarray(SD), rtol=0.12)
    assert np.all(d["rhat"] < 1.05)
    assert d["min_bulk_ess"] > 200
    assert np.all(d["tail_ess"] > 100)
    assert d["divergences"] == 0
    assert 0.5 < d["accept_prob"] <= 1.0
    assert 0.5 < d["bfmi"] < 2.0


def test_infer_auto_preconditioned():
    res = ef.infer(_gauss_logp, dim=2, key=jax.random.PRNGKey(1),
                   precondition="auto", vi_steps=300, vi_batch=256,
                   num_chains=8, num_warmup=200, num_samples=400,
                   dtype=DT)
    assert res.flow is not None   # a transport was fitted and used
    d = res.diagnostics
    np.testing.assert_allclose(d["mean"], np.asarray(MU), atol=0.15)
    np.testing.assert_allclose(d["sd"], np.asarray(SD), rtol=0.15)
    assert np.all(d["rhat"] < 1.05)
    # A well-fitted transport whitens the target: near-unit step geometry,
    # high per-draw efficiency.
    assert d["min_bulk_ess"] > 0.5 * 8 * 400


def test_infer_explicit_flow():
    # Exact whitened->data map: draws in whitened space are N(0, I).
    flow = ef.ScaleShift(a=SD, b=MU)
    res = ef.infer(_gauss_logp, dim=2, key=jax.random.PRNGKey(2),
                   flow=flow, num_chains=4, num_warmup=200,
                   num_samples=300, dtype=DT)
    assert res.flow is flow
    np.testing.assert_allclose(res.diagnostics["mean"], np.asarray(MU),
                               atol=0.15)
    np.testing.assert_allclose(res.diagnostics["sd"], np.asarray(SD),
                               rtol=0.15)


def test_infer_chees():
    res = ef.infer(_gauss_logp, dim=2, key=jax.random.PRNGKey(3),
                   method="chees", precondition=None, num_chains=32,
                   num_warmup=300, num_samples=200, dtype=DT)
    d = res.diagnostics
    np.testing.assert_allclose(d["mean"], np.asarray(MU), atol=0.15)
    assert np.all(d["rhat"] < 1.1)


def test_infer_smc_logz():
    res = ef.infer(_gauss_logp, dim=2, key=jax.random.PRNGKey(4),
                   method="smc", precondition=None, num_particles=4096,
                   dtype=DT)
    d = res.diagnostics
    np.testing.assert_allclose(d["mean"], np.asarray(MU), atol=0.15)
    # True log Z = integral of the unnormalized Gaussian:
    # (d/2) log(2*pi) + sum(log sd).
    true_logz = 0.5 * 2 * np.log(2 * np.pi) + float(jnp.sum(jnp.log(SD)))
    np.testing.assert_allclose(d["log_z"], true_logz, atol=0.1)
    assert d["weight_ess"] > 1000
    assert res.draws.shape == (4096, 2)
