"""MCMC diagnostics: effective sample size and split-R-hat.

No reference counterpart (SURVEY.md §5 metrics row). ESS follows the
Geyer initial-monotone-sequence estimator on FFT autocovariances (the
Stan/ArviZ standard); R-hat is the split-chain potential scale reduction
factor (Vehtari et al. 2021 without rank-normalization).

Shapes: samples are (chains, steps) per scalar quantity, or
(chains, steps, dim) handled per-dimension.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _autocov_fft(x: np.ndarray) -> np.ndarray:
    """Autocovariance per chain via FFT; x (chains, steps)."""
    n = x.shape[1]
    xc = x - x.mean(axis=1, keepdims=True)
    m = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, m, axis=1)
    acov = np.fft.irfft(f * np.conj(f), m, axis=1)[:, :n].real
    return acov / n


def ess(samples) -> float:
    """Bulk ESS of a (chains, steps) scalar chain set."""
    x = np.asarray(samples, np.float64)
    nchains, nsteps = x.shape
    acov = _autocov_fft(x)                       # (chains, steps)
    chain_var = acov[:, 0] * nsteps / (nsteps - 1.0)
    mean_var = np.mean(chain_var)
    var_plus = mean_var * (nsteps - 1.0) / nsteps
    if nchains > 1:
        var_plus += np.var(x.mean(axis=1), ddof=1)

    rho = 1.0 - (mean_var - np.mean(acov, axis=0)) / var_plus   # (steps,)
    # Geyer: sum consecutive pairs while positive, enforce monotonicity.
    max_t = nsteps - (nsteps % 2)
    pair = rho[:max_t].reshape(-1, 2).sum(axis=1)
    # truncate at first negative pair
    neg = np.nonzero(pair < 0)[0]
    cutoff = neg[0] if neg.size else pair.size
    pair = pair[:cutoff]
    # initial monotone sequence
    pair = np.minimum.accumulate(pair) if pair.size else pair
    tau = -1.0 + 2.0 * pair.sum()
    tau = max(tau, 1.0 / np.log10(nsteps + 10.0))  # guard
    return float(nchains * nsteps / tau)


def ess_per_dim(samples) -> np.ndarray:
    """ESS per dimension for samples (chains, steps, dim)."""
    x = np.asarray(samples)
    return np.array([ess(x[..., d]) for d in range(x.shape[-1])])


def split_rhat(samples) -> float:
    """Split-chain R-hat of (chains, steps) draws."""
    x = np.asarray(samples, np.float64)
    nchains, nsteps = x.shape
    half = nsteps // 2
    splits = np.concatenate([x[:, :half], x[:, half:2 * half]], axis=0)
    m, n = splits.shape
    chain_means = splits.mean(axis=1)
    b = n * np.var(chain_means, ddof=1)
    w = np.mean(np.var(splits, axis=1, ddof=1))
    var_plus = (n - 1.0) / n * w + b / n
    return float(np.sqrt(var_plus / w))


def split_rhat_per_dim(samples) -> np.ndarray:
    x = np.asarray(samples)
    return np.array([split_rhat(x[..., d]) for d in range(x.shape[-1])])


def bfmi(energies) -> float:
    """Bayesian fraction of missing information (Betancourt 2016).

    energies: (chains, steps) per-transition total Hamiltonian energies at
    the accepted states (``HMCInfo.energy`` / ``NUTSInfo.energy`` /
    ``ChEESInfo.energy`` — potential *plus* kinetic). Values << 0.3
    indicate the momentum resampling can't explore the energy marginal —
    heavy tails the mass matrix can't fix.
    """
    e = np.asarray(energies, np.float64)
    de = np.diff(e, axis=1)
    return float(np.mean(de ** 2) / np.var(e))
