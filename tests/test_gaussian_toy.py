"""PR1 exactness tests: estimator unbiasedness + PM-MH posterior recovery.

SURVEY.md §4.2 (unbiasedness, variance ~ 1/S) and §4.3 (closed-form moment
recovery on the Gaussian toy, BASELINE.json:7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.gaussian_toy import make_gaussian_toy
from auxpm_tpu.samplers.chain import run_chains
from auxpm_tpu.samplers.pm_mh import make_pm_mh
from auxpm_tpu.utils.diagnostics import effective_sample_size, potential_scale_reduction


def _mc_lik_mean(target, theta, key, n_rep):
    keys = jax.random.split(key, n_rep)
    us = jax.vmap(lambda k: jax.random.normal(k, target.u_shape))(keys)
    log_l = jax.vmap(lambda u: target.log_lik_est(jnp.asarray(theta), u))(us)
    return np.asarray(log_l, np.float64)


def test_estimator_unbiased_and_variance_shrinks():
    theta = np.array([0.3, -0.2], np.float32)
    stats = {}
    for s in (16, 256):
        target = make_gaussian_toy(n_importance=s)
        log_l = _mc_lik_mean(target, theta, jax.random.key(0), 4000)
        lik = np.exp(log_l)
        stats[s] = (lik.mean(), lik.std(ddof=1) / np.sqrt(len(lik)), lik.var(ddof=1))
    # Both S values estimate the SAME marginal likelihood -> means agree
    m16, se16, v16 = stats[16]
    m256, se256, v256 = stats[256]
    assert abs(m16 - m256) < 4 * np.hypot(se16, se256)
    # Variance decreases roughly like 1/S (allow generous slack)
    assert v256 < v16 / 4


def test_pm_mh_recovers_posterior_moments():
    target = make_gaussian_toy(n_importance=16, noise_frac=0.5)
    n_chains, n_steps, burn = 16, 4000, 1000
    states = init_chain_states(jax.random.key(1), target, n_chains, jitter_scale=0.5)
    step = make_pm_mh(target)
    states, recs, infos = run_chains(step, states, {"step_size": 0.6}, n_steps)

    theta = np.asarray(recs["theta"])[:, burn:, :]  # (chains, steps, d)
    acc = float(np.asarray(infos["accept"]).mean())
    assert 0.05 < acc < 0.9, f"degenerate acceptance rate {acc}"

    mean = theta.reshape(-1, 2).mean(0)
    cov = np.cov(theta.reshape(-1, 2).T)
    ess = effective_sample_size(theta)
    rhat = potential_scale_reduction(theta)

    exp_mean = np.asarray(target.posterior_mean, np.float64)
    exp_cov = np.asarray(target.posterior_cov, np.float64)
    # MC error bars from ESS
    se = np.sqrt(np.diag(exp_cov) / np.maximum(ess, 1.0))
    assert np.all(np.abs(mean - exp_mean) < 5 * se), (mean, exp_mean, se)
    assert np.all(np.abs(np.diag(cov) - np.diag(exp_cov)) < 0.35 * np.diag(exp_cov))
    assert np.all(rhat < 1.1), rhat


def test_chain_reproducible_and_thinning():
    target = make_gaussian_toy()
    states = init_chain_states(jax.random.key(2), target, 4)
    step = make_pm_mh(target)
    _, r1, _ = run_chains(step, states, {"step_size": 0.5}, 100, thin=10)
    _, r2, _ = run_chains(step, states, {"step_size": 0.5}, 100, thin=10)
    assert r1["theta"].shape == (4, 10, 2)
    np.testing.assert_array_equal(np.asarray(r1["theta"]), np.asarray(r2["theta"]))
