"""Latent-GP binary classification posterior over kernel hyperparameters.

The paper's main experiment family (BASELINE.json:8-9, SURVEY.md §3.4):
binary labels y_i ∈ {-1, +1}, latent f ~ GP(0, K_theta) with a
squared-exponential kernel, Bernoulli likelihood (logistic or probit), and a
pseudo-marginal target over theta = kernel hyperparameters with the marginal
likelihood p(y|theta) = ∫ p(y|f) N(f; 0, K_theta) df estimated by
importance sampling from the GP prior:

    u ~ N(0, I_{S x n})           (auxiliary state, S importance samples)
    f_s = C_theta u_s             (whitening; C = chol(K + jitter I))
    log w_s = sum_i log lik(y_i f_si)
      [prior proposal => the N(f;0,K)/q(f) densities cancel exactly]
    log L̂(theta, u) = logsumexp_s log w_s - log S

Hot path decomposition (SURVEY.md §3.1): the estimator is split into

    prepare(theta) -> C          O(n² d) Gram + O(n³) Cholesky
    estimate(C, u) -> log L̂     O(S n²) MXU whiten + O(S n) loglik/lse

so the elliptical-slice update of u | theta — whose probes keep theta
fixed — pays ``prepare`` ONCE per step and only ``estimate`` per probe,
while slice probes on theta pay the full path.  This is the single biggest
algorithmic win over a naive per-call implementation.

theta layout: ``[log_ell, log_sigma]`` (isotropic, default) or
``[log_ell_1..log_ell_d, log_sigma]`` (ARD).  Priors: independent
N(mu_p, sigma_p²) on each log-hyperparameter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from auxpm_tpu.models.base import Target
from auxpm_tpu.models.likelihoods import LIKELIHOODS
from auxpm_tpu.ops.cholesky import whiten
from auxpm_tpu.ops.gram import pairwise_sqdist, se_gram_ard, se_gram_iso
from auxpm_tpu.ops.logsumexp import logsumexp


def make_gp_classification(
    x,
    y,
    n_importance=64,
    likelihood="logistic",
    ard=False,
    jitter=1e-5,
    prior_mean=0.0,
    prior_std=1.5,
    dtype=jnp.float32,
    name=None,
):
    """Build the GP-classification pseudo-marginal ``Target``.

    Args:
      x: (n, d) standardized features.
      y: (n,) labels in {-1, +1}.
      n_importance: S, importance samples per estimate (BASELINE.json:8: 64).
      likelihood: "logistic" or "probit".
      ard: per-dimension lengthscales if True.
      jitter: diagonal nugget added to the Gram matrix before Cholesky.
    """
    x = jnp.asarray(x, dtype)
    y = jnp.asarray(y, dtype)
    n, d = x.shape
    log_lik_fn = LIKELIHOODS[likelihood]

    n_theta = (d + 1) if ard else 2
    sqdist = pairwise_sqdist(x) if not ard else None  # cached once per dataset

    def split_theta(theta):
        return theta[:-1] if ard else theta[0], theta[-1]

    def prepare(theta):
        log_ell, log_sigma = split_theta(theta)
        if ard:
            k = se_gram_ard(x, log_ell, log_sigma, jitter)
        else:
            k = se_gram_iso(sqdist, log_ell, log_sigma, jitter)
        return jnp.linalg.cholesky(k)

    def log_weights_u(chol, u):
        f = whiten(chol, u)  # (S, n) one MXU matmul
        return log_lik_fn(f, y[None, :])  # (S,)

    def log_lik_est_u(chol, u):
        return logsumexp(log_weights_u(chol, u), axis=0) - jnp.log(
            jnp.asarray(float(u.shape[0]), u.dtype)
        )

    def log_lik_est(theta, u):
        return log_lik_est_u(prepare(theta), u)

    def log_prior(theta):
        r = (theta - prior_mean) / prior_std
        return -0.5 * jnp.sum(r * r) - n_theta * (
            0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(jnp.asarray(prior_std, dtype))
        )

    return Target(
        d=n_theta,
        u_shape=(n_importance, n),
        log_prior=log_prior,
        log_lik_est=log_lik_est,
        theta_init=jnp.zeros((n_theta,), dtype),
        name=name or f"gp_{likelihood}_n{n}",
        prepare=prepare,
        log_lik_est_u=log_lik_est_u,
        log_weights_u=log_weights_u,
        sample_prior=lambda key: prior_mean
        + prior_std * jax.random.normal(key, (n_theta,), dtype),
    )
