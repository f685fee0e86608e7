"""Exact (non-pseudo-marginal) targets — for validating HMC/NUTS alone.

A Target whose ``log_lik_est`` ignores u lets the gradient-based kernels be
tested against closed-form posteriors without estimator noise in the way
(SURVEY.md §4.3).  ``u_shape`` is a dummy (1, 1) block.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from auxpm_tpu.models.base import Target


def make_mvn_target(mean, cov, dtype=jnp.float32):
    """Multivariate-normal target with exact moments attached."""
    mean = np.asarray(mean, np.float64)
    cov = np.asarray(cov, np.float64)
    prec = np.linalg.inv(cov)
    d = mean.shape[0]
    mean_j = jnp.asarray(mean, dtype)
    prec_j = jnp.asarray(prec, dtype)

    def log_prior(theta):
        r = theta - mean_j
        return -0.5 * r @ prec_j @ r

    def log_lik_est(theta, u):
        return jnp.asarray(0.0, dtype)

    return Target(
        d=d,
        u_shape=(1, 1),
        log_prior=log_prior,
        log_lik_est=log_lik_est,
        theta_init=jnp.zeros((d,), dtype),
        name="mvn_exact",
        posterior_mean=jnp.asarray(mean, dtype),
        posterior_cov=jnp.asarray(cov, dtype),
    )
