"""2-D Gaussian toy target with a noisy-but-unbiased IS likelihood estimator.

BASELINE.json:7 (config 1): "2D Gaussian target, pseudo-marginal MH with 16
importance samples, 4 chains (CPU-runnable PR1 ref)".  The construction
(SURVEY.md §2.1 "Gaussian toy target") gives a closed-form posterior so
estimator noise vs. mixing can be studied exactly:

  prior:       theta ~ N(0, prior_var I_2)
  likelihood:  p(y | theta) = N(y; theta, Sigma_y)   (y fixed data)
  estimator:   decompose Sigma_y = sigma_n^2 I + A A^T and estimate the
               convolution integral
                 p(y|theta) = ∫ N(y; z, sigma_n^2 I) N(z; theta, A A^T) dz
               by importance sampling with S draws z_s = theta + A u_s,
               u_s ~ N(0, I_2):
                 log L̂(theta, u) = logsumexp_s log N(y; theta + A u_s,
                                                      sigma_n^2 I) - log S.
  E[exp(log L̂)] = p(y|theta) exactly, for every S — unbiased in L, not in
  log L (fine for pseudo-marginal MCMC; Andrieu & Roberts 2009).

``noise_frac`` in (0, 1) sets sigma_n^2 = noise_frac * min_eig(Sigma_y);
smaller => noisier estimator => stickier PM-MH, which is the pathology the
auxiliary slice method fixes (Murray & Graham 2016 §2).

The posterior is conjugate:  Lambda = I/prior_var + Sigma_y^{-1},
mean = Lambda^{-1} Sigma_y^{-1} y, cov = Lambda^{-1}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from auxpm_tpu.models.base import Target
from auxpm_tpu.ops.logsumexp import logsumexp

_LOG_2PI = float(np.log(2.0 * np.pi))


def make_gaussian_toy(
    n_importance: int = 16,
    noise_frac: float = 0.3,
    prior_var: float = 4.0,
    y=(1.0, -0.5),
    sigma_y=((1.0, 0.4), (0.4, 0.8)),
    dtype=jnp.float32,
) -> Target:
    y = jnp.asarray(y, dtype)
    sigma_y = jnp.asarray(sigma_y, dtype)
    d = y.shape[0]

    eigvals = np.linalg.eigvalsh(np.asarray(sigma_y, np.float64))
    sigma_n2 = float(noise_frac * eigvals.min())
    # A A^T = Sigma_y - sigma_n^2 I  (positive definite by construction)
    a_mat = jnp.asarray(
        np.linalg.cholesky(np.asarray(sigma_y, np.float64) - sigma_n2 * np.eye(d)),
        dtype,
    )

    log_norm = -0.5 * d * (_LOG_2PI + float(np.log(sigma_n2)))

    def log_prior(theta):
        return -0.5 * jnp.sum(theta * theta) / prior_var - 0.5 * d * (
            _LOG_2PI + jnp.log(jnp.asarray(prior_var, dtype))
        )

    def log_weights_u(theta, u):
        # z_s = theta + A u_s ; w_s = N(y; z_s, sigma_n^2 I)
        z = theta[None, :] + u @ a_mat.T  # (S, d)
        sq = jnp.sum((y[None, :] - z) ** 2, axis=-1)  # (S,)
        return log_norm - 0.5 * sq / sigma_n2

    def log_lik_est(theta, u):
        return logsumexp(log_weights_u(theta, u), axis=0) - jnp.log(
            jnp.asarray(float(u.shape[0]), dtype)
        )

    # Closed-form posterior moments (float64 on host for accuracy).
    sy = np.asarray(sigma_y, np.float64)
    lam = np.eye(d) / prior_var + np.linalg.inv(sy)
    cov = np.linalg.inv(lam)
    mean = cov @ np.linalg.solve(sy, np.asarray(y, np.float64))

    def exact_log_post(theta):
        r = theta - jnp.asarray(mean, dtype)
        return -0.5 * r @ jnp.asarray(lam, dtype) @ r

    return Target(
        d=d,
        u_shape=(n_importance, d),
        log_prior=log_prior,
        log_lik_est=log_lik_est,
        theta_init=jnp.zeros((d,), dtype),
        name="gaussian_toy",
        exact_log_post=exact_log_post,
        posterior_mean=jnp.asarray(mean, dtype),
        posterior_cov=jnp.asarray(cov, dtype),
        sample_prior=lambda key: jnp.sqrt(jnp.asarray(prior_var, dtype))
        * jax.random.normal(key, (d,), dtype),
        prepare=lambda theta: theta,  # no theta-only precomputation to cache
        log_lik_est_u=lambda theta, u: log_lik_est(theta, u),
        log_weights_u=log_weights_u,
    )
