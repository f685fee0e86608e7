"""Bernoulli classification likelihoods on latent GP values.

Reference analogue: rowwise ``log_lik(f, y)`` evaluated for importance
weights (SURVEY.md §2.1 "Likelihood models"); logistic and probit variants
as used in the paper's GP-classification experiments (Murray & Graham 2016
§5).  Labels are ±1; a ``mask`` lets padded datasets (TPU-aligned shapes)
contribute zero.

All functions are elementwise-stable:
  logistic: log sigma(y f) = -log1p(exp(-y f)) = -softplus(-y f)
  probit:   log Phi(y f) via erfc for numerical stability in the tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INV_SQRT2 = 0.7071067811865476


def logistic_log_lik(f, y, mask=None):
    """Sum_i log sigma(y_i f_i) along the last axis."""
    ll = -jax.nn.softplus(-y * f)
    if mask is not None:
        ll = ll * mask
    return jnp.sum(ll, axis=-1)


def probit_log_lik(f, y, mask=None):
    """Sum_i log Phi(y_i f_i) along the last axis (erfc-based, stable)."""
    z = y * f
    # log Phi(z) = log(0.5 * erfc(-z/sqrt(2))); use log_ndtr-style stable form
    ll = jnp.log(0.5 * jax.lax.erfc(-z * _INV_SQRT2))
    # far-left tail: erfc underflows; switch to asymptotic expansion
    tail = -0.5 * z * z - 0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(-z + 1e-30)
    ll = jnp.where(z < -8.0, tail, ll)
    if mask is not None:
        ll = ll * mask
    return jnp.sum(ll, axis=-1)


LIKELIHOODS = {"logistic": logistic_log_lik, "probit": probit_log_lik}
