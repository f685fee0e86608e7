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


# ---------------------------------------------------------------------------
# Elementwise derivatives (for the Laplace approximate-posterior proposal)
# ---------------------------------------------------------------------------
#
# The Newton mode-finding of models/laplace.py needs, per data point,
#   g_i = d/df_i log p(y_i | f_i)   and   w_i = -d²/df_i² log p(y_i | f_i),
# both elementwise because the likelihood factorises over points.  Closed
# forms (stable):
#   logistic: g = y sigma(-y f);           w = sigma(f) sigma(-f)
#   probit:   r = phi(z)/Phi(z), z = y f;  g = y r;  w = r (r + z)
# with the probit ratio computed from the stable log Phi (its gradient),
# which stays finite in the far-left tail where phi and Phi both underflow.


def logistic_grad_hess(f, y, mask=None):
    """(g, w) for the logistic likelihood; shapes follow ``f``."""
    g = y * jax.nn.sigmoid(-y * f)
    w = jax.nn.sigmoid(f) * jax.nn.sigmoid(-f)
    if mask is not None:
        g, w = g * mask, w * mask
    return g, w


def probit_grad_hess(f, y, mask=None):
    """(g, w) for the probit likelihood via the stable phi/Phi ratio."""
    z = y * f
    log_phi = -0.5 * z * z - 0.5 * jnp.log(2.0 * jnp.pi)
    log_Phi = jnp.log(0.5 * jax.lax.erfc(-z * _INV_SQRT2))
    tail = -0.5 * z * z - 0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(-z + 1e-30)
    log_Phi = jnp.where(z < -8.0, tail, log_Phi)
    r = jnp.exp(log_phi - log_Phi)  # phi(z)/Phi(z); -> -z as z -> -inf
    g = y * r
    w = r * (r + z)
    if mask is not None:
        g, w = g * mask, w * mask
    return g, jnp.maximum(w, 0.0)


LIKELIHOOD_GRAD_HESS = {
    "logistic": logistic_grad_hess,
    "probit": probit_grad_hess,
}
