"""Cholesky factorisation + whitening for the GP estimator path.

Reference analogue: scipy ``cholesky``/``cho_solve`` wrappers (SURVEY.md
§2.1 "Cholesky / whitening").  TPU design: ``jnp.linalg.cholesky`` lowers to
XLA's blocked TPU Cholesky; batching over chains is ``vmap`` (XLA batches the
factorisations).  Whitening f_s = C @ u_s for all S importance samples is a
single MXU matmul ``u @ C.T`` — O(S n²) in one fused op rather than S
triangular solves.
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_with_jitter(gram, jitter=0.0):
    """Lower-triangular Cholesky; caller is responsible for jitter policy
    (the Gram builders already add a fixed diagonal jitter)."""
    if jitter:
        gram = gram + jitter * jnp.eye(gram.shape[-1], dtype=gram.dtype)
    return jnp.linalg.cholesky(gram)


def whiten(chol, u):
    """Map whitened draws u (S, n) to latent draws f = (C @ u_s)_s = u @ C.T."""
    return u @ chol.T


def chol_logdet(chol):
    """log |K| from its Cholesky factor (2 * sum log diag)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
