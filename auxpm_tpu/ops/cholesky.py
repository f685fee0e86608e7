"""Cholesky factorisation + whitening for the GP estimator path.

Reference analogue: scipy ``cholesky``/``cho_solve`` wrappers (SURVEY.md
§2.1 "Cholesky / whitening").  TPU design: ``jnp.linalg.cholesky`` lowers to
XLA's blocked TPU Cholesky; batching over chains is ``vmap`` (XLA batches the
factorisations).  Whitening f_s = C @ u_s for all S importance samples is a
single MXU matmul ``u @ C.T`` — O(S n²) in one fused op rather than S
triangular solves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


import functools

from jax import custom_batching


@custom_batching.custom_vmap
def _chol_dispatch(a):
    """Cholesky whose vmap rule collects the chain batch.

    The samplers are vmapped per-chain functions, so a plain
    ``jnp.linalg.cholesky`` inside them becomes XLA's batched Cholesky
    (~587 GFLOP/s at B=128, n=640 on v5e).  This custom_vmap rule routes
    the BATCHED call to the Pallas blocked factorisation
    (ops/chol_pallas.cholesky_batched3 mini-panel kernel: ~1.50 TFLOP/s,
    2.55x XLA, measured 2026-08-19 with host-transfer sync) on TPU when
    shapes are tile-aligned; single-matrix calls and CPU stay on XLA.
    """
    return jnp.linalg.cholesky(a)


@_chol_dispatch.def_vmap
def _chol_dispatch_vmap(axis_size, in_batched, a):
    del axis_size
    from auxpm_tpu.ops import chol_pallas

    n = a.shape[-1]
    if (
        chol_pallas.on_tpu()
        and chol_pallas.pltpu is not None
        and n % chol_pallas.BLK == 0
        and a.ndim >= 3
    ):
        batch = a.shape[:-2]
        flat = a.reshape((-1, n, n))
        l = chol_pallas.cholesky_batched3(flat, 32).reshape(batch + (n, n))
    else:
        l = jnp.linalg.cholesky(a)
    return l, in_batched[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def robust_cholesky(gram, jitter0=0.0, growth=10.0, max_tries=3):
    """Cholesky with automatic diagonal-jitter escalation on failure.

    f32 Cholesky of a marginally-conditioned SPD matrix can produce NaN
    factors (negative pivot from rounding; the TPU implementation fails at
    condition numbers LAPACK handles).  This wrapper retries with the
    diagonal boosted by ``jitter0 * growth^k`` (relative to the mean
    diagonal when jitter0=0 -> uses 1e-6 * mean-diag as the base) until the
    factor is finite, up to ``max_tries`` escalations inside a
    ``lax.while_loop`` — deterministic in the input matrix, so estimators
    built on it remain valid pseudo-marginal estimators (the escalated
    nugget is part of the model at that theta).  Typical case: zero
    escalations, one factorisation.

    Reverse-mode differentiable via custom_vjp (``lax.while_loop`` is not):
    the backward pass replays the standard Cholesky pullback at the chosen
    shift — gradients of the shift choice itself are zero a.e., exactly as
    for any piecewise definition.
    """
    l, _ = _robust_cholesky_impl(gram, jitter0, growth, max_tries)
    return l


def _robust_cholesky_impl(gram, jitter0, growth, max_tries):
    n = gram.shape[-1]
    eye = jnp.eye(n, dtype=gram.dtype)
    # base is PER-MATRIX (shape = gram's batch dims, () when unbatched):
    # escalation is independent across explicitly batched inputs, so a sick
    # matrix never inflates the jitter of its healthy batch-mates.
    mean_diag = jnp.mean(jnp.diagonal(gram, axis1=-2, axis2=-1), axis=-1)
    base = jnp.where(
        jnp.asarray(jitter0, gram.dtype) > 0,
        jnp.full_like(mean_diag, jitter0),
        1e-6 * mean_diag,
    )

    def bad(l):
        # per-matrix failure flag, same shape as base
        return ~jnp.isfinite(jnp.diagonal(l, axis1=-2, axis2=-1)).all(axis=-1)

    def shift(extra):
        return gram + extra[..., None, None] * eye

    l0 = _chol_dispatch(gram)

    def cond(carry):
        i, _, l = carry
        return jnp.logical_and(i < max_tries, bad(l).any())

    def body(carry):
        i, extra, l = carry
        # first escalation applies jitter0/base itself, then grows 10x
        extra = jnp.where(bad(l), jnp.where(extra > 0, extra * growth, base), extra)
        return i + 1, extra, _chol_dispatch(shift(extra))

    _, extra, l = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros_like(base), l0)
    )
    return l, extra


def _robust_cholesky_fwd(gram, jitter0, growth, max_tries):
    l, extra = _robust_cholesky_impl(gram, jitter0, growth, max_tries)
    return l, (gram, extra)


def _robust_cholesky_bwd(jitter0, growth, max_tries, res, lbar):
    gram, extra = res
    n = gram.shape[-1]
    eye = jnp.eye(n, dtype=gram.dtype)
    # pullback of plain cholesky at the shifted matrix; d(shift)/d(gram)=I
    _, pullback = jax.vjp(
        jnp.linalg.cholesky, gram + extra[..., None, None] * eye
    )
    (gbar,) = pullback(lbar)
    return (gbar,)


robust_cholesky.defvjp(_robust_cholesky_fwd, _robust_cholesky_bwd)


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
