"""Whole-sigma-slice fused kernel: the log_sigma bracket-shrink loops in Pallas.

Round-5 slice-theta fusion, sibling of ops/ess_sweep.py.  The GP target's
log_sigma coordinate is Cholesky-free (sigma separability: chol(K) =
exp(log_sigma) chol(R + jitter I), models/gp_classification.py), but each of
its slice probes was still a SEPARATE fused-estimator dispatch (~1.6 ms at
the bench shape) under the vmapped ``lax.while_loop`` — every chain paying
the WORST lane's shrink count (E[max over 128 chains] ~ 7 where the mean
useful count is ~2).  This kernel runs ALL ``1 + n_sigma_extra`` log_sigma
slice updates of a step as ONE pallas_call per chain with the carried factor
C0 = chol(R + jitter I) resident in VMEM:

    per probe at candidate x:  C_x = exp(x) * C0   (VPU scale, in VMEM)
                               f   = u @ C_x^T     (MXU, full width)
                               ll  = blocked-lse(loglik(f)) - log S
                               lp  = lp_rest - hiv (x - mu)^2 + ll

so each chain executes exactly its own probe count and HBM traffic is one
read of (C0, u) per SWEEP, probe-count independent.

Estimator identity: the probe computes the IDENTICAL estimator expression
as the per-probe path (``log_lik_est_u(exp(x) * chol0, u)`` — same
``_dot_whiten`` contraction, same ``_blocked_lse_lw`` reduction; the scale
happens before the matmul exactly as in the sigma coordinate factory), so
the carried log L-hat stays one fixed function of (theta, u).  The PRIOR
term is evaluated from the decomposition ``log_prior(theta) =
lp_rest - hiv (x - mu)^2`` instead of the full d-term sum — identical to
~1 ulp, so which path runs is part of the realized float TRAJECTORY (same
caveat as the ESS sweep kernel, samplers/ess_u.py trajectory note); the
sampled chain LAW is identical because the randomness rows are filled with
the exact key discipline of samplers/slice_theta._slice_1d_aux.

Shrinkage-only variant (max_step_out == 0, the measured bench default —
BASELINE.md): the kernel path is taken only then; step-out runs fall back
to the per-probe loop.  Cap-hit keeps the current point (exact no-op).

CPU / non-TPU backends use a jnp reference implementing the same sweep
(exactness tests); ``interpret=True`` runs the kernel in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from auxpm_tpu.ops.fused_estimator import (
    _blocked_lse_lw,
    _dot_whiten,
    _log_lik_tile,
    _on_tpu,
)

try:  # pltpu importable only with a TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

MAX_SHRINK = 32  # identical safety cap to samplers/slice_theta.py


def _sigma_sweep_kernel(u_ref, c0_ref, y_ref, mask_ref, chain_ref, rep_ref,
                        stats_ref, *, likelihood, log_s, n_blocks, n_reps,
                        whiten_dtype):
    """One chain's whole log_sigma sweep.

    u_ref:     (S, n) VMEM — auxiliary block (unchanged by this update).
    c0_ref:    (n, n) VMEM — carried sigma-independent factor chol(R+eps I).
    y_ref / mask_ref: (1, n) VMEM label / pad-mask rows.
    chain_ref: (1, 8) SMEM f32 —
               [ll0, lp0, sigma0, width, mu_p, hiv, lp_rest, 0] where
               hiv = 0.5 / prior_std² and
               lp_rest = log_prior(theta) + hiv (sigma0 - mu_p)², so that
               lp(x) = lp_rest - hiv (x - mu_p)² + ll(x).
    rep_ref:   (R, 2 + MAX_SHRINK) SMEM f32 — per slice repeat r:
               [log U (height), u1 (interval placement), shrink uniforms].
    stats_ref: (1, 8) SMEM f32 —
               [sigma', ll', lp', n_shrink_total, moved_total, 0, 0, 0].
    """
    w = chain_ref[0, 3]
    mu = chain_ref[0, 4]
    hiv = chain_ref[0, 5]
    lp_rest = chain_ref[0, 6]

    def probe(x):
        c_x = jnp.exp(x) * c0_ref[:]
        f = _dot_whiten(u_ref[:], c_x, whiten_dtype)
        lw = jnp.sum(
            _log_lik_tile(f, y_ref[0, :][None, :], mask_ref[0, :][None, :],
                          likelihood),
            axis=1, keepdims=True,
        )
        ll_x = _blocked_lse_lw(lw, n_blocks) - log_s
        d = x - mu
        return lp_rest - hiv * d * d + ll_x, ll_x

    def rep_body(r, carry):
        sig, lp, ll, n_shrink_tot, moved_tot = carry
        log_y = lp + rep_ref[r, 0]
        l0 = sig - w * rep_ref[r, 1]
        r0 = l0 + w

        def cond(c):
            i, l, rt, x, lp_n, ll_n, done = c
            return jnp.logical_and(~done, i < MAX_SHRINK)

        def body(c):
            i, l, rt, x, lp_n, ll_n, done = c
            un = rep_ref[r, 2 + i]
            x_new = l + (rt - l) * un
            lp2, ll2 = probe(x_new)
            ok = lp2 > log_y
            l = jnp.where(jnp.logical_or(ok, x_new >= sig), l, x_new)
            rt = jnp.where(jnp.logical_or(ok, x_new < sig), rt, x_new)
            return i + 1, l, rt, x_new, lp2, ll2, ok

        init = (jnp.int32(0), l0, r0, sig, lp, ll, jnp.bool_(False))
        n_sh, _, _, x_new, lp_n, ll_n, done = jax.lax.while_loop(
            cond, body, init
        )
        sig = jnp.where(done, x_new, sig)
        lp = jnp.where(done, lp_n, lp)
        ll = jnp.where(done, ll_n, ll)
        return (sig, lp, ll, n_shrink_tot + n_sh.astype(jnp.float32),
                moved_tot + done.astype(jnp.float32))

    sig, lp, ll, n_shrink_tot, moved_tot = jax.lax.fori_loop(
        0, n_reps, rep_body,
        (chain_ref[0, 2], chain_ref[0, 1], chain_ref[0, 0],
         jnp.float32(0.0), jnp.float32(0.0)),
    )
    stats_ref[0, 0] = sig
    stats_ref[0, 1] = ll
    stats_ref[0, 2] = lp
    stats_ref[0, 3] = n_shrink_tot
    stats_ref[0, 4] = moved_tot
    stats_ref[0, 5] = jnp.float32(0.0)
    stats_ref[0, 6] = jnp.float32(0.0)
    stats_ref[0, 7] = jnp.float32(0.0)


def _pallas_sigma_sweep(chol0, u, chain, rep, y, mask, likelihood, n_blocks,
                        log_s, n_reps, whiten_dtype, interpret=False):
    s, n = u.shape
    assert n % 128 == 0
    kern = functools.partial(
        _sigma_sweep_kernel,
        likelihood=likelihood,
        log_s=float(np.log(float(s))) if log_s is None else float(log_s),
        n_blocks=n_blocks,
        n_reps=n_reps,
        whiten_dtype=whiten_dtype,
    )
    stats = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        interpret=interpret,
    )(u, chol0, y[None, :], mask[None, :], chain, rep)
    return (stats[0, 0], stats[0, 1], stats[0, 2], stats[0, 3], stats[0, 4])


def _ref_sigma_sweep(chol0, u, chain, rep, y, mask, likelihood, n_blocks,
                     log_s, n_reps, whiten_dtype):
    """jnp reference sweep — the SAME algorithm with the kernel's estimator
    expression spelled in jnp (``_dot_whiten`` contraction +
    ``_blocked_lse_lw`` reduction), so interpret-mode kernel runs compare
    against it at float-identical op sequences.  Only tests use this path
    (the target factory gates itself off-TPU)."""
    w = chain[0, 3]
    mu = chain[0, 4]
    hiv = chain[0, 5]
    lp_rest = chain[0, 6]
    log_s_v = (jnp.log(jnp.float32(u.shape[0]))
               if log_s is None else jnp.float32(log_s))

    def probe(x):
        f = _dot_whiten(u, jnp.exp(x) * chol0, whiten_dtype)
        lw = jnp.sum(
            _log_lik_tile(f, y[None, :], mask[None, :], likelihood),
            axis=1, keepdims=True,
        )
        ll_x = _blocked_lse_lw(lw, n_blocks) - log_s_v
        d = x - mu
        return lp_rest - hiv * d * d + ll_x, ll_x

    def rep_body(r, carry):
        sig, lp, ll, n_shrink_tot, moved_tot = carry
        log_y = lp + rep[r, 0]
        l0 = sig - w * rep[r, 1]
        r0 = l0 + w

        def cond(c):
            i, l, rt, x, lp_n, ll_n, done = c
            return jnp.logical_and(~done, i < MAX_SHRINK)

        def body(c):
            i, l, rt, x, lp_n, ll_n, done = c
            un = rep[r, 2 + i]
            x_new = l + (rt - l) * un
            lp2, ll2 = probe(x_new)
            ok = lp2 > log_y
            l = jnp.where(jnp.logical_or(ok, x_new >= sig), l, x_new)
            rt = jnp.where(jnp.logical_or(ok, x_new < sig), rt, x_new)
            return i + 1, l, rt, x_new, lp2, ll2, ok

        init = (jnp.int32(0), l0, r0, sig, lp, ll, jnp.bool_(False))
        n_sh, _, _, x_new, lp_n, ll_n, done = jax.lax.while_loop(
            cond, body, init
        )
        sig = jnp.where(done, x_new, sig)
        lp = jnp.where(done, lp_n, lp)
        ll = jnp.where(done, ll_n, ll)
        return (sig, lp, ll, n_shrink_tot + n_sh.astype(jnp.float32),
                moved_tot + done.astype(jnp.float32))

    sig, lp, ll, n_shrink_tot, moved_tot = jax.lax.fori_loop(
        0, n_reps, rep_body,
        (chain[0, 2], chain[0, 1], chain[0, 0], jnp.float32(0.0),
         jnp.float32(0.0)),
    )
    # contract order: (sigma', ll', lp', n_shrink, moved)
    return sig, ll, lp, n_shrink_tot, moved_tot


def make_fused_sigma_sweep(y, mask, likelihood="logistic", force=None,
                           n_blocks=1, whiten_dtype="float32", n_reps=1,
                           interpret=False):
    """Returns ``sweep(chol0, u, chain, rep) -> (sigma', ll', lp',
    n_shrink, moved)``.

    ``chain``: (1, 8) f32 per-chain scalars, ``rep``: (n_reps, 2+MAX_SHRINK)
    f32 randomness — layouts in ``_sigma_sweep_kernel``; see
    samplers/slice_theta.py for the key discipline that fills them.
    Pallas single-dispatch sweep on TPU; jnp reference sweep elsewhere.
    """
    from auxpm_tpu.ops.fused_estimator import _WHITEN_DTYPES

    use_pallas = _on_tpu() if force is None else force
    y = jnp.asarray(y, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    wd = _WHITEN_DTYPES[whiten_dtype]

    if not use_pallas:
        return lambda chol0, u, chain, rep: _ref_sigma_sweep(
            chol0, u, chain, rep, y, mask, likelihood, n_blocks, None,
            n_reps, wd)
    return lambda chol0, u, chain, rep: _pallas_sigma_sweep(
        chol0, u, chain, rep, y, mask, likelihood, n_blocks, None, n_reps,
        wd, interpret=interpret)
