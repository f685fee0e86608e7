"""Whole-ESS-sweep fused kernel: the bracket-shrink loop inside Pallas.

Round-3 VERDICT item 1: the measured floor of the per-probe fused rotated
estimator (ops/fused_estimator._pallas_estimate_rot) is per-call dispatch +
the HBM re-read of the chain's Cholesky factor C — at the bench shape
(S=64, n=640, 128 vmapped chains) each probe re-reads ~210 MB of C across
the batch and the vmapped ``lax.while_loop`` makes EVERY lane pay the
worst lane's probe count.  This kernel removes both costs structurally:

    ONE pallas_call per ESS *sweep* (all ``n_repeats`` elliptical-slice
    updates of u | theta), with C (n², ~1.6 MB at n=640), u and the
    n_repeats direction draws v_r (S x n each) RESIDENT IN VMEM for the
    whole sweep.  The data-dependent bracket-shrink loop runs as a
    ``lax.while_loop`` *inside* the kernel, so each chain executes exactly
    its own probe count, and HBM traffic is one read of (C, u, v) and one
    write of u' per sweep — independent of how many probes the brackets
    take.

Every probe computes the IDENTICAL estimator expression as the per-probe
kernel (same ``_dot_whiten`` MXU contraction, same ``_log_lik_tile`` VPU
likelihood, same ``_blocked_lse_lw`` reduction tree), so the estimator
definition — and therefore the targeted posterior — is unchanged.

Randomness is precomputed OUTSIDE the kernel with the exact key discipline
of the loop path (samplers/ess_u.one_update): per repeat r the caller
splits (k_v, k_h, k_loop), draws v_r, log-uniform h_r, initial angle
a0_r = 2π·U(k_loop), and the 32 bracket redraw uniforms
U(fold_in(k_loop, i+1)) — the sampled chain law is identical to the
per-probe path by construction.

Algorithm (Murray, Adams & MacKay 2010, applied to the auxiliary block —
BASELINE.json:9, SURVEY.md §3.3); cap-hit keeps the current state (an
exact no-op move, not an approximation).

CPU / non-TPU backends fall back to a jnp reference implementing the same
sweep (used by the oracle-equivalence tests); ``interpret=True`` runs the
Pallas kernel in interpreter mode for CPU exactness tests.
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
    _ref_estimate,
)

try:  # pltpu importable only with a TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

MAX_SHRINK = 32  # identical safety cap to samplers/ess_u.py


def _ess_sweep_kernel(u_ref, v_ref, scal_ref, c_ref, y_ref, mask_ref,
                      u_out_ref, stats_ref, *, likelihood, log_s, n_blocks,
                      n_repeats, whiten_dtype):
    """One chain's whole ESS sweep.

    u_ref:    (S, n) VMEM — current auxiliary block.
    v_ref:    (R, S, n) VMEM — per-repeat direction draws.
    scal_ref: (R, 3 + MAX_SHRINK) SMEM f32 — per repeat
              [ll0 (repeat 0 only; ignored r>0), log U (slice height),
               a0, shrink uniforms 0..31].
    c_ref:    (n, n) VMEM — Cholesky factor (resident across the sweep).
    y_ref / mask_ref: (1, n) VMEM label / pad-mask rows.
    u_out_ref: (S, n) VMEM — final u (also the working buffer).
    stats_ref: (1, 4) SMEM f32 — [ll_final, n_shrink_total, moved_total, 0].
    """
    u_out_ref[:] = u_ref[:]

    # fori_loop over repeats with DYNAMIC indexing of v_ref/scal_ref (r5,
    # VERDICT r4 item 1b): the previous static Python unroll instantiated
    # the probe body (MXU contraction + likelihood + reduction + shrink
    # while_loop) n_repeats times, quadrupling the Mosaic program at the
    # bench n_repeats=4 — ~95% of the bench's cold-start wall was one
    # compile of this program.  The op sequence per repeat is IDENTICAL to
    # the unrolled form, so the computed chain is unchanged (parity tests:
    # tests/test_ess_sweep.py).
    def probe(a, r):
        # u/v are re-read from VMEM per probe (cheap; measured
        # indistinguishable from hoisting the value out of the loop)
        u_rot = u_out_ref[:] * jnp.cos(a) + v_ref[r] * jnp.sin(a)
        f = _dot_whiten(u_rot, c_ref[:], whiten_dtype)
        lw = jnp.sum(
            _log_lik_tile(f, y_ref[0, :][None, :], mask_ref[0, :][None, :],
                          likelihood),
            axis=1, keepdims=True,
        )
        return _blocked_lse_lw(lw, n_blocks) - log_s

    def repeat_body(r, carry):
        ll, n_shrink_tot, moved_tot = carry
        log_y = ll + scal_ref[r, 1]
        a0 = scal_ref[r, 2]
        ll0 = probe(a0, r)

        def cond(carry):
            i, a, a_min, a_max, ll_p, done = carry
            return jnp.logical_and(~done, i < MAX_SHRINK)

        def body(carry):
            i, a, a_min, a_max, ll_p, done = carry
            a_min = jnp.where(a < 0, a, a_min)
            a_max = jnp.where(a < 0, a_max, a)
            un = scal_ref[r, 3 + i]
            a_new = a_min + (a_max - a_min) * un
            ll_new = probe(a_new, r)
            return (i + 1, a_new, a_min, a_max, ll_new, ll_new > log_y)

        init = (jnp.int32(0), a0, a0 - jnp.float32(2.0 * np.pi), a0, ll0,
                ll0 > log_y)
        n_shrink, a, _, _, ll_p, done = jax.lax.while_loop(cond, body, init)

        u_new = u_out_ref[:] * jnp.cos(a) + v_ref[r] * jnp.sin(a)
        u_out_ref[:] = jnp.where(done, u_new, u_out_ref[:])
        ll = jnp.where(done, ll_p, ll)
        n_shrink_tot = n_shrink_tot + n_shrink.astype(jnp.float32)
        moved_tot = moved_tot + done.astype(jnp.float32)
        return ll, n_shrink_tot, moved_tot

    ll, n_shrink_tot, moved_tot = jax.lax.fori_loop(
        0, n_repeats,
        repeat_body,
        (scal_ref[0, 0], jnp.float32(0.0), jnp.float32(0.0)),
    )

    stats_ref[0, 0] = ll
    stats_ref[0, 1] = n_shrink_tot
    stats_ref[0, 2] = moved_tot
    stats_ref[0, 3] = jnp.float32(0.0)


def _pallas_ess_sweep(chol, u, scal, v, y, mask, likelihood, n_blocks, log_s,
                      n_repeats, whiten_dtype, interpret=False):
    s, n = u.shape
    assert n % 128 == 0
    kern = functools.partial(
        _ess_sweep_kernel,
        likelihood=likelihood,
        log_s=float(np.log(float(s))) if log_s is None else float(log_s),
        n_blocks=n_blocks,
        n_repeats=n_repeats,
        whiten_dtype=whiten_dtype,
    )
    u_out, stats = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, n), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        interpret=interpret,
    )(u, v, scal, chol, y[None, :], mask[None, :])
    return u_out, stats[0, 0], stats[0, 1], stats[0, 2]


def _ref_ess_sweep(chol, u, scal, v, y, mask, likelihood, n_blocks, log_s,
                   n_repeats, whiten_dtype):
    """jnp reference sweep — the SAME algorithm with the jnp estimator
    (identical to the per-probe CPU path in samplers/ess_u.py given the
    same precomputed randomness)."""
    ll = scal[0, 0]
    n_shrink_tot = jnp.float32(0.0)
    moved_tot = jnp.float32(0.0)
    for r in range(n_repeats):
        v_r = v[r]
        log_y = ll + scal[r, 1]
        a0 = scal[r, 2]

        def probe(a, v_r=v_r):
            return _ref_estimate(chol, u * jnp.cos(a) + v_r * jnp.sin(a), y,
                                 mask, likelihood, n_blocks, log_s,
                                 whiten_dtype)

        ll0 = probe(a0)

        def cond(carry):
            i, a, a_min, a_max, ll_p, done = carry
            return jnp.logical_and(~done, i < MAX_SHRINK)

        def body(carry, r=r, log_y=log_y, probe=probe):
            i, a, a_min, a_max, ll_p, done = carry
            a_min = jnp.where(a < 0, a, a_min)
            a_max = jnp.where(a < 0, a_max, a)
            un = scal[r, 3 + i]
            a_new = a_min + (a_max - a_min) * un
            ll_new = probe(a_new)
            return (i + 1, a_new, a_min, a_max, ll_new, ll_new > log_y)

        init = (jnp.int32(0), a0, a0 - jnp.float32(2.0 * np.pi), a0, ll0,
                ll0 > log_y)
        n_shrink, a, _, _, ll_p, done = jax.lax.while_loop(cond, body, init)
        u_new = u * jnp.cos(a) + v_r * jnp.sin(a)
        u = jnp.where(done, u_new, u)
        ll = jnp.where(done, ll_p, ll)
        n_shrink_tot = n_shrink_tot + n_shrink.astype(jnp.float32)
        moved_tot = moved_tot + done.astype(jnp.float32)
    return u, ll, n_shrink_tot, moved_tot


def make_fused_ess_sweep(y, mask, likelihood="logistic", force=None,
                         n_blocks=1, whiten_dtype="float32", n_repeats=1,
                         interpret=False):
    """Returns ``sweep(chol, u, scal, v) -> (u', ll', n_shrink, moved)``.

    ``scal``: (n_repeats, 3 + MAX_SHRINK) f32 per-sweep randomness —
    row r = [ll0-if-r==0, log U_height, a0, 32 shrink uniforms]; see
    samplers/ess_u.py for the key discipline that fills it.
    ``v``: (n_repeats, S, n) direction draws.

    Pallas single-dispatch sweep on TPU (C resident in VMEM across every
    probe of every repeat); jnp reference sweep elsewhere.  Not
    differentiable (the ESS update is a sampling step, not a density).
    """
    from auxpm_tpu.ops.fused_estimator import _WHITEN_DTYPES

    use_pallas = _on_tpu() if force is None else force
    y = jnp.asarray(y, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    wd = _WHITEN_DTYPES[whiten_dtype]

    if not use_pallas:
        return lambda chol, u, scal, v: _ref_ess_sweep(
            chol, u, scal, v, y, mask, likelihood, n_blocks, None,
            n_repeats, wd)
    return lambda chol, u, scal, v: _pallas_ess_sweep(
        chol, u, scal, v, y, mask, likelihood, n_blocks, None, n_repeats,
        wd, interpret=interpret)
