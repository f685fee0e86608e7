"""Fused whiten → likelihood → log-sum-exp estimator kernel (Pallas TPU).

SURVEY.md §2.1 maps the reference's hot estimator path (whitened draws +
Bernoulli log-likelihood + logsumexp over S importance samples, SURVEY.md
§3.4) to "fused whiten→likelihood→logsumexp ... Pallas TPU kernels".  This
kernel computes, for one chain,

    f   = u @ C.T                      (S, n)  one pass of MXU tiles
    lw  = sum_i mask_i * log lik(y_i f_si)     per importance sample
    out = logsumexp_s(lw) - log S              scalar

WITHOUT ever materialising ``f`` (or the rotated proposal, see below) in
HBM: the grid walks 128-wide column blocks of C, each step issuing one
(S, n)x(n, 128) MXU matmul whose output tile is consumed immediately by the
VPU likelihood and accumulated into a (S, 128) VMEM partial-sum buffer; the
final step folds the buffer into the logsumexp.  HBM traffic is exactly one
read of C, u (and v) per call — the XLA fallback writes/rereads ``f``.

The elliptical-slice variant fuses the proposal rotation too:
``u' = u cos a + v sin a`` is formed in-registers per tile, so the ESS
bracket-shrink loop (SURVEY.md §3.3, the hottest inner loop of the method)
never materialises u' until a move is accepted.

Gradients: samplers needing autodiff (HMC/NUTS, SURVEY.md §2.2) get a
``jax.custom_vjp`` whose backward pass replays the mathematically identical
jnp path — forward speed from Pallas, gradients from XLA.

Off-TPU (CPU tests) every entry point falls back to the jnp reference
implementation automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu importable only with a TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_BLK = 128

_WHITEN_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _col_block(s, n, n_u=1):
    """Column-block width for the fused kernels.

    The original kernels walked 128-wide column blocks of C; at the bench
    shape (S=64, n=640, 128 vmapped chains) that is 640 grid steps per call
    and the measured call cost (~2 ms) sits ~4x above the data/compute
    floor (~0.5 ms) — per-grid-step overhead dominates.  Wider blocks mean
    fewer steps.  Pick the largest multiple of 128 that divides n and keeps
    the kernel working set (u blocks, double-buffered C block, accumulator)
    inside a conservative VMEM budget; override with
    ``AUXPM_FUSED_COL_BLOCK`` for experiments.

    ``n_u``: how many (S, n) operands the kernel holds (1, or 2 for the
    rotated-proposal variants).

    NOTE (advisor finding r3): the forced value is clamped to the same VMEM
    budget as the heuristic (a wider block would fail at Mosaic compile),
    and because the column-block width changes the f32 accumulation
    grouping, AUXPM_FUSED_COL_BLOCK is part of the ESTIMATOR DEFINITION for
    reproducibility purposes — resume a checkpointed run under the same
    setting (utils/config hashes it into the run config when set).
    """
    import os
    import warnings

    budget = 10 * 2**20  # bytes; conservative vs the 16 MB scoped default

    def _working(blk):
        return 4 * (n_u * s * n + 2 * blk * n + s * blk + 4 * blk)

    forced = int(os.environ.get("AUXPM_FUSED_COL_BLOCK", "0"))
    if forced and forced % _BLK == 0 and n % forced == 0:
        if _working(forced) <= budget:
            return forced
        warnings.warn(
            f"AUXPM_FUSED_COL_BLOCK={forced} exceeds the {budget >> 20} MB "
            "VMEM budget at this shape; falling back to the heuristic"
        )
    for k in range(n // _BLK, 0, -1):
        blk = k * _BLK
        if n % blk:
            continue
        if _working(blk) <= budget:
            return blk
    return _BLK


def _dot_whiten(a, b, whiten_dtype):
    """(S, n) x (T, n)^T contraction over n -> (S, T), f32 accumulate.

    ``whiten_dtype`` is part of the ESTIMATOR DEFINITION (like any precision
    choice — the estimator is a fixed deterministic function of (theta, u)
    either way, so pseudo-marginal validity is untouched; the targeted
    posterior is perturbed at the rounding level, measured ~1e-2 nats on
    Pima log-weights):

    - float32 (default): 6-pass HIGHEST — exact-f32 whiten.
    - bfloat16: operands cast to bf16 in-registers, one MXU pass with f32
      accumulation — ~4-6x MXU throughput on the op that is ~85% of model
      FLOPs (VERDICT r2 item 4).  HBM traffic unchanged (casts happen after
      the VMEM load).
    """
    if whiten_dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _log_lik_tile(f, y, mask, likelihood):
    """Elementwise stable log-likelihood on one (S, BLK) tile (VPU).

    Probit: Mosaic has no erfc primitive, so ``models.likelihoods.log_ndtr``
    computes log Phi from the log-form single-formula erfc approximation
    (rel. err < 1.2e-7) — plain exp/log/polynomial VPU ops that lower fine
    (VERDICT r1 item 9)."""
    if likelihood == "logistic":
        return -jax.nn.softplus(-y * f) * mask
    from auxpm_tpu.models.likelihoods import log_ndtr

    return log_ndtr(y * f) * mask


def _blocked_lse_lw(lw, n_blocks):
    """Blocked lse of an (S, 1) log-weight column with a fixed sequential
    combine — the SAME associativity as ops.logsumexp.blocked_logsumexp, so
    the kernel's reduction definition matches the jnp / sharded paths.
    Static python loop (n_blocks is small and static)."""
    def safe(m):
        # mirror ops/logsumexp.block_partials' -inf guard: an all--inf block
        # must yield exp(-inf - 0) = 0, not exp(-inf - -inf) = NaN (advisor
        # finding r2).  In the finite case `where` selects m unchanged, so
        # the reduction stays bitwise-equal to the jnp/sharded paths.
        return jnp.where(jnp.isfinite(m), m, 0.0)

    s = lw.shape[0]
    if n_blocks <= 1:
        m = safe(jnp.max(lw))
        return jnp.log(jnp.sum(jnp.exp(lw - m))) + m
    bs = s // n_blocks
    cm = jnp.max(lw[0:bs])
    cs = jnp.sum(jnp.exp(lw[0:bs] - safe(cm)))
    for b in range(1, n_blocks):
        blk = lw[b * bs:(b + 1) * bs]
        bm = jnp.max(blk)
        bsum = jnp.sum(jnp.exp(blk - safe(bm)))
        nm = jnp.maximum(cm, bm)
        cs = cs * jnp.exp(cm - safe(nm)) + bsum * jnp.exp(bm - safe(nm))
        cm = nm
    return jnp.log(cs) + safe(cm)


def _fused_kernel(u_ref, c_ref, y_ref, mask_ref, out_ref, acc_ref, *, likelihood,
                  log_s, n_blocks, whiten_dtype=jnp.float32):
    """Grid step j: one 128-column block of f = u @ C.T.

    u_ref: (S, n) full auxiliary block (VMEM, constant across grid).
    c_ref: (BLK, n) rows j*BLK..(j+1)*BLK of C  (f[:, blk] = u @ C[blk, :].T).
    y_ref/mask_ref: (1, BLK) label/mask column blocks.
    out_ref: (1, 1) scalar output (SMEM).
    acc_ref: (S, BLK) VMEM scratch accumulating per-sample partial loglik.
    """
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # (S, n) x (BLK, n)^T contraction over n -> (S, BLK) on the MXU
    f_blk = _dot_whiten(u_ref[:], c_ref[:], whiten_dtype)
    acc_ref[:] += _log_lik_tile(f_blk, y_ref[0, :][None, :],
                                mask_ref[0, :][None, :], likelihood)

    @pl.when(j == nj - 1)
    def _():
        lw = jnp.sum(acc_ref[:], axis=1, keepdims=True)  # (S, 1)
        out_ref[0, 0] = _blocked_lse_lw(lw, n_blocks) - log_s


def _fused_rot_kernel(u_ref, v_ref, ang_ref, c_ref, y_ref, mask_ref, out_ref,
                      acc_ref, *, likelihood, log_s, n_blocks,
                      whiten_dtype=jnp.float32):
    """ESS variant: whitens u' = u cos a + v sin a formed per tile."""
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u_rot = u_ref[:] * jnp.cos(ang_ref[0, 0]) + v_ref[:] * jnp.sin(ang_ref[0, 0])
    f_blk = _dot_whiten(u_rot, c_ref[:], whiten_dtype)
    acc_ref[:] += _log_lik_tile(f_blk, y_ref[0, :][None, :],
                                mask_ref[0, :][None, :], likelihood)

    @pl.when(j == nj - 1)
    def _():
        lw = jnp.sum(acc_ref[:], axis=1, keepdims=True)
        out_ref[0, 0] = _blocked_lse_lw(lw, n_blocks) - log_s


def _ref_weights(chol, u, y, mask, likelihood, whiten_dtype=jnp.float32):
    """jnp per-sample log-weights (CPU fallback + VJP backward).

    Must stay the EXACT expression of models/likelihoods.LIKELIHOODS so
    jnp-path estimates are one consistent function of (chol, u); the
    whiten dtype is the same estimator-definition choice as in the Pallas
    kernels (_dot_whiten)."""
    if whiten_dtype == jnp.bfloat16:
        f = _dot_whiten(u, chol, whiten_dtype)
    else:
        f = u @ chol.T
    if likelihood == "logistic":
        ll = -jax.nn.softplus(-y[None, :] * f)
    else:
        from auxpm_tpu.models.likelihoods import log_ndtr

        ll = log_ndtr(y[None, :] * f)
    return jnp.sum(ll * mask[None, :], axis=-1)


def _ref_estimate(chol, u, y, mask, likelihood, n_blocks=1, log_s=None,
                  whiten_dtype=jnp.float32):
    """jnp reference estimate with the canonical blocked reduction."""
    from auxpm_tpu.ops.logsumexp import blocked_logsumexp

    lw = _ref_weights(chol, u, y, mask, likelihood, whiten_dtype)
    if log_s is None:
        log_s = jnp.log(jnp.asarray(float(u.shape[0]), u.dtype))
    return blocked_logsumexp(lw, n_blocks) - log_s


def _pallas_estimate(chol, u, y, mask, likelihood, n_blocks=1, log_s=None,
                     whiten_dtype=jnp.float32, interpret=False):
    s, n = u.shape
    assert n % _BLK == 0, f"n={n} must be 128-aligned (pad the target)"
    kern = functools.partial(
        _fused_kernel,
        likelihood=likelihood,
        log_s=float(np.log(float(s))) if log_s is None else float(log_s),
        n_blocks=n_blocks,
        whiten_dtype=whiten_dtype,
    )
    blk = _col_block(s, n, n_u=1)
    return pl.pallas_call(
        kern,
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((s, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s, blk), jnp.float32)],
        interpret=interpret,
    )(u, chol, y[None, :], mask[None, :])[0, 0]


def _pallas_estimate_rot(chol, u, v, angle, y, mask, likelihood, n_blocks=1,
                         log_s=None, whiten_dtype=jnp.float32,
                         interpret=False):
    s, n = u.shape
    assert n % _BLK == 0
    kern = functools.partial(
        _fused_rot_kernel,
        likelihood=likelihood,
        log_s=float(np.log(float(s))) if log_s is None else float(log_s),
        n_blocks=n_blocks,
        whiten_dtype=whiten_dtype,
    )
    blk = _col_block(s, n, n_u=2)
    return pl.pallas_call(
        kern,
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((s, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, n), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s, blk), jnp.float32)],
        interpret=interpret,
    )(u, v, jnp.reshape(angle, (1, 1)).astype(jnp.float32), chol,
      y[None, :], mask[None, :])[0, 0]


def _on_tpu():
    try:
        return pltpu is not None and jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def make_fused_estimator(y, mask, likelihood="logistic", force=None,
                         n_blocks=1, whiten_dtype="float32"):
    """Returns ``est(chol, u) -> scalar`` = blocked-lse_s(loglik) - log S.

    Pallas-fused on TPU, jnp elsewhere (``force=True/False`` overrides for
    tests).  Differentiable in both args via custom_vjp (backward = jnp).
    ``n_blocks`` fixes the reduction tree (ops/logsumexp.blocked_logsumexp)
    and ``whiten_dtype`` the GEMM precision (_dot_whiten) — both part of
    the estimator definition, shared with the sharded path.
    """
    use_pallas = _on_tpu() if force is None else force
    y = jnp.asarray(y, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    wd = _WHITEN_DTYPES[whiten_dtype]

    if not use_pallas:
        return lambda chol, u: _ref_estimate(chol, u, y, mask, likelihood,
                                             n_blocks, whiten_dtype=wd)

    @jax.custom_vjp
    def est(chol, u):
        return _pallas_estimate(chol, u, y, mask, likelihood, n_blocks,
                                whiten_dtype=wd)

    def fwd(chol, u):
        return est(chol, u), (chol, u)

    def bwd(res, g):
        chol, u = res
        gc, gu = jax.grad(
            lambda c, uu: _ref_estimate(c, uu, y, mask, likelihood, n_blocks,
                                        whiten_dtype=wd),
            argnums=(0, 1),
        )(chol, u)
        return (g * gc, g * gu)

    est.defvjp(fwd, bwd)
    return est


def make_fused_rot_estimator(y, mask, likelihood="logistic", force=None,
                             n_blocks=1, whiten_dtype="float32"):
    """Returns ``est(chol, u, v, angle) -> scalar`` for the ESS inner loop:
    the estimate at the rotated proposal u cos a + v sin a, fused."""
    use_pallas = _on_tpu() if force is None else force
    y = jnp.asarray(y, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    wd = _WHITEN_DTYPES[whiten_dtype]

    def ref(chol, u, v, angle):
        return _ref_estimate(
            chol, u * jnp.cos(angle) + v * jnp.sin(angle), y, mask, likelihood,
            n_blocks, whiten_dtype=wd,
        )

    if not use_pallas:
        return ref
    return lambda chol, u, v, angle: _pallas_estimate_rot(
        chol, u, v, angle, y, mask, likelihood, n_blocks, whiten_dtype=wd
    )


# ---------------------------------------------------------------------------
# Per-sample log-WEIGHTS kernels — the particle-sharded hot path
# ---------------------------------------------------------------------------
#
# Under particle sharding the reduction over S is a collective, so the local
# kernel must return the (S_local,) log-weights instead of the folded scalar
# (parallel/collectives.allgather_blocked_logsumexp finishes the job).  Same
# fused whiten -> likelihood accumulation; the output is the (S, 1) column.


def _fused_weights_kernel(u_ref, c_ref, y_ref, mask_ref, out_ref, acc_ref, *,
                          likelihood, whiten_dtype=jnp.float32):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f_blk = _dot_whiten(u_ref[:], c_ref[:], whiten_dtype)
    acc_ref[:] += _log_lik_tile(f_blk, y_ref[0, :][None, :],
                                mask_ref[0, :][None, :], likelihood)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = jnp.sum(acc_ref[:], axis=1, keepdims=True)


def _fused_rot_weights_kernel(u_ref, v_ref, ang_ref, c_ref, y_ref, mask_ref,
                              out_ref, acc_ref, *, likelihood,
                              whiten_dtype=jnp.float32):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u_rot = u_ref[:] * jnp.cos(ang_ref[0, 0]) + v_ref[:] * jnp.sin(ang_ref[0, 0])
    f_blk = _dot_whiten(u_rot, c_ref[:], whiten_dtype)
    acc_ref[:] += _log_lik_tile(f_blk, y_ref[0, :][None, :],
                                mask_ref[0, :][None, :], likelihood)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = jnp.sum(acc_ref[:], axis=1, keepdims=True)


def _pallas_weights(chol, u, y, mask, likelihood, whiten_dtype=jnp.float32,
                    interpret=False):
    s, n = u.shape
    assert n % _BLK == 0
    kern = functools.partial(_fused_weights_kernel, likelihood=likelihood,
                             whiten_dtype=whiten_dtype)
    blk = _col_block(s, n, n_u=1)
    return pl.pallas_call(
        kern,
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((s, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, 1), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s, blk), jnp.float32)],
        interpret=interpret,
    )(u, chol, y[None, :], mask[None, :])[:, 0]


def _pallas_rot_weights(chol, u, v, angle, y, mask, likelihood,
                        whiten_dtype=jnp.float32, interpret=False):
    s, n = u.shape
    assert n % _BLK == 0
    kern = functools.partial(_fused_rot_weights_kernel, likelihood=likelihood,
                             whiten_dtype=whiten_dtype)
    blk = _col_block(s, n, n_u=2)
    return pl.pallas_call(
        kern,
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((s, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, n), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, 1), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s, blk), jnp.float32)],
        interpret=interpret,
    )(u, v, jnp.reshape(angle, (1, 1)).astype(jnp.float32), chol,
      y[None, :], mask[None, :])[:, 0]


def make_fused_weights(y, mask, likelihood="logistic", force=None,
                       whiten_dtype="float32"):
    """Returns ``lw(chol, u) -> (S,)`` per-sample log-weights, Pallas-fused
    on TPU (jnp elsewhere); differentiable via custom_vjp (backward = jnp)."""
    use_pallas = _on_tpu() if force is None else force
    y = jnp.asarray(y, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    wd = _WHITEN_DTYPES[whiten_dtype]

    if not use_pallas:
        return lambda chol, u: _ref_weights(chol, u, y, mask, likelihood,
                                            whiten_dtype=wd)

    @jax.custom_vjp
    def lw(chol, u):
        return _pallas_weights(chol, u, y, mask, likelihood, whiten_dtype=wd)

    def fwd(chol, u):
        return lw(chol, u), (chol, u)

    def bwd(res, g):
        chol, u = res
        _, pull = jax.vjp(
            lambda c, uu: _ref_weights(c, uu, y, mask, likelihood,
                                       whiten_dtype=wd),
            chol, u,
        )
        return pull(g)

    lw.defvjp(fwd, bwd)
    return lw


def make_fused_rot_weights(y, mask, likelihood="logistic", force=None,
                           whiten_dtype="float32"):
    """Returns ``lw(chol, u, v, angle) -> (S,)`` at the rotated proposal."""
    use_pallas = _on_tpu() if force is None else force
    y = jnp.asarray(y, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    wd = _WHITEN_DTYPES[whiten_dtype]

    def ref(chol, u, v, angle):
        return _ref_weights(
            chol, u * jnp.cos(angle) + v * jnp.sin(angle), y, mask, likelihood,
            whiten_dtype=wd,
        )

    if not use_pallas:
        return ref
    return lambda chol, u, v, angle: _pallas_rot_weights(
        chol, u, v, angle, y, mask, likelihood, whiten_dtype=wd
    )
