"""Squared-exponential Gram-matrix builders.

TPU-native replacement for the reference's Cython ``kernels.pyx``
(BASELINE.json:5; SURVEY.md §2.1 "SE-kernel Gram builder").  Two regimes:

- **Isotropic** (the benchmark configs: theta = [log_ell, log_sigma]):
  the pairwise squared distances depend only on the data, so they are
  computed ONCE per dataset (one MXU matmul) and every per-chain Gram build
  is a pure elementwise transform ``sigma² * exp(-sqdist / (2 ell²))`` that
  XLA fuses into the surrounding estimator — strictly less work than any
  hand-written per-probe kernel could do.

- **ARD** (per-dimension lengthscales): the scaled distances change with
  theta, so the Gram build is a batched scaled-matmul + exp.  This is the
  Pallas kernel ``se_gram_ard_pallas`` (grid over row/col tiles, MXU dot for
  the cross term, exp fused in VMEM); ``se_gram_ard`` is the pure-jnp
  fallback used on CPU and for oracle checks (SURVEY.md §4.1).

Parameterisation (log-space, unconstrained — SURVEY.md §8 open question,
resolved to the standard choice):

    K[i,j] = exp(2*log_sigma) * exp(-0.5 * sum_d (x_id - x_jd)^2
                                     / exp(2*log_ell_d))  +  jitter * I
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable only with a TPU-capable jaxlib; guard for CPU CI
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def pairwise_sqdist(x):
    """(n, d) -> (n, n) squared Euclidean distances via one MXU matmul.

    The cross term MUST run at HIGHEST matmul precision: the expansion
    ||xi||² + ||xj||² − 2 xi·xj cancels catastrophically for nearby points,
    and the TPU default (fast bf16 passes) leaves absolute errors ~0.1 that
    make the downstream SE Gram INDEFINITE (measured: eigmin −1.9e−3 on the
    Pima Gram ⇒ every Cholesky NaNs).  HIGHEST costs ~6 bf16 passes — still
    one cheap matmul, and this function is off the hot path (cached per
    dataset; the ARD path pays it per probe but is Cholesky-dominated).
    """
    sq = jnp.sum(x * x, axis=-1)
    cross = jax.lax.dot_general(
        x, x, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )
    d2 = sq[:, None] + sq[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def se_gram_iso(sqdist, log_ell, log_sigma, jitter=1e-6):
    """Isotropic SE Gram from cached squared distances (elementwise)."""
    inv2ell2 = 0.5 * jnp.exp(-2.0 * log_ell)
    k = jnp.exp(2.0 * log_sigma - sqdist * inv2ell2)
    n = sqdist.shape[-1]
    return k + jitter * jnp.eye(n, dtype=k.dtype)


def se_gram_ard(x, log_ells, log_sigma, jitter=1e-6):
    """ARD SE Gram, pure jnp (CPU fallback / oracle for the Pallas kernel)."""
    xs = x * jnp.exp(-log_ells)[None, :]
    d2 = pairwise_sqdist(xs)
    k = jnp.exp(2.0 * log_sigma - 0.5 * d2)
    n = x.shape[0]
    return k + jitter * jnp.eye(n, dtype=k.dtype)


# ---------------------------------------------------------------------------
# Pallas ARD Gram kernel
# ---------------------------------------------------------------------------

_TILE = 128


def _se_gram_kernel(xs_ref, xst_ref, out_ref):
    """One (TILE, TILE) tile of exp(-0.5 ||xs_i - xs_j||²).

    xs_ref:  (TILE, d) row block of the PRE-SCALED data xs = x / ell
    xst_ref: (TILE, d) col block of xs

    The per-chain scaling (and the sigma²/jitter epilogue) happen OUTSIDE
    the kernel as cheap elementwise XLA ops: keeping the kernel free of
    scalar (SMEM) operands is what makes it vmap-able over chains — the
    Pallas batching rule cannot tile an SMEM scalar vector along a mapped
    axis (measured on the real chip: the SMEM-params version of this kernel
    fails Mosaic lowering under vmap).
    """
    xi = xs_ref[:]
    xj = xst_ref[:]
    sq_i = jnp.sum(xi * xi, axis=1, keepdims=True)  # (T, 1)
    sq_j = jnp.sum(xj * xj, axis=1, keepdims=True).T  # (1, T)
    cross = jnp.dot(xi, xj.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(sq_i + sq_j - 2.0 * cross, 0.0)
    out_ref[:] = jnp.exp(-0.5 * d2)


import functools


@functools.partial(jax.jit, static_argnames=("interpret",))
def _se_gram_ard_pallas(x_pad, log_ells, log_sigma, jitter, interpret=False):
    n_pad, d = x_pad.shape
    grid = (n_pad // _TILE, n_pad // _TILE)
    xs = (x_pad * jnp.exp(-log_ells)[None, :]).astype(jnp.float32)
    r = pl.pallas_call(
        _se_gram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE, _TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(xs, xs)
    return jnp.exp(2.0 * log_sigma) * r + jitter * jnp.eye(n_pad, dtype=r.dtype)


def se_gram_ard_pallas(x, log_ells, log_sigma, jitter=1e-6, interpret=False):
    """ARD SE Gram via the Pallas TPU kernel.

    Pads n up to a multiple of 128 internally (padded rows produce padded
    Gram entries that are sliced off before return, so callers see exactly
    (n, n)).  Requires a TPU backend (or ``interpret=True`` for CPU tests);
    use ``se_gram_ard`` elsewhere.  Wired into the GP target's ARD path
    (models/gp_classification.r_matrix) when built on TPU.
    """
    n, d = x.shape
    n_pad = -(-n // _TILE) * _TILE
    x_pad = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    k_pad = _se_gram_ard_pallas(
        x_pad.astype(jnp.float32),
        jnp.asarray(log_ells, jnp.float32),
        jnp.asarray(log_sigma, jnp.float32),
        jnp.asarray(jitter, jnp.float32),
        interpret=interpret,
    )
    return k_pad[:n, :n]


def on_tpu():
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False
