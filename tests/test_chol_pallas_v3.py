"""Interpret-mode correctness tests for the v3 mini-panel Pallas Cholesky.

The v3 kernel (ops/chol_pallas.py) factors 128-tiles via 16 static 8-wide
mini-panel strips with rank-8 MXU trailing updates, and computes inv(L)^T
in-kernel by blocked backward substitution.  These tests run the kernel in
Pallas interpret mode so the exact kernel logic (masking, strip updates,
substitution order) is validated on the CPU CI mesh; the TPU-compiled path
is exercised by scripts/chol_bench.py on hardware (2.55x XLA measured).
"""

import numpy as np
import jax.numpy as jnp

from auxpm_tpu.ops import chol_pallas as cp


def _spd_batch(b, n, seed=0, jitter=1e-2):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 3))
    sq = ((x[:, None] - x[None]) ** 2).sum(-1)
    ells = rng.uniform(0.5, 3.0, b)
    k = np.exp(-0.5 * sq[None] / ells[:, None, None] ** 2) + jitter * np.eye(n)
    return jnp.asarray(k, jnp.float32)


def test_panel3_factor_and_inverse_interpret():
    k = _spd_batch(4, 128, seed=1)
    l, xt = cp.chol_panel_batched3(k, bt=2, interpret=True)
    l_ref = np.linalg.cholesky(np.asarray(k, np.float64))
    np.testing.assert_allclose(np.asarray(l), np.tril(l_ref), atol=2e-4)
    # xt is inv(L)^T: inv(L) @ L == I
    resid = np.einsum("bij,bjk->bik", np.asarray(xt).transpose(0, 2, 1), np.asarray(l))
    np.testing.assert_allclose(resid, np.eye(128)[None].repeat(4, 0), atol=2e-4)
    # upper-triangularity of xt
    assert np.allclose(np.tril(np.asarray(xt), -1), 0.0)


def test_blocked3_matches_numpy_multi_panel():
    k = _spd_batch(2, 384, seed=2)
    l = cp.cholesky_batched3(k, bt=2, interpret=True)
    l_ref = np.linalg.cholesky(np.asarray(k, np.float64))
    np.testing.assert_allclose(np.asarray(l), np.tril(l_ref), atol=5e-4)
