"""Native C++ CPU kernels (the reference kernels.pyx analogue) vs NumPy."""

import numpy as np
import pytest

pytest.importorskip("tests.oracle.native_kernels")

from tests.oracle.native_kernels import (  # noqa: E402
    chol_native,
    se_gram_ard_native,
    se_gram_iso_native,
)


def test_native_iso_gram_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 4))
    diff = x[:, None, :] - x[None, :, :]
    sq = np.einsum("ijk,ijk->ij", diff, diff)
    log_ell, log_sigma, jitter = -0.2, 0.4, 1e-5
    want = np.exp(2 * log_sigma) * (
        np.exp(-0.5 * sq * np.exp(-2 * log_ell)) + jitter * np.eye(50)
    )
    got = se_gram_iso_native(sq, log_ell, log_sigma, jitter)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_native_ard_gram_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((30, 3))
    log_ells = np.array([-0.1, 0.2, 0.5])
    log_sigma, jitter = 0.3, 1e-5
    xs = x / np.exp(log_ells)
    diff = xs[:, None, :] - xs[None, :, :]
    sq = np.einsum("ijk,ijk->ij", diff, diff)
    want = np.exp(2 * log_sigma) * (np.exp(-0.5 * sq) + jitter * np.eye(30))
    got = se_gram_ard_native(x, log_ells, log_sigma, jitter)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_native_chol_matches_numpy():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((40, 8))
    k = a @ a.T + 5 * np.eye(40)
    np.testing.assert_allclose(chol_native(k), np.linalg.cholesky(k), rtol=1e-10)


def test_oracle_uses_native_gram():
    from auxpm_tpu.models.datasets import load
    from tests.oracle.np_gp import NumpyGPTarget

    x, y = load("pima", subsample=40)
    t_native = NumpyGPTarget(x, y, n_importance=8, use_native=True)
    t_numpy = NumpyGPTarget(x, y, n_importance=8, use_native=False)
    assert t_native.use_native
    theta = np.array([0.1, -0.2])
    np.testing.assert_allclose(
        t_native.gram(theta), t_numpy.gram(theta), rtol=1e-6
    )
