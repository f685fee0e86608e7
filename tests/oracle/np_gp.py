"""Pure-NumPy GP-classification pseudo-marginal target.

The "CPU reference" half of BASELINE Target 1 (≥5x ESS/sec at 1 chip,
BASELINE.md): a faithful single-threaded NumPy implementation of the
reference's estimator path (SURVEY.md §3.4) — SE Gram (the ``kernels.pyx``
analogue is the C++ extension in ``native/``, used when built), LAPACK
Cholesky via ``scipy``/NumPy, whitening matmul, Bernoulli log-lik,
log-sum-exp — driven by the scalar oracle transitions in ``oracle.py``.

Semantics are pinned to the JAX implementation: same parameterisation,
same jitter policy, same prior-proposal weight collapse.
"""

from __future__ import annotations

import numpy as np

try:  # optional native CPU Gram kernel (see native/)
    from tests.oracle.native_kernels import se_gram_iso_native
except Exception:  # pragma: no cover
    se_gram_iso_native = None


def _logsumexp(v):
    m = v.max()
    return float(np.log(np.exp(v - m).sum()) + m)


class NumpyGPTarget:
    def __init__(self, x, y, n_importance=64, likelihood="logistic",
                 jitter=1e-5, prior_mean=0.0, prior_std=1.5, use_native=True):
        self.x = np.asarray(x, np.float64)
        self.y = np.asarray(y, np.float64)
        self.n, self.feat_d = self.x.shape
        self.s = n_importance
        self.u_shape = (n_importance, self.n)
        self.d = 2  # [log_ell, log_sigma]
        self.jitter = jitter
        self.prior_mean = prior_mean
        self.prior_std = prior_std
        self.likelihood = likelihood
        self.use_native = use_native and se_gram_iso_native is not None
        diff = self.x[:, None, :] - self.x[None, :, :]
        self.sqdist = np.einsum("ijk,ijk->ij", diff, diff)
        self.theta_init = np.zeros(2)

    def log_prior(self, theta):
        r = (np.asarray(theta) - self.prior_mean) / self.prior_std
        return float(
            -0.5 * np.dot(r, r)
            - self.d * (0.5 * np.log(2 * np.pi) + np.log(self.prior_std))
        )

    def gram(self, theta):
        # relative nugget, matching the JAX target: K = sigma²(R + jitter I)
        log_ell, log_sigma = float(theta[0]), float(theta[1])
        if self.use_native:
            return se_gram_iso_native(self.sqdist, log_ell, log_sigma, self.jitter)
        k = np.exp(2.0 * log_sigma - self.sqdist * (0.5 * np.exp(-2.0 * log_ell)))
        k[np.diag_indices(self.n)] += self.jitter * np.exp(2.0 * log_sigma)
        return k

    def prepare(self, theta):
        return np.linalg.cholesky(self.gram(theta))

    def log_lik_est_u(self, chol, u):
        f = u @ chol.T  # (S, n)
        z = self.y[None, :] * f
        if self.likelihood == "logistic":
            ll = -np.logaddexp(0.0, -z)
        else:  # probit
            from scipy.special import log_ndtr

            ll = log_ndtr(z)
        log_w = ll.sum(axis=1)
        return _logsumexp(log_w) - np.log(self.s)

    def log_lik_est(self, theta, u):
        return self.log_lik_est_u(self.prepare(theta), np.asarray(u))
