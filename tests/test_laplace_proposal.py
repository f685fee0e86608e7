"""Laplace approximate-posterior importance proposal (models/laplace.py).

SURVEY.md §8 lists "prior vs Laplace/approx-posterior importance proposals"
as a reference capability; these tests pin its correctness:

- The Newton mode maximises the log posterior in f (gradient ≈ 0 at f̂).
- Prior-proposal and Laplace-proposal estimators are unbiased for the SAME
  marginal likelihood: Monte-Carlo means of exp(log L̂) agree within CLT
  error, and the Laplace estimator has (much) lower variance.
- Padding exactness: padded and unpadded targets give identical estimates.
- End-to-end: aux-slice sampling with the Laplace proposal recovers the
  same posterior as with the prior proposal.
"""

import jax
import jax.numpy as jnp
import numpy as np

from auxpm_tpu.models.datasets import load
from auxpm_tpu.models.gp_classification import make_gp_classification
from auxpm_tpu.models.laplace import laplace_fit
from auxpm_tpu.models.likelihoods import LIKELIHOOD_GRAD_HESS


def _toy_data(n=24, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    w = np.array([1.0, -0.7], np.float32)[:d]
    y = np.where(x @ w + 0.3 * rng.standard_normal(n) > 0, 1.0, -1.0).astype(
        np.float32
    )
    return x, y


def test_newton_mode_is_stationary():
    x, y = _toy_data()
    n = len(y)
    from auxpm_tpu.ops.gram import pairwise_sqdist, se_gram_iso

    k = se_gram_iso(pairwise_sqdist(jnp.asarray(x)), 0.0, 0.2, 1e-5)
    mask = jnp.ones((n,), jnp.float32)
    for lik in ("logistic", "probit"):
        f_hat, chol_q, _ = laplace_fit(k, jnp.asarray(y), mask, lik, 20)
        # stationarity in the well-conditioned fixed-point form:
        # f̂ = K grad log p(y|f̂)  (avoids solving with the jittered K in f32)
        g, _ = LIKELIHOOD_GRAD_HESS[lik](f_hat, jnp.asarray(y), mask)
        resid = f_hat - k @ g
        assert float(jnp.max(jnp.abs(resid))) < 1e-3, lik
        # Σ_q is SPD with sensible scale (≼ K in the Loewner order ⇒ its
        # diagonal is below K's)
        sq = np.asarray(chol_q @ chol_q.T)
        assert np.all(np.diag(sq) > 0)
        assert np.all(np.diag(sq) <= np.diag(np.asarray(k)) + 1e-4)


def test_laplace_estimator_unbiased_and_lower_variance():
    x, y = _toy_data(n=20)
    s = 16
    t_prior = make_gp_classification(
        x, y, n_importance=s, pad_to_tiles=False, jitter=1e-5
    )
    t_lap = make_gp_classification(
        x, y, n_importance=s, pad_to_tiles=False, jitter=1e-5, proposal="laplace"
    )
    theta = jnp.asarray([0.1, 0.3], jnp.float32)

    n_rep = 512
    keys = jax.random.split(jax.random.key(1), n_rep)

    def est(target):
        prep = target.prepare(theta)

        def one(key):
            u = jax.random.normal(key, target.u_shape, jnp.float32)
            return target.log_lik_est_u(prep, u)

        return jax.jit(jax.vmap(one))(keys)

    ll_prior = np.asarray(est(t_prior), np.float64)
    ll_lap = np.asarray(est(t_lap), np.float64)

    # Unbiasedness in L (not log L): compare MC means of exp(log L̂).
    # Work relative to a common shift for stability.
    shift = ll_lap.mean()
    m_prior = np.exp(ll_prior - shift).mean()
    m_lap = np.exp(ll_lap - shift).mean()
    se_prior = np.exp(ll_prior - shift).std() / np.sqrt(n_rep)
    se_lap = np.exp(ll_lap - shift).std() / np.sqrt(n_rep)
    tol = 4.0 * np.hypot(se_prior, se_lap)
    assert abs(m_prior - m_lap) < tol, (m_prior, m_lap, tol)

    # Variance reduction: the Laplace log-estimates are far tighter.
    assert ll_lap.std() < 0.5 * ll_prior.std(), (ll_lap.std(), ll_prior.std())


def test_laplace_padding_exact():
    x, y = _toy_data(n=30)
    kw = dict(n_importance=8, jitter=1e-5, proposal="laplace")
    t_pad = make_gp_classification(x, y, pad_to_tiles=True, **kw)
    t_raw = make_gp_classification(x, y, pad_to_tiles=False, **kw)
    theta = jnp.asarray([0.0, 0.2], jnp.float32)
    u_raw = jax.random.normal(jax.random.key(2), t_raw.u_shape, jnp.float32)
    # padded u: real block identical, pad block arbitrary normals
    u_pad = jax.random.normal(jax.random.key(3), t_pad.u_shape, jnp.float32)
    u_pad = u_pad.at[:, : u_raw.shape[1]].set(u_raw)
    ll_raw = float(t_raw.log_lik_est(theta, u_raw))
    ll_pad = float(t_pad.log_lik_est(theta, u_pad))
    # pad dims cancel exactly in log w; tolerance covers f32 matmul order
    assert abs(ll_raw - ll_pad) < 5e-2 * max(1.0, abs(ll_raw)), (ll_raw, ll_pad)


def test_aux_slice_laplace_matches_prior_posterior():
    from auxpm_tpu.core.state import init_chain_states
    from auxpm_tpu.samplers.chain import run_chains
    from auxpm_tpu.samplers.composite import make_aux_slice

    x, y = load("pima", subsample=48)
    posts = {}
    for proposal, s in (("prior", 64), ("laplace", 8)):
        target = make_gp_classification(
            x, y, n_importance=s, proposal=proposal, pad_to_tiles=False
        )
        step = make_aux_slice(target)
        states = init_chain_states(jax.random.key(4), target, 16, jitter_scale=0.3)
        params = {"slice_theta": {"widths": jnp.ones((2,), jnp.float32)}}
        states, recs, _ = run_chains(step, states, params, 220)
        theta = np.asarray(recs["theta"])[:, 60:]  # (chains, steps, d) burn-in cut
        posts[proposal] = theta.reshape(-1, theta.shape[-1])

    mp, ml = posts["prior"].mean(0), posts["laplace"].mean(0)
    sp = posts["prior"].std(0)
    assert np.all(np.abs(mp - ml) < 0.35 * sp + 0.15), (mp, ml, sp)
