"""HMC / NUTS correctness (SURVEY.md §4.3, BASELINE config 5 prerequisites).

- Exact MVN target: both kernels recover mean/cov within MC error.
- HMC: acceptance ~ 1 at tiny step size (energy conservation).
- NUTS: depth responds to step size; no divergences on a well-scaled target.
- Gradients flow through the GP estimator (Cholesky) and match finite
  differences.
- Composite ESS-u + NUTS recovers the Gaussian-toy PM posterior.
"""

import jax
import jax.numpy as jnp
import numpy as np

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.exact import make_mvn_target
from auxpm_tpu.models.gaussian_toy import make_gaussian_toy
from auxpm_tpu.models.gp_classification import make_gp_classification
from auxpm_tpu.models.datasets import load
from auxpm_tpu.samplers.chain import run_chains
from auxpm_tpu.samplers.composite import make_aux_nuts
from auxpm_tpu.samplers.hmc import make_hmc
from auxpm_tpu.samplers.nuts import make_nuts
from auxpm_tpu.utils.diagnostics import effective_sample_size, potential_scale_reduction

MEAN = np.array([1.0, -2.0, 0.5])
COV = np.array([[1.0, 0.6, 0.2], [0.6, 1.5, -0.3], [0.2, -0.3, 0.8]])


def _moment_check(theta, mean, cov, label):
    flat = theta.reshape(-1, theta.shape[-1])
    ess = effective_sample_size(theta)
    se = np.sqrt(np.diag(cov) / np.maximum(ess, 1.0))
    assert np.all(np.abs(flat.mean(0) - mean) < 5 * se), (
        label, flat.mean(0), mean, se, ess,
    )
    assert np.all(
        np.abs(flat.var(0) - np.diag(cov)) < 0.35 * np.diag(cov)
    ), (label, flat.var(0), np.diag(cov))
    assert np.all(potential_scale_reduction(theta) < 1.15)


def test_hmc_exact_mvn():
    target = make_mvn_target(MEAN, COV)
    states = init_chain_states(jax.random.key(0), target, 8, jitter_scale=1.0)
    step = make_hmc(target)
    _, recs, infos = run_chains(
        step, states, {"step_size": 0.4, "n_leapfrog": 8}, 1500
    )
    acc = float(np.asarray(infos["accept"]).mean())
    assert acc > 0.6, acc
    _moment_check(np.asarray(recs["theta"])[:, 300:, :], MEAN, COV, "hmc")


def test_hmc_energy_conservation():
    target = make_mvn_target(MEAN, COV)
    states = init_chain_states(jax.random.key(1), target, 8)
    step = make_hmc(target)
    _, _, infos = run_chains(step, states, {"step_size": 0.01, "n_leapfrog": 4}, 50)
    assert float(np.asarray(infos["accept_prob"]).mean()) > 0.999


def test_nuts_exact_mvn():
    target = make_mvn_target(MEAN, COV)
    states = init_chain_states(jax.random.key(2), target, 8, jitter_scale=1.0)
    step = make_nuts(target, max_depth=6)
    _, recs, infos = run_chains(step, states, {"step_size": 0.5}, 1200)
    div = float(np.asarray(infos["diverged"]).mean())
    assert div < 0.01, div
    depth = np.asarray(infos["depth"])
    assert 1.0 < depth.mean() < 6.0, depth.mean()
    _moment_check(np.asarray(recs["theta"])[:, 200:, :], MEAN, COV, "nuts")


def test_nuts_depth_scales_with_step():
    target = make_mvn_target(MEAN, COV)
    states = init_chain_states(jax.random.key(3), target, 4, jitter_scale=0.5)
    step = make_nuts(target, max_depth=8)
    _, _, i_small = run_chains(step, states, {"step_size": 0.05}, 30)
    _, _, i_big = run_chains(step, states, {"step_size": 0.8}, 30)
    assert np.asarray(i_small["depth"]).mean() > np.asarray(i_big["depth"]).mean() + 1


def test_gp_estimator_gradient_matches_fd():
    x, y = load("pima", subsample=32)
    target = make_gp_classification(x, y, n_importance=8)  # padded: grads flow through masked path
    u = jax.random.normal(jax.random.key(4), target.u_shape)
    theta = jnp.asarray([0.2, -0.1])

    g = jax.grad(lambda t: target.log_lik_est(t, u))(theta)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-2
    for i in range(2):
        tp = theta.at[i].add(eps)
        tm = theta.at[i].add(-eps)
        fd = (
            float(target.log_lik_est(tp, u)) - float(target.log_lik_est(tm, u))
        ) / (2 * eps)
        assert abs(fd - float(g[i])) < 0.05 * max(abs(fd), 1.0), (i, fd, float(g[i]))


def test_aux_nuts_toy_posterior():
    target = make_gaussian_toy(n_importance=16, noise_frac=0.3)
    states = init_chain_states(jax.random.key(5), target, 8, jitter_scale=0.5)
    step = make_aux_nuts(target)
    _, recs, infos = run_chains(step, states, {"nuts": {"step_size": 0.4}}, 1200)
    theta = np.asarray(recs["theta"])[:, 300:, :]
    _moment_check(
        theta,
        np.asarray(target.posterior_mean, np.float64),
        np.asarray(target.posterior_cov, np.float64),
        "aux_nuts",
    )


def test_dual_averaging_warmup_mvn():
    """Dual averaging self-tunes NUTS from a terrible step size on an
    anisotropic MVN; the mass-matrix warmup learns the scales (SURVEY.md
    §2.2 'dual-averaging step-size adaptation')."""
    from auxpm_tpu.samplers.adaptation import warmup

    mean = np.array([0.0, 0.0, 0.0])
    cov = np.diag([25.0, 1.0, 0.04])  # 25:1 scale ratio per axis
    target = make_mvn_target(mean, cov)
    states = init_chain_states(jax.random.key(2), target, 64, jitter_scale=1.0)
    from auxpm_tpu.samplers.composite import THETA_ONLY

    step = THETA_ONLY["nuts"](target)

    def run_fn(t, s, p, n):
        return run_chains(t, s, p, n)

    params = {"nuts": {"step_size": 5.0}}  # hopeless start
    states, params, _hist = warmup(run_fn, states, params, 4, 60, step=step)

    # learned mass ~ posterior variances; step frozen at eps_bar
    inv_mass = np.asarray(params["nuts"]["inv_mass"])
    ratio = inv_mass / np.diag(cov)
    assert np.all(ratio > 0.33) and np.all(ratio < 3.0), inv_mass
    eps = params["nuts"]["step_size"]
    assert 0.05 < eps < 5.0, eps

    # frozen kernel achieves the target acceptance, no divergences
    _, recs, infos = run_chains(step, states, params, 400)
    acc = float(np.asarray(infos["nuts/accept_prob"]).mean())
    assert acc > 0.6, acc
    assert float(np.asarray(infos["nuts/diverged"]).sum()) == 0.0
    _moment_check(np.asarray(recs["theta"])[:, 100:, :], mean, cov, "da_nuts")


def test_dual_averaging_warmup_gp_nuts():
    """VERDICT r1 item 4 done-criterion: NUTS on the GP target self-tunes
    from step_size=1.0 to >=0.6 mean accept statistic with zero
    divergences."""
    from auxpm_tpu.samplers.adaptation import warmup

    x, y = load("pima", subsample=48)
    target = make_gp_classification(
        x, y, n_importance=8, pad_to_tiles=False, name="gp_da"
    )
    states = init_chain_states(jax.random.key(3), target, 16, jitter_scale=0.3)
    step = make_aux_nuts(target)

    def run_fn(t, s, p, n):
        return run_chains(t, s, p, n)

    params = {"nuts": {"step_size": 1.0}}
    states, params, _ = warmup(run_fn, states, params, 3, 25, step=step)

    _, _, infos = run_chains(step, states, params, 50)
    acc = float(np.asarray(infos["nuts/accept_prob"]).mean())
    assert acc >= 0.6, (acc, params["nuts"])
    assert float(np.asarray(infos["nuts/diverged"]).sum()) == 0.0
