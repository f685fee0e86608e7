"""Auxiliary PM slice sampling on the Gaussian toy: exactness + sticking fix.

SURVEY.md §4.3: each composite kernel must recover the closed-form posterior
moments within MC error; the auxiliary updates must beat PM-MH's sticking
pathology on a noisy estimator (Murray & Graham 2016 §2 vs §4).
"""

import jax
import numpy as np

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.gaussian_toy import make_gaussian_toy
from auxpm_tpu.samplers.chain import run_chains
from auxpm_tpu.samplers.composite import SAMPLERS
from auxpm_tpu.utils.diagnostics import effective_sample_size, potential_scale_reduction


def _run(sampler_name, target, params, n_chains=16, n_steps=2500, burn=500, seed=0):
    states = init_chain_states(jax.random.key(seed), target, n_chains, jitter_scale=0.5)
    step = SAMPLERS[sampler_name](target)
    states, recs, infos = run_chains(step, states, params, n_steps)
    theta = np.asarray(recs["theta"])[:, burn:, :]
    return theta, infos


def _check_moments(theta, target, label):
    mean = theta.reshape(-1, theta.shape[-1]).mean(0)
    ess = effective_sample_size(theta)
    rhat = potential_scale_reduction(theta)
    exp_mean = np.asarray(target.posterior_mean, np.float64)
    exp_cov = np.asarray(target.posterior_cov, np.float64)
    se = np.sqrt(np.diag(exp_cov) / np.maximum(ess, 1.0))
    assert np.all(np.abs(mean - exp_mean) < 5 * se), (label, mean, exp_mean, se, ess)
    assert np.all(rhat < 1.15), (label, rhat)
    var = theta.reshape(-1, theta.shape[-1]).var(0)
    assert np.all(np.abs(var - np.diag(exp_cov)) < 0.4 * np.diag(exp_cov)), (
        label,
        var,
        np.diag(exp_cov),
    )
    return ess


def test_aux_slice_recovers_posterior():
    target = make_gaussian_toy(n_importance=16, noise_frac=0.3)
    theta, infos = _run("aux_slice", target, {"slice_theta": {"widths": 2.0}})
    ess = _check_moments(theta, target, "aux_slice")
    assert np.all(ess > 100)


def test_aux_slice_rd_and_aux_mh_recover_posterior():
    target = make_gaussian_toy(n_importance=16, noise_frac=0.3)
    theta, _ = _run("aux_slice_rd", target, {"slice_theta": {"widths": 2.0}}, seed=1)
    _check_moments(theta, target, "aux_slice_rd")
    theta, infos = _run("aux_mh", target, {"mh_theta": {"step_size": 0.8}}, seed=2)
    _check_moments(theta, target, "aux_mh")
    acc = float(np.asarray(infos["mh_theta/accept"]).mean())
    assert 0.1 < acc < 0.95


def test_aux_slice_fixes_sticking():
    """With a very noisy estimator (S=2, tiny noise_frac), PM-MH sticks while
    the auxiliary slice sampler keeps moving (paper's headline phenomenon)."""
    target = make_gaussian_toy(n_importance=2, noise_frac=0.05)
    n_steps = 800

    theta_mh, infos_mh = _run(
        "pm_mh", target, {"step_size": 0.5}, n_chains=8, n_steps=n_steps, burn=0, seed=3
    )
    theta_aux, infos_aux = _run(
        "aux_slice",
        target,
        {"slice_theta": {"widths": 2.0}},
        n_chains=8,
        n_steps=n_steps,
        burn=0,
        seed=3,
    )

    # Fraction of iterations where the chain's theta actually changed.
    def move_frac(theta):
        moved = np.any(np.diff(theta, axis=1) != 0, axis=-1)
        return moved.mean()

    mf_mh = move_frac(theta_mh)
    mf_aux = move_frac(theta_aux)
    assert mf_aux > 0.9, mf_aux  # slice moves essentially every iteration
    assert mf_mh < 0.5, mf_mh  # noisy-estimator PM-MH sticks
    assert mf_aux > 2 * mf_mh


def test_joint_slice_recovers_posterior():
    """The paper's joint (theta, u) update family (SURVEY §2.1 row 9,
    samplers/joint_slice.py): pure joint slice moves alone must be ergodic
    and exact on the toy (the u-rotation coupled to the theta direction
    refreshes the estimator as theta moves)."""
    target = make_gaussian_toy(n_importance=16, noise_frac=0.3)
    theta, infos = _run(
        "joint_slice",
        target,
        {"joint_slice": {"width": 2.0, "angle_scale": 1.2}},
        seed=3,
    )
    _check_moments(theta, target, "joint_slice")
    assert float(np.asarray(infos["joint_slice/moved"]).mean()) > 0.9


def test_joint_mh_recovers_posterior_and_fixes_sticking():
    """Joint RW-MH + pCN-u: exact on the toy; with a noisy estimator the
    correlated u proposal (small rho) must keep the chain moving where
    fresh-u PM-MH sticks."""
    target = make_gaussian_toy(n_importance=16, noise_frac=0.3)
    theta, infos = _run(
        "joint_mh", target, {"joint_mh": {"step_size": 0.8, "rho": 0.7}}, seed=4
    )
    _check_moments(theta, target, "joint_mh")

    # sticking comparison on a noisy estimator (cf. test_aux_slice_fixes_sticking)
    noisy = make_gaussian_toy(n_importance=2, noise_frac=0.05)
    _, infos_pm = _run(
        "pm_mh", noisy, {"pm_mh": {"step_size": 0.6}}, n_steps=800, burn=0, seed=5
    )
    _, infos_jm = _run(
        "joint_mh",
        noisy,
        {"joint_mh": {"step_size": 0.6, "rho": 0.15}},
        n_steps=800,
        burn=0,
        seed=5,
    )
    acc_pm = float(np.asarray(infos_pm["accept"]).mean())
    acc_jm = float(np.asarray(infos_jm["joint_mh/accept"]).mean())
    assert acc_jm > 2.0 * acc_pm, (acc_jm, acc_pm)


def test_aux_slice_joint_recovers_posterior():
    target = make_gaussian_toy(n_importance=16, noise_frac=0.3)
    theta, _ = _run(
        "aux_slice_joint",
        target,
        {"slice_theta": {"widths": 2.0}, "joint_slice": {"width": 2.0}},
        seed=6,
    )
    _check_moments(theta, target, "aux_slice_joint")
