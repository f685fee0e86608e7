"""SMC correctness (BASELINE config 5 building blocks, SURVEY.md §4).

- Adaptive tempering reaches beta=1; logZ matches the closed-form toy
  evidence within MC error; final particles match posterior moments.
- Systematic resampling: unbiasedness (counts ~ N w_i) and the distributed
  shard_map implementation equals the single-device one bitwise.
- NUTS rejuvenation variant runs and is exact on the toy.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from auxpm_tpu.models.gaussian_toy import make_gaussian_toy
from auxpm_tpu.parallel.mesh import make_mesh
from auxpm_tpu.parallel.resampling import (
    distributed_systematic_resample_indices,
    systematic_resample_indices,
)
from auxpm_tpu.samplers.composite import make_aux_nuts, make_aux_slice
from auxpm_tpu.samplers.smc import ess_of_logw, make_smc, next_beta


def _toy_log_evidence(target):
    """Z = ∫ N(theta; 0, prior_var I) N(y; theta, Sigma_y) dtheta
         = N(y; 0, prior_var I + Sigma_y)."""
    # reconstruct from the target's closed-form pieces
    prior_var = 4.0
    y = np.array([1.0, -0.5])
    sigma_y = np.array([[1.0, 0.4], [0.4, 0.8]])
    c = prior_var * np.eye(2) + sigma_y
    return float(
        -0.5 * y @ np.linalg.solve(c, y)
        - 0.5 * np.linalg.slogdet(2 * np.pi * c)[1]
    )


def test_systematic_resample_counts():
    log_w = jnp.log(jnp.asarray([0.1, 0.4, 0.2, 0.3]))
    counts = np.zeros(4)
    for i in range(200):
        idx = systematic_resample_indices(
            log_w, jax.random.uniform(jax.random.key(i), ())
        )
        counts += np.bincount(np.asarray(idx), minlength=4)
    frac = counts / counts.sum()
    np.testing.assert_allclose(frac, [0.1, 0.4, 0.2, 0.3], atol=0.02)


def test_distributed_resample_matches_single_device():
    n = 64
    log_w = 3.0 * jax.random.normal(jax.random.key(1), (n,))
    u01 = jnp.asarray(0.37)
    want = np.asarray(systematic_resample_indices(log_w, u01))

    mesh = make_mesh(n_chains_shards=1, n_particle_shards=8)
    got = shard_map(
        lambda w: distributed_systematic_resample_indices(w, u01, "particles"),
        mesh=mesh,
        in_specs=P("particles"),
        out_specs=P("particles"),
        check_vma=False,
    )(log_w)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_next_beta_monotone_and_reaches_one():
    ll = jax.random.normal(jax.random.key(2), (512,)) * 3.0
    b1 = float(next_beta(ll, jnp.asarray(0.0), ess_frac=0.5))
    assert 0.0 < b1 <= 1.0
    b2 = float(next_beta(ll, jnp.asarray(b1), ess_frac=0.5))
    assert b2 > b1
    # nearly-flat weights: jump straight to 1
    b3 = float(next_beta(0.001 * ll, jnp.asarray(0.0), ess_frac=0.5))
    assert b3 == 1.0
    # ESS at returned beta respects the threshold
    e = float(ess_of_logw((b1 - 0.0) * ll))
    assert e >= 0.5 * 512 * 0.95


def test_smc_toy_evidence_and_moments():
    target = make_gaussian_toy(n_importance=16, noise_frac=0.5)
    run = make_smc(target, make_aux_slice, n_particles=2048, n_mcmc=2)
    states, diag = run(jax.random.key(3))
    assert diag["betas"][-1] == 1.0
    assert 2 <= diag["n_stages"] < 50

    th = np.asarray(states.theta)
    exp_mean = np.asarray(target.posterior_mean, np.float64)
    exp_cov = np.asarray(target.posterior_cov, np.float64)
    se = np.sqrt(np.diag(exp_cov) / 2048) * 4  # particles correlate a bit
    assert np.all(np.abs(th.mean(0) - exp_mean) < 5 * se), (th.mean(0), exp_mean)
    assert np.all(np.abs(th.var(0) - np.diag(exp_cov)) < 0.3 * np.diag(exp_cov))

    logz_true = _toy_log_evidence(target)
    assert abs(diag["log_z"] - logz_true) < 0.15, (diag["log_z"], logz_true)


def test_smc_nuts_rejuvenation():
    target = make_gaussian_toy(n_importance=8, noise_frac=0.5)
    run = make_smc(target, make_aux_nuts, n_particles=512, n_mcmc=2)
    states, diag = run(jax.random.key(4))
    assert diag["betas"][-1] == 1.0
    th = np.asarray(states.theta)
    exp_mean = np.asarray(target.posterior_mean, np.float64)
    assert np.all(np.abs(th.mean(0) - exp_mean) < 0.25), th.mean(0)


def test_smc_sharded_light_131k_particles():
    """carry_u=False (the 1M-particle mode, VERDICT r1 item 1): 2^17 toy
    particles sharded over 8 devices.  u is never transported — each
    particle carries only (theta, ll, u_key, key) through resampling — yet
    logZ must still match the closed-form toy evidence and the final
    population the closed-form moments."""
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    n = 2**17
    target = make_gaussian_toy(n_importance=16, noise_frac=0.5)
    mesh = make_mesh(n_chains_shards=8)
    run = make_smc_sharded(
        target,
        THETA_ONLY["slice_theta"],
        n_particles=n,
        mesh=mesh,
        n_mcmc=1,
        carry_u=False,
        n_u_mh=2,
        rejuv_batch=4096,
    )
    states, diag = run(jax.random.key(5))
    assert diag["betas"][-1] == 1.0
    assert 2 <= diag["n_stages"] < 50
    # u must have stayed implicit: state's u leaf is raw key data, not (S,)
    assert states.u.shape == (n, 2) and states.u.dtype == jnp.uint32

    th = np.asarray(states.theta)
    exp_mean = np.asarray(target.posterior_mean, np.float64)
    exp_cov = np.asarray(target.posterior_cov, np.float64)
    assert np.all(np.abs(th.mean(0) - exp_mean) < 0.05), th.mean(0)
    assert np.all(np.abs(th.var(0) - np.diag(exp_cov)) < 0.2 * np.diag(exp_cov))
    logz_true = _toy_log_evidence(target)
    assert abs(diag["log_z"] - logz_true) < 0.1, (diag["log_z"], logz_true)
    # the independence-MH u-refresh must actually move (exactness relies on
    # it being a real MH kernel, but mixing relies on it accepting)
    assert all(0.0 < a <= 1.0 for a in diag["u_mh_accept"]), diag["u_mh_accept"]


def test_smc_sharded_light_gp_shapes():
    """carry_u=False on a real GP target (prepare/log_lik_est_u amortised
    IMH path + theta-only NUTS rejuvenation): runs to beta=1 with finite
    state and a plausible posterior."""
    from auxpm_tpu.models.datasets import load
    from auxpm_tpu.models.gp_classification import make_gp_classification
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    x, y = load("pima", subsample=48)
    target = make_gp_classification(
        x, y, n_importance=8, pad_to_tiles=False, name="gp_smc_light"
    )
    mesh = make_mesh(n_chains_shards=8)
    run = make_smc_sharded(
        target,
        THETA_ONLY["nuts"],
        n_particles=256,
        mesh=mesh,
        n_mcmc=1,
        carry_u=False,
        n_u_mh=1,
        rejuv_batch=32,
        max_stages=30,
    )
    states, diag = run(jax.random.key(6))
    assert diag["betas"][-1] == 1.0
    th = np.asarray(states.theta)
    assert np.all(np.isfinite(th))
    assert np.all(np.isfinite(np.asarray(states.log_lik_hat)))
    # carried ll must equal the estimator at (theta, normal(u_key)) — the
    # key<->u invariant the whole mode rests on
    i = 7
    u = jax.random.normal(
        jax.random.wrap_key_data(states.u[i]), target.u_shape, jnp.float32
    )
    ll = float(target.log_lik_est(states.theta[i], u))
    assert abs(ll - float(states.log_lik_hat[i])) < 5e-4 * max(1.0, abs(ll))


def test_smc_sharded_matches_moments_and_logz():
    """Sharded SMC (8 shards) on the toy: exact logZ + moments; stage
    count/beta ladder sane."""
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    target = make_gaussian_toy(n_importance=16, noise_frac=0.5)
    mesh = make_mesh(n_chains_shards=8)
    run = make_smc_sharded(target, make_aux_slice, n_particles=2048, mesh=mesh, n_mcmc=2)
    states, diag = run(jax.random.key(3))
    assert diag["betas"][-1] == 1.0
    th = np.asarray(states.theta)
    exp_mean = np.asarray(target.posterior_mean, np.float64)
    exp_cov = np.asarray(target.posterior_cov, np.float64)
    assert np.all(np.abs(th.mean(0) - exp_mean) < 0.15), th.mean(0)
    assert np.all(np.abs(th.var(0) - np.diag(exp_cov)) < 0.3 * np.diag(exp_cov))
    logz_true = _toy_log_evidence(target)
    assert abs(diag["log_z"] - logz_true) < 0.2, (diag["log_z"], logz_true)


def test_smc_light_gp_u_refresh_floor_s64():
    """VERDICT r2 item 3: a floor on the carry_u=False independence-MH
    u-refresh acceptance at bench-scale S=64 on a REAL GP target at beta=1.
    A collapse to ~0 would mean a frozen-u (rejuvenation-starved, though
    still exact) sampler; IS log-lik-hat spread SHRINKS with S (var ∝ 1/S),
    so S=64 must accept at least as healthily as the S=8 case above."""
    from auxpm_tpu.models.datasets import load
    from auxpm_tpu.models.gp_classification import make_gp_classification
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    x, y = load("pima", subsample=48)
    target = make_gp_classification(
        x, y, n_importance=64, pad_to_tiles=False, name="gp_smc_s64"
    )
    mesh = make_mesh(n_chains_shards=8)
    run = make_smc_sharded(
        target,
        THETA_ONLY["slice_theta"],
        n_particles=256,
        mesh=mesh,
        n_mcmc=1,
        carry_u=False,
        n_u_mh=2,
        rejuv_batch=32,
        max_stages=30,
    )
    states, diag = run(jax.random.key(8))
    assert diag["betas"][-1] == 1.0
    acc = diag["u_mh_accept"]
    # the LAST stage runs at beta -> 1 where acceptance is lowest; a healthy
    # refresh stays well above the frozen-u regime
    assert acc[-1] > 0.1, acc
    assert all(a > 0.05 for a in acc), acc


def test_smc_light_split_dispatch_bitwise():
    """rejuv_dispatches=K splits each stage's rejuvenation into K device
    dispatches over contiguous particle groups (dispatch-wall-time bound,
    e.g. backend watchdogs).  Per-particle math is untouched, so the result
    must be BITWISE-equal to the single-dispatch stage."""
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    target = make_gaussian_toy(n_importance=16, noise_frac=0.5)
    mesh = make_mesh(n_chains_shards=8)

    def run_k(k):
        run = make_smc_sharded(
            target,
            THETA_ONLY["slice_theta"],
            n_particles=2048,
            mesh=mesh,
            n_mcmc=1,
            carry_u=False,
            n_u_mh=2,
            rejuv_batch=64,
            rejuv_dispatches=k,
        )
        return run(jax.random.key(12))

    states1, diag1 = run_k(1)
    states4, diag4 = run_k(4)
    assert diag1["betas"] == diag4["betas"]
    np.testing.assert_array_equal(
        np.asarray(states1.theta), np.asarray(states4.theta)
    )
    np.testing.assert_array_equal(np.asarray(states1.u), np.asarray(states4.u))
    np.testing.assert_array_equal(
        np.asarray(states1.log_lik_hat), np.asarray(states4.log_lik_hat)
    )
    np.testing.assert_allclose(
        np.asarray(diag1["u_mh_accept"]), np.asarray(diag4["u_mh_accept"]),
        rtol=1e-6,
    )


def test_smc_checkpoint_resume_bitwise(tmp_path):
    """Kill-and-restart mid-SMC (VERDICT r3 weak #7 / item 8): a run
    checkpointed per stage, stopped after 2 stages (the fault-injection
    hook), and resumed by a FRESH runner must reproduce the uninterrupted
    run bit-for-bit — final population, tempering ladder, logZ, u-refresh
    acceptances."""
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    target = make_gaussian_toy(n_importance=16, noise_frac=0.5)
    mesh = make_mesh(n_chains_shards=8)
    kw = dict(
        n_particles=2048, mesh=mesh, n_mcmc=1, carry_u=False, n_u_mh=2,
        rejuv_batch=64, ess_frac=0.8,
    )
    key = jax.random.key(21)

    states_ref, diag_ref = make_smc_sharded(
        target, THETA_ONLY["slice_theta"], **kw
    )(key)
    assert diag_ref["betas"][-1] == 1.0 and diag_ref["n_stages"] >= 3

    ckpt = str(tmp_path / "smc_ckpt")
    run_a = make_smc_sharded(
        target, THETA_ONLY["slice_theta"], checkpoint_dir=ckpt, **kw
    )
    run_a(key, stop_after=2)  # "killed" after stage 2's checkpoint

    # resume from the on-disk stage-2 checkpoint with a fresh runner
    states_b, diag_b = make_smc_sharded(
        target, THETA_ONLY["slice_theta"], checkpoint_dir=ckpt, **kw
    )(key)
    assert diag_b["betas"] == diag_ref["betas"]
    assert diag_b["log_z"] == diag_ref["log_z"]
    assert diag_b["u_mh_accept"] == diag_ref["u_mh_accept"]
    np.testing.assert_array_equal(
        np.asarray(states_b.theta), np.asarray(states_ref.theta)
    )
    np.testing.assert_array_equal(
        np.asarray(states_b.u), np.asarray(states_ref.u)
    )
    np.testing.assert_array_equal(
        np.asarray(states_b.log_lik_hat), np.asarray(states_ref.log_lik_hat)
    )

    # a resume under a DIFFERENT run key must refuse the checkpoint
    import pytest as _pytest

    with _pytest.raises(ValueError, match="config hash mismatch"):
        make_smc_sharded(
            target, THETA_ONLY["slice_theta"], checkpoint_dir=ckpt, **kw
        )(jax.random.key(22))


def test_smc_light_u_blocks_toy_exact():
    """Blocked u-refresh (u_blocks=8, VERDICT r3 item 2): per-block keys +
    IMH-within-Gibbs over blocks must stay EXACT — logZ vs the closed-form
    toy evidence and the final population vs closed-form moments — while
    keeping the key-as-u invariant (u leaf = (N, u_blocks, 2) key data)."""
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    n = 2**15
    target = make_gaussian_toy(n_importance=16, noise_frac=0.5)
    mesh = make_mesh(n_chains_shards=8)
    run = make_smc_sharded(
        target,
        THETA_ONLY["slice_theta"],
        n_particles=n,
        mesh=mesh,
        n_mcmc=1,
        carry_u=False,
        n_u_mh=1,
        u_blocks=8,
        rejuv_batch=2048,
    )
    states, diag = run(jax.random.key(31))
    assert diag["betas"][-1] == 1.0
    assert states.u.shape == (n, 8, 2) and states.u.dtype == jnp.uint32

    th = np.asarray(states.theta)
    exp_mean = np.asarray(target.posterior_mean, np.float64)
    exp_cov = np.asarray(target.posterior_cov, np.float64)
    assert np.all(np.abs(th.mean(0) - exp_mean) < 0.08), th.mean(0)
    assert np.all(np.abs(th.var(0) - np.diag(exp_cov)) < 0.25 * np.diag(exp_cov))
    logz_true = _toy_log_evidence(target)
    assert abs(diag["log_z"] - logz_true) < 0.15, (diag["log_z"], logz_true)
    assert all(0.0 < a <= 1.0 for a in diag["u_mh_accept"]), diag["u_mh_accept"]


def test_smc_light_u_blocks_gp_accept_floor_n512():
    """VERDICT r3 item 2 done-criterion: with the blocked refresh the
    u-refresh acceptance at beta=1 on a REAL GP target at n>=512, S=64
    stays >= 0.2 — the regime where the whole-u refresh freezes (measured
    0.11 at n=128 and falling with n, BASELINE.md).  Measured margin here:
    0.87-0.90 at the final stages (16 particles x 8 proposals x stage)."""
    from auxpm_tpu.models.datasets import load
    from auxpm_tpu.models.gp_classification import make_gp_classification
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    x, y = load("pima", subsample=512)
    target = make_gp_classification(
        x, y, n_importance=64, pad_to_tiles=True, name="gp_smc_n512"
    )
    mesh = make_mesh(n_chains_shards=8)
    # mh_theta rejuvenation: 1 estimator call per particle-stage (the
    # cheapest theta-only kernel) — this test measures the U-REFRESH
    # acceptance, not theta mixing, and must fit the CPU suite budget
    run = make_smc_sharded(
        target,
        THETA_ONLY["mh_theta"],
        n_particles=16,
        mesh=mesh,
        n_mcmc=1,
        carry_u=False,
        n_u_mh=1,
        u_blocks=8,
        rejuv_batch=2,
        max_stages=30,
    )
    states, diag = run(jax.random.key(32))
    assert diag["betas"][-1] == 1.0
    acc = diag["u_mh_accept"]
    assert acc[-1] >= 0.2, acc
    assert all(a > 0.05 for a in acc), acc


def test_smc_u_blocks_validation():
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    target = make_gaussian_toy(n_importance=16)
    mesh = make_mesh(n_chains_shards=8)
    with pytest.raises(ValueError, match="carry_u=False"):
        make_smc_sharded(target, THETA_ONLY["slice_theta"], n_particles=64,
                         mesh=mesh, u_blocks=8)
    with pytest.raises(ValueError, match="not divisible"):
        make_smc_sharded(target, THETA_ONLY["slice_theta"], n_particles=64,
                         mesh=mesh, carry_u=False, u_blocks=7)


def test_smc_checkpoint_refuses_u_blocks_mismatch(tmp_path):
    """u_blocks changes the sampled trajectory (per-block generating keys),
    so a resume under a different block count must be REFUSED (r5 fix: the
    knob was missing from the checkpoint config hash); rejuv_dispatches is
    a bitwise-equal re-chunking and must keep resuming fine."""
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    target = make_gaussian_toy(n_importance=16, noise_frac=0.5)
    mesh = make_mesh(n_chains_shards=8)
    ckpt = str(tmp_path / "ub_ckpt")
    kw = dict(n_particles=512, mesh=mesh, n_mcmc=1, carry_u=False, n_u_mh=1,
              rejuv_batch=64, ess_frac=0.8, checkpoint_dir=ckpt)
    key = jax.random.key(41)
    make_smc_sharded(target, THETA_ONLY["slice_theta"], u_blocks=4, **kw)(
        key, stop_after=1
    )
    with pytest.raises(ValueError, match="config hash mismatch"):
        make_smc_sharded(target, THETA_ONLY["slice_theta"], u_blocks=8,
                         **kw)(key)
    # different rejuv_dispatches: resumes (bitwise-equal re-chunking)
    states, diag = make_smc_sharded(
        target, THETA_ONLY["slice_theta"], u_blocks=4, rejuv_dispatches=2,
        **kw
    )(key)
    assert diag["betas"][-1] == 1.0


def test_smc_fulln_flagship_config_cpu(tmp_path):
    """CPU-sized variant of the config-5 FULL-n flagship run (VERDICT r4
    item 7): full synthetic-Pima n=532, key-as-u particles (carry_u=False),
    blocked u-refresh (u_blocks=8), NUTS rejuvenation, split rejuvenation
    dispatches, per-stage checkpointing with bitwise kill-and-resume — the
    exact knob combination of the chip-scale SMC_FULLN_* runs, so the
    flagship path cannot silently regress between chip sessions."""
    from auxpm_tpu.models.datasets import load
    from auxpm_tpu.models.gp_classification import make_gp_classification
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    x, y = load("pima")  # FULL n=532 — the whole point of this test
    target = make_gp_classification(
        x, y, n_importance=8, pad_to_tiles=False, name="gp_fulln_flagship"
    )
    mesh = make_mesh(n_chains_shards=8)

    # CPU-budget tuning: every NUTS leapfrog pays an n=532 Cholesky +
    # VJP, so keep the population tiny, the ladder short (low ess_frac)
    # and the trees shallow (big step off the population-var mass)
    def rejuv_params(std):
        return {"nuts": {"step_size": 1.0, "inv_mass": std * std}}

    kw = dict(
        n_particles=16, mesh=mesh, n_mcmc=1, carry_u=False, n_u_mh=1,
        u_blocks=8, rejuv_batch=8, rejuv_dispatches=2, ess_frac=0.3,
        max_stages=40, rejuvenation_params=rejuv_params,
    )
    key = jax.random.key(31)

    states_ref, diag_ref = make_smc_sharded(
        target, THETA_ONLY["nuts"], **kw
    )(key)
    assert diag_ref["betas"][-1] == 1.0
    assert np.isfinite(diag_ref["log_z"]), diag_ref["log_z"]
    # blocked-refresh acceptance floor at FULL n: the whole-u refresh
    # freezes here (measured 0.11 whole-u at n=128 vs 0.875 blocked at
    # n=532 S=64 on chip); the block-within-Gibbs refresh must stay alive
    assert min(diag_ref["u_mh_accept"]) > 0.05, diag_ref["u_mh_accept"]
    assert np.isfinite(np.asarray(states_ref.theta)).all()
    assert np.isfinite(np.asarray(states_ref.log_lik_hat)).all()

    # kill after stage 1, resume from disk: bit-for-bit continuation
    ckpt = str(tmp_path / "fulln_ckpt")
    make_smc_sharded(
        target, THETA_ONLY["nuts"], checkpoint_dir=ckpt, **kw
    )(key, stop_after=1)
    states_b, diag_b = make_smc_sharded(
        target, THETA_ONLY["nuts"], checkpoint_dir=ckpt, **kw
    )(key)
    assert diag_b["betas"] == diag_ref["betas"]
    assert diag_b["log_z"] == diag_ref["log_z"]
    np.testing.assert_array_equal(
        np.asarray(states_b.theta), np.asarray(states_ref.theta)
    )
    np.testing.assert_array_equal(
        np.asarray(states_b.u), np.asarray(states_ref.u)
    )
