"""Geweke-style joint invariance test for every transition kernel.

SURVEY.md §4.3: "Geweke-style joint test (prior-sample → transition → still
prior-distributed) for the composite kernel."  Construction: a target whose
likelihood estimator is CONSTANT (log L̂ ≡ 0), so the exact stationary joint
is prior(theta) ⊗ N(u; 0, I) with prior = N(0, I_d).  We draw the initial
population exactly from that joint, run many steps of each kernel over many
chains, and check the final population is still exactly prior-distributed:
first/second/fourth moments of theta, first/second of u, and theta-u
decorrelation, all against CLT error bars.

Any bug in masked bounded loops, per-lane PRNG threading, accept logic, or
state plumbing shows up as drift away from the prior — this is the moral
equivalent of the reference era's "getting it right" checks, covering
kernels (HMC/NUTS/SMC-rejuvenation paths included) that have no closed-form
posterior test elsewhere.
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auxpm_tpu.core.state import ChainState
from auxpm_tpu.models.base import Target
from auxpm_tpu.samplers.chain import run_chains
from auxpm_tpu.samplers.composite import SAMPLERS

D = 2
U_SHAPE = (4, 8)


def _const_lik_target():
    def log_prior(theta):
        return -0.5 * jnp.sum(theta * theta) - 0.5 * D * jnp.log(2.0 * jnp.pi)

    def log_lik_est(theta, u):
        # constant, but keep a zero-valued dependence so autodiff paths
        # (HMC/NUTS) see a well-defined gradient of the right shape
        return 0.0 * jnp.sum(theta) + 0.0 * jnp.sum(u)

    return Target(
        d=D,
        u_shape=U_SHAPE,
        log_prior=log_prior,
        log_lik_est=log_lik_est,
        theta_init=jnp.zeros((D,), jnp.float32),
        name="const_lik",
        sample_prior=lambda key: jax.random.normal(key, (D,), jnp.float32),
    )


def _prior_population(key, target, n):
    k_t, k_u, k_c = jax.random.split(key, 3)
    theta = jax.random.normal(k_t, (n, D), jnp.float32)
    u = jax.random.normal(k_u, (n,) + U_SHAPE, jnp.float32)
    return ChainState(
        theta=theta,
        u=u,
        log_lik_hat=jnp.zeros((n,), jnp.float32),
        key=jax.random.split(k_c, n),
    )


PARAMS = {
    "pm_mh": {"pm_mh": {"step_size": 0.8}},
    "aux_slice": {"slice_theta": {"widths": 2.0}},
    "aux_slice_rd": {"slice_theta": {"widths": 2.0}},
    "aux_slice_pcrd": {
        "slice_theta": {"widths": 2.0},
        "slice_theta_rd": {"widths": 2.0},
    },
    "aux_slice_joint": {
        "slice_theta": {"widths": 2.0},
        "joint_slice": {"width": 2.0},
    },
    "aux_mh": {"mh_theta": {"step_size": 0.8}},
    "aux_hmc": {"hmc": {"step_size": 0.3, "n_leapfrog": 6}},
    "aux_nuts": {"nuts": {"step_size": 0.3}},
    "joint_slice": {"joint_slice": {"width": 2.0, "angle_scale": 1.2}},
    "joint_mh": {"joint_mh": {"step_size": 0.8, "rho": 0.5}},
}


@pytest.mark.parametrize(
    "name", sorted(SAMPLERS) + ["aux_slice_noso", "aux_slice_ess4"]
)
def test_prior_invariance(name):
    target = _const_lik_target()
    if name == "aux_slice_noso":
        # shrinkage-only slice variant (max_step_out=0, Neal 2003 §4.1)
        step = SAMPLERS["aux_slice"](target)
        params = {"slice_theta": {"widths": 2.5, "max_step_out": 0}}
    elif name == "aux_slice_ess4":
        # repeated ESS u-updates per iteration (amortised prepare)
        from auxpm_tpu.samplers.composite import make_aux_slice

        step = make_aux_slice(target, n_ess=4)
        params = {"slice_theta": {"widths": 2.0}}
    else:
        step = SAMPLERS[name](target)
        params = PARAMS[name]
    n_chains, n_steps = 4096, 25
    # deterministic per-kernel seed: Python's hash() is salted per process
    # (PYTHONHASHSEED), which would make any CLT-bound failure unreproducible
    seed = zlib.crc32(name.encode()) % (2**31)
    states = _prior_population(jax.random.key(seed), target, n_chains)
    states, _, _ = run_chains(step, states, params, n_steps)

    theta = np.asarray(states.theta, np.float64)  # (n_chains, D)
    u = np.asarray(states.u, np.float64).reshape(n_chains, -1)

    se = 1.0 / np.sqrt(n_chains)
    # theta ~ N(0, I): mean 0, var 1, kurtosis 3 (4th moment), per coordinate
    assert np.all(np.abs(theta.mean(0)) < 5 * se), theta.mean(0)
    assert np.all(np.abs(theta.var(0) - 1.0) < 5 * np.sqrt(2) * se), theta.var(0)
    assert np.all(np.abs((theta**4).mean(0) - 3.0) < 5 * np.sqrt(96) * se)
    # u ~ N(0, I): pooled moments (n_chains * 32 samples)
    se_u = 1.0 / np.sqrt(u.size)
    assert abs(u.mean()) < 5 * se_u
    assert abs(u.var() - 1.0) < 5 * np.sqrt(2) * se_u
    # theta-u independence: cross-correlation of theta_0 with pooled u mean
    r = np.corrcoef(theta[:, 0], u.mean(1))[0, 1]
    assert abs(r) < 5 * se


# ---------------------------------------------------------------------------
# Noisy-estimator variant (VERDICT r3 weak #6): with the constant-likelihood
# target the ESS bracket NEVER shrinks (log L̂' = 0 >= log_y always) and slice
# probes trivially pass, so the invariance net above has a hole exactly over
# the masked bounded-loop logic.  Close it with an estimator that varies with
# u but keeps the joint stationary law in closed form:
#
#     log L̂(theta, u) = -eps/2 ||u||^2
#     => pi(theta, u) ∝ N(theta; 0, I) N(u; 0, I) exp(-eps/2 ||u||^2)
#                     = N(theta; 0, I) ⊗ N(u; 0, (1+eps)^{-1} I)
#
# Initialise EXACTLY from that joint; any correct kernel preserves it, and
# because the estimator moves with u, the ESS bracket-shrink and slice
# step-out/shrink branches genuinely iterate under the check (asserted).
# ---------------------------------------------------------------------------

_EPS = 1.0


def _noisy_lik_target():
    def log_prior(theta):
        return -0.5 * jnp.sum(theta * theta) - 0.5 * D * jnp.log(2.0 * jnp.pi)

    def log_lik_est(theta, u):
        return -0.5 * _EPS * jnp.sum(u * u) + 0.0 * jnp.sum(theta)

    return Target(
        d=D,
        u_shape=U_SHAPE,
        log_prior=log_prior,
        log_lik_est=log_lik_est,
        theta_init=jnp.zeros((D,), jnp.float32),
        name="noisy_lik",
        sample_prior=lambda key: jax.random.normal(key, (D,), jnp.float32),
    )


def _noisy_joint_population(key, target, n):
    """Exact samples from pi(theta, u) above, with the cached log L̂ set."""
    k_t, k_u, k_c = jax.random.split(key, 3)
    theta = jax.random.normal(k_t, (n, D), jnp.float32)
    u = jax.random.normal(k_u, (n,) + U_SHAPE, jnp.float32) / np.sqrt(
        1.0 + _EPS
    )
    ll = jax.vmap(target.log_lik_est)(theta, u)
    return ChainState(theta=theta, u=u, log_lik_hat=ll,
                      key=jax.random.split(k_c, n))


@pytest.mark.parametrize("name", sorted(SAMPLERS) + ["aux_slice_ess4"])
def test_noisy_estimator_invariance(name):
    target = _noisy_lik_target()
    if name == "aux_slice_ess4":
        from auxpm_tpu.samplers.composite import make_aux_slice

        step = make_aux_slice(target, n_ess=4)
        params = {"slice_theta": {"widths": 2.0}}
    else:
        step = SAMPLERS[name](target)
        params = PARAMS[name]
    n_chains, n_steps = 4096, 25
    seed = zlib.crc32(("noisy:" + name).encode()) % (2**31)
    states = _noisy_joint_population(jax.random.key(seed), target, n_chains)
    states, _, infos = run_chains(step, states, params, n_steps)

    # the hole this test closes: the masked loops must actually ITERATE
    if any(k.startswith("ess_u/") for k in infos):
        ns = np.asarray(infos["ess_u/n_shrink"], np.float64)
        assert ns.mean() > 0.05, f"ESS bracket never shrank (mean {ns.mean()})"
    if any(k.startswith("slice_theta/") for k in infos):
        npb = np.asarray(infos["slice_theta/n_probe"], np.float64)
        assert npb.mean() > 1.0, f"slice loop never iterated ({npb.mean()})"

    theta = np.asarray(states.theta, np.float64)
    u = np.asarray(states.u, np.float64).reshape(n_chains, -1)

    se = 1.0 / np.sqrt(n_chains)
    assert np.all(np.abs(theta.mean(0)) < 5 * se), theta.mean(0)
    assert np.all(np.abs(theta.var(0) - 1.0) < 5 * np.sqrt(2) * se), theta.var(0)
    # u ~ N(0, (1+eps)^{-1} I): pooled moments
    u_var = 1.0 / (1.0 + _EPS)
    se_u = 1.0 / np.sqrt(u.size)
    assert abs(u.mean()) < 5 * np.sqrt(u_var) * se_u, u.mean()
    assert abs(u.var() - u_var) < 5 * np.sqrt(2) * u_var * se_u, u.var()
    r = np.corrcoef(theta[:, 0], u.mean(1))[0, 1]
    assert abs(r) < 5 * se
