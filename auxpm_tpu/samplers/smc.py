"""Adaptive-tempering SMC sampler with MCMC rejuvenation.

BASELINE.json:11 (config 5): "SMC with 1M particles sharded over a v4 pod
slice: distributed resampling + NUTS rejuvenation on GP hyperparameters".
Absent from the reference (SURVEY.md §2.2); design follows the standard
SMC-sampler literature (Del Moral et al. 2006; adaptive tempering via ESS
bisection as in PAPERS.md refs).

Pseudo-marginal tempering: particles live on the auxiliary joint.  The
stage-beta distribution is

    pi_beta(theta, u) ∝ p(theta) N(u; 0, I) exp(beta * log L̂(theta, u))

whose theta-marginal at beta=1 is the exact PM posterior (unbiasedness of
exp(log L̂) under u).  Incremental weights between stages are
(beta' - beta) * log L̂_i using each particle's STORED estimate — no extra
estimator calls for weighting.

Per stage (one jitted call; the stage loop runs on host because the number
of stages is data-dependent and small):

1. adaptive beta': bisection so the effective sample size of the
   incremental weights hits ``ess_frac * N`` (clipped at 1.0);
2. normalising-constant accumulation: logZ += logmeanexp(delta * ll);
3. systematic resampling (single uniform; distributed scheme in
   parallel/resampling.py gives the identical result on a mesh);
4. rejuvenation: ``n_mcmc`` steps of any framework transition built
   against the tempered target — aux slice by default, ESS-u + NUTS for
   config 5 ("NUTS rejuvenation").  The tempered target is constructed
   INSIDE the jitted stage with beta as a traced argument, so no
   recompilation across stages.

Width/step adaptation per stage comes from the particle population std —
the SMC analogue of the chain-window adaptation (and free: the population
is right there).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from auxpm_tpu.core.state import ChainState
from auxpm_tpu.parallel.resampling import systematic_resample_indices


def ess_of_logw(log_w):
    """Kish effective sample size of unnormalised log-weights."""
    lse1 = jax.nn.logsumexp(log_w)
    lse2 = jax.nn.logsumexp(2.0 * log_w)
    return jnp.exp(2.0 * lse1 - lse2)


def next_beta(ll, beta, ess_frac, n_bisect=30):
    """Largest beta' in (beta, 1] with ESS((beta'-beta)*ll) >= ess_frac*N,
    found by bisection (ESS is monotone non-increasing in the increment)."""
    n = ll.shape[0]
    target = ess_frac * n

    full = ess_of_logw((1.0 - beta) * ll)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        e = ess_of_logw((mid - beta) * ll)
        return jnp.where(e >= target, mid, lo), jnp.where(e >= target, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, n_bisect, body, (beta, jnp.asarray(1.0, ll.dtype))
    )
    return jnp.where(full >= target, jnp.asarray(1.0, ll.dtype), lo)


def tempered_target(target, beta):
    """Target with likelihood raised to the (traced) power beta."""
    scale = lambda f: (lambda *a: beta * f(*a))  # noqa: E731
    return dataclasses.replace(
        target,
        log_lik_est=scale(target.log_lik_est),
        log_lik_est_u=scale(target.log_lik_est_u) if target.log_lik_est_u else None,
        log_weights_u=None,  # tempering breaks the lse decomposition
        coord_estimators=None,  # closures would use the UNtempered estimator
        log_lik_est_rot=None,  # would return the UNtempered estimate
    )


def make_smc(
    target,
    make_rejuvenation,
    n_particles,
    n_mcmc=2,
    ess_frac=0.5,
    max_stages=100,
    rejuvenation_params=None,
):
    """Build an SMC runner.

    Args:
      make_rejuvenation: ``(tempered_target) -> transition`` factory, e.g.
        ``composite.make_aux_slice`` or an ESS+NUTS composite.
      rejuvenation_params: ``(population_std (d,)) -> params dict`` —
        population-adaptive kernel hyperparameters; default sets slice
        widths / step sizes from the std.

    Returns ``run(key) -> (states, diag)`` where diag holds logZ, betas,
    stage count.
    """
    if rejuvenation_params is None:
        # population-var mass matrix for HMC/NUTS: see
        # smc_sharded._default_rejuvenation_params
        def rejuvenation_params(std):
            var = std * std
            return {
                "slice_theta": {"widths": 2.0 * std},
                "mh_theta": {"step_size": 2.38 * jnp.mean(std) / np.sqrt(target.d)},
                "nuts": {"step_size": 0.5, "inv_mass": var},
                "hmc": {"step_size": 0.5, "inv_mass": var},
            }

    @jax.jit
    def stage(states: ChainState, beta, key):
        ll = states.log_lik_hat  # untempered log L̂ per particle
        beta_new = next_beta(ll, beta, ess_frac)
        delta = beta_new - beta
        log_w = delta * ll
        log_z_inc = jax.nn.logsumexp(log_w) - jnp.log(
            jnp.asarray(float(n_particles), ll.dtype)
        )

        k_res, k_rej = jax.random.split(key)
        idx = systematic_resample_indices(
            log_w, jax.random.uniform(k_res, (), ll.dtype)
        )
        states = jax.tree.map(lambda x: x[idx], states)
        # fresh keys after resampling (copies must decorrelate)
        keys = jax.random.split(k_rej, n_particles)
        states = states.replace(key=keys)

        # population-adaptive kernel params
        std = jnp.std(states.theta, axis=0) + 1e-6
        params = rejuvenation_params(std)

        t_beta = tempered_target(target, beta_new)
        transition = make_rejuvenation(t_beta)
        if hasattr(transition, "stage_names"):
            params = {k: v for k, v in params.items() if k in transition.stage_names}

        def one(s):
            # state carries tempered ll for the kernel, untempered outside
            s = s.replace(log_lik_hat=beta_new * s.log_lik_hat)

            def body(s, _):
                s, info = transition(s, params)
                return s, info

            s, infos = jax.lax.scan(body, s, None, length=n_mcmc)
            s = s.replace(log_lik_hat=s.log_lik_hat / beta_new)
            return s, jax.tree.map(lambda x: x[-1], infos)

        states, infos = jax.vmap(one)(states)
        return states, beta_new, log_z_inc, infos

    def _init_prior(key):
        if target.sample_prior is None:
            raise ValueError(
                f"SMC needs target.sample_prior (target {target.name}): the "
                "stage-0 population must be exact prior draws for logZ."
            )
        keys = jax.random.split(key, n_particles)

        def one(k):
            k_t, k_u, k_carry = jax.random.split(k, 3)
            theta = target.sample_prior(k_t)
            u = jax.random.normal(k_u, target.u_shape, theta.dtype)
            return ChainState(
                theta=theta,
                u=u,
                log_lik_hat=target.log_lik_est(theta, u),
                key=k_carry,
            )

        return jax.vmap(one)(keys)

    init_prior = jax.jit(_init_prior)

    def run(key, init_states=None, record=False):
        k_init, k_loop = jax.random.split(key)
        states = init_prior(k_init) if init_states is None else init_states
        beta = jnp.asarray(0.0, states.theta.dtype)
        log_z = 0.0
        betas = [0.0]
        history = []
        for s in range(max_stages):
            states, beta, log_z_inc, infos = stage(
                states, beta, jax.random.fold_in(k_loop, s)
            )
            log_z += float(log_z_inc)
            b = float(beta)
            betas.append(b)
            if record:
                history.append(np.asarray(states.theta))
            if b >= 1.0:
                break
        diag = {
            "log_z": log_z,
            "betas": betas,
            "n_stages": len(betas) - 1,
            "history": history,
        }
        return states, diag

    return run
