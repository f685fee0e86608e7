"""Random-walk MH update of theta | u (auxiliary variant).

The paper's MH-within-auxiliary variant (SURVEY.md §2.1 "Composite auxiliary
PM transitions"): unlike PM-MH, the auxiliary draws u are *held fixed*, so
the accept ratio compares the same estimator noise on both sides —

    theta' = theta + step_size * N(0, I_d)
    log a  = log p(theta') + log L̂(theta', u) - log p(theta) - log L̂(theta, u)

— eliminating the stick-on-lucky-estimate pathology at the price of needing
a separate u refresh (ESS) to mix over the auxiliary block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import ChainState


def make_mh_theta(target):
    def step(state: ChainState, params: dict):
        step_size = params.get("step_size", 0.5)
        key, k_prop, k_acc = jax.random.split(state.key, 3)

        theta_p = state.theta + step_size * jax.random.normal(
            k_prop, state.theta.shape, state.theta.dtype
        )
        log_lik_p = target.log_lik_est(theta_p, state.u)
        log_accept = (
            target.log_prior(theta_p)
            + log_lik_p
            - target.log_prior(state.theta)
            - state.log_lik_hat
        )
        accept = jnp.log(jax.random.uniform(k_acc, (), state.theta.dtype)) < log_accept
        from auxpm_tpu.core.state import refresh_target_cache

        theta_new = jnp.where(accept, theta_p, state.theta)
        new_state = state.replace(
            theta=theta_new,
            log_lik_hat=jnp.where(accept, log_lik_p, state.log_lik_hat),
            key=key,
            extras=refresh_target_cache(target, state.extras, theta_new),
        )
        return new_state, {"accept": accept.astype(jnp.float32)}

    return step
