"""Pseudo-marginal Metropolis-Hastings (Andrieu & Roberts 2009).

Reference call stack reproduced in SURVEY.md §3.2 (pinned by
BASELINE.json:5 "pseudo-marginal Metropolis-Hastings ... MH accept loops"):

    theta' = theta + step_size * N(0, I_d)      (random-walk proposal)
    u'     ~ N(0, I)                            (FRESH auxiliary draws)
    log a  = log p(theta') + log L̂(theta',u') - log p(theta) - log L̂(theta,u)
    accept iff log Uniform < log a              (symmetric q cancels)

The defining PM-MH move is the fresh ``u'`` each proposal: the estimate is
re-drawn jointly with theta, so the chain targets the exact marginal but can
stick when an upward-noise L̂ is locked into the accepted state (the
pathology the auxiliary updates fix; Murray & Graham 2016 §2).

TPU design: one branch-free step — the accept is a ``jnp.where`` select, not
control flow — so ``vmap`` over thousands of chains maps onto pure vector
ops with no divergence (SURVEY.md §2.3 row "DP -> chain parallelism").

Params:
  step_size: scalar or (d,) random-walk scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import ChainState, make_u_normal


def make_pm_mh(target, particle_axis=None):
    """``particle_axis``: mesh axis name when u is particle-sharded — the
    fresh u' draw then covers only this shard's rows (blocked per-block keys
    via ``core.state.make_u_normal`` for bitwise TP invariance); all other
    draws stay replicated across the particle group."""
    draw_u = make_u_normal(target, particle_axis)

    def step(state: ChainState, params: dict):
        step_size = params.get("step_size", 0.5)
        key, k_prop, k_u, k_acc = jax.random.split(state.key, 4)

        theta_p = state.theta + step_size * jax.random.normal(
            k_prop, state.theta.shape, state.theta.dtype
        )
        u_p = draw_u(k_u, state.u)
        log_lik_p = target.log_lik_est(theta_p, u_p)

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
            u=jnp.where(accept, u_p, state.u),
            log_lik_hat=jnp.where(accept, log_lik_p, state.log_lik_hat),
            key=key,
            extras=refresh_target_cache(target, state.extras, theta_new),
        )
        info = {
            "accept": accept.astype(jnp.float32),
            "log_accept_ratio": jnp.minimum(log_accept, 0.0),
        }
        return new_state, info

    return step
