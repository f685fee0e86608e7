"""Chain state pytree.

The reference keeps ``(theta, u, log_lik_hat)`` as loose Python locals inside
per-experiment loops (reference semantics: SURVEY.md §3.1-§3.4, pinned by
BASELINE.json:5 and Murray & Graham 2016 §2-4).  Here the whole sampler state
is one explicit pytree so a single jitted ``step(state) -> state`` can be
``vmap``-ed over a chains axis and sharded over a device mesh, and so that
checkpoint/resume is just saving/loading one pytree.

PRNG discipline: every chain carries its own ``jax.random`` key.  Transitions
split it deterministically (``key, sub = split(key)``) and thread the advanced
key back into the returned state, so a chain's trajectory is a pure function
of its initial state — which makes kill-and-restart-from-checkpoint reproduce
the uninterrupted chain bit-for-bit (SURVEY.md §5, failure recovery).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ChainState:
    """Per-chain sampler state.

    Attributes:
      theta: parameters, shape ``(d,)``.
      u: auxiliary standard-normal draws defining the likelihood estimate,
        shape ``target.u_shape`` (e.g. ``(S, n)`` for S importance samples on
        an n-point GP).  The estimator is a *deterministic* function of
        ``(theta, u)`` — the defining trick of auxiliary pseudo-marginal
        methods (Murray & Graham 2016 §3).
      log_lik_hat: cached ``log_lik_est(theta, u)`` — scalar.
      key: per-chain PRNG key.
      extras: optional per-sampler carried quantities (e.g. cached Cholesky
        factor, momentum, dual-averaging statistics) as a dict pytree.
    """

    theta: jax.Array
    u: jax.Array
    log_lik_hat: jax.Array
    key: jax.Array
    extras: dict[str, Any] = dataclasses.field(default_factory=dict)

    def replace(self, **kw) -> "ChainState":
        return dataclasses.replace(self, **kw)


def init_chain_state(key, target, theta0=None, jitter_scale=0.0):
    """Initialise one chain: draw ``u ~ N(0, I)``, evaluate the estimator.

    Args:
      key: PRNG key for this chain.
      target: an ``auxpm_tpu.models.base.Target``.
      theta0: optional initial parameters ``(d,)``; defaults to the target's
        ``theta_init``.  A chain-specific jitter ``N(0, jitter_scale²)`` is
        added so vmapped chains start overdispersed.
    """
    k_u, k_t, k_carry = jax.random.split(key, 3)
    if theta0 is None:
        theta0 = target.theta_init
    theta0 = jnp.asarray(theta0, dtype=jnp.result_type(float))
    if jitter_scale:
        theta0 = theta0 + jitter_scale * jax.random.normal(
            k_t, theta0.shape, theta0.dtype
        )
    u0 = jax.random.normal(k_u, target.u_shape, theta0.dtype)
    log_lik0 = target.log_lik_est(theta0, u0)
    return ChainState(theta=theta0, u=u0, log_lik_hat=log_lik0, key=k_carry)


def init_chain_states(key, target, n_chains, theta0=None, jitter_scale=0.1):
    """Vectorised init of ``n_chains`` independent chains (batched pytree)."""
    keys = jax.random.split(key, n_chains)
    return jax.vmap(
        lambda k: init_chain_state(k, target, theta0, jitter_scale)
    )(keys)
