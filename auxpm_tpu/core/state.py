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


def blocked_normal(key, local_shape, dtype, n_blocks_global, s_global,
                   particle_axis=None):
    """Draw a u-shaped standard-normal block-by-block with per-block keys.

    The draw for global row-block b is ``normal(fold_in(key, b), ...)`` —
    a fixed function of (key, b) — so a particle-sharded sampler (local
    rows = one contiguous slice of the global rows) reproduces exactly the
    rows the unsharded sampler draws: fold in the GLOBAL block ids
    ``axis_index * nb_local + arange(nb_local)``.  Together with the
    blocked estimator reduction (ops/logsumexp.blocked_logsumexp) this
    makes particle-sharded chains bitwise-equal to unsharded ones
    (SURVEY.md §4.6).

    ``local_shape``: this shard's u shape (rows = s_global/k).
    ``n_blocks_global``: global block count (rows must divide evenly).
    """
    rows_local = local_shape[0]
    k_shards = s_global // rows_local
    nb_local = n_blocks_global // k_shards
    if nb_local * k_shards != n_blocks_global or rows_local % nb_local:
        raise ValueError(
            f"shard rows {rows_local} of {s_global} incompatible with "
            f"{n_blocks_global} global blocks"
        )
    block_shape = (rows_local // nb_local,) + tuple(local_shape[1:])
    b0 = 0
    if particle_axis is not None:
        b0 = jax.lax.axis_index(particle_axis) * nb_local
    gids = b0 + jnp.arange(nb_local)
    draws = jax.vmap(
        lambda b: jax.random.normal(jax.random.fold_in(key, b), block_shape,
                                    dtype)
    )(gids)
    return draws.reshape(local_shape)


def make_u_normal(target, particle_axis=None):
    """Returns ``draw(key, u) -> fresh N(0, I)`` honoring the target's
    canonical block granularity (``target.n_weight_blocks``).

    With blocks (>1), the draw for global row-block b is a fixed function of
    (key, b) via ``blocked_normal`` — identical rows whether u is whole or a
    per-shard slice, the PRNG half of the TP bitwise-invariance contract.
    Targets without blocks keep the legacy scheme (plain draw; under
    sharding, fold in the shard index so shards get distinct rows).
    """
    s_global = target.u_shape[0]
    nb = getattr(target, "n_weight_blocks", 1) or 1

    def draw(key, u):
        rows = u.shape[0]
        if particle_axis is None:
            if nb > 1:
                return blocked_normal(key, u.shape, u.dtype, nb, s_global)
            return jax.random.normal(key, u.shape, u.dtype)
        k_shards = s_global // rows
        if (
            nb > 1
            and k_shards * rows == s_global
            and nb % k_shards == 0
            and rows % (nb // k_shards) == 0
        ):
            return blocked_normal(key, u.shape, u.dtype, nb, s_global,
                                  particle_axis)
        kk = jax.random.fold_in(key, jax.lax.axis_index(particle_axis))
        return jax.random.normal(kk, u.shape, u.dtype)

    return draw


def refresh_target_cache(target, extras, theta_new):
    """Rebuild ``extras["target_cache"]`` for a NEW theta (or pass through).

    Safety net for theta-changing kernels that are not cache-aware (MH,
    NUTS, HMC, joint/rd slice): when a composite mixes them with the
    cached aux-slice kernels, the carried factor would silently go stale —
    a correctness bug, since the cached kernels assume
    ``extras["target_cache"] == target.cache_init(state.theta)``.  Presence
    of the cache is a STATIC pytree-structure fact, so this costs nothing
    when the cache is off.
    """
    if (
        target.cache_init is not None
        and isinstance(extras, dict)
        and "target_cache" in extras
    ):
        return {**extras, "target_cache": target.cache_init(theta_new)}
    return extras


def init_chain_state(key, target, theta0=None, jitter_scale=0.0,
                     with_cache=False):
    """Initialise one chain: draw ``u ~ N(0, I)``, evaluate the estimator.

    Args:
      key: PRNG key for this chain.
      target: an ``auxpm_tpu.models.base.Target``.
      theta0: optional initial parameters ``(d,)``; defaults to the target's
        ``theta_init``.  A chain-specific jitter ``N(0, jitter_scale²)`` is
        added so vmapped chains start overdispersed.
      with_cache: populate ``extras["target_cache"]`` via
        ``target.cache_init`` (carried-factor fast path; see
        models/base.py).  Off by default so existing state layouts —
        checkpoints, SMC particle states — are unchanged.
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
    extras = {}
    if with_cache and target.cache_init is not None:
        extras = {"target_cache": target.cache_init(theta0)}
    return ChainState(
        theta=theta0, u=u0, log_lik_hat=log_lik0, key=k_carry, extras=extras
    )


def init_chain_states(key, target, n_chains, theta0=None, jitter_scale=0.1,
                      with_cache=False):
    """Vectorised init of ``n_chains`` independent chains (batched pytree)."""
    keys = jax.random.split(key, n_chains)
    return jax.vmap(
        lambda k: init_chain_state(k, target, theta0, jitter_scale, with_cache)
    )(keys)
