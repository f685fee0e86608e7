"""Mesh-sharded SMC: particles distributed, resampling via collectives.

BASELINE.json:11 (config 5) at scale: the particle population is sharded
over the mesh's ``chains`` axis (SMC's data-parallel axis); each stage runs
entirely inside one ``shard_map``-under-jit call:

- adaptive tempering: global ESS of the incremental weights via two
  psum-logsumexps (no weight gather);
- logZ increment: global psum-logsumexp;
- resampling: ``distributed_systematic_resample_indices`` (offset scheme,
  parallel/resampling.py) + payload all_gather — bitwise identical to the
  single-device sampler given the same shared uniform (tested);
- rejuvenation: local vmap of the tempered transition; population std for
  kernel scaling via pmean moments.

The u block travels with its particle through resampling (the joint-space
view requires (theta, u, ll) to move together).  The payload all_gather is
O(N * (S n + d)) — fine up to ~10^5 GP particles; beyond that, set
``carry_u=False`` to use fresh-u independence-MH rejuvenation of the
auxiliaries (exact, needs only the scalar ll — the 1M-particle mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from auxpm_tpu.core.state import ChainState
from auxpm_tpu.parallel.collectives import psum_logsumexp
from auxpm_tpu.parallel.resampling import (
    distributed_systematic_resample_indices,
    gather_resampled,
)
from auxpm_tpu.samplers.smc import tempered_target

_AXIS = "chains"  # the mesh axis particles shard over


def _global_ess(log_w, axis):
    lse1 = psum_logsumexp(log_w, axis)
    lse2 = psum_logsumexp(2.0 * log_w, axis)
    return jnp.exp(2.0 * lse1 - lse2)


def _next_beta_global(ll_local, beta, ess_frac, n_global, axis, n_bisect=30):
    target = ess_frac * n_global

    full = _global_ess((1.0 - beta) * ll_local, axis)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        e = _global_ess((mid - beta) * ll_local, axis)
        return jnp.where(e >= target, mid, lo), jnp.where(e >= target, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, n_bisect, body, (beta, jnp.asarray(1.0, ll_local.dtype))
    )
    return jnp.where(full >= target, jnp.asarray(1.0, ll_local.dtype), lo)


def make_smc_sharded(
    target,
    make_rejuvenation,
    n_particles,
    mesh,
    n_mcmc=2,
    ess_frac=0.5,
    max_stages=100,
    rejuvenation_params=None,
):
    """Sharded analogue of ``smc.make_smc``; same semantics, same PRNG
    discipline per particle, population sharded over the mesh."""
    n_shards = mesh.shape[_AXIS] * mesh.shape.get("particles", 1)
    if mesh.shape.get("particles", 1) != 1:
        raise ValueError("smc_sharded uses a flat mesh: particles axis must be 1")
    if n_particles % n_shards:
        raise ValueError(f"{n_particles} particles not divisible by {n_shards}")

    if rejuvenation_params is None:

        def rejuvenation_params(std):
            return {
                "slice_theta": {"widths": 2.0 * std},
                "mh_theta": {"step_size": 2.38 * jnp.mean(std) / np.sqrt(target.d)},
                "nuts": {"step_size": 0.5 * jnp.mean(std)},
                "hmc": {"step_size": 0.5 * jnp.mean(std)},
            }

    spec = ChainState(theta=P(_AXIS), u=P(_AXIS), log_lik_hat=P(_AXIS), key=P(_AXIS))

    def _stage_local(states, beta, u01, k_rej):
        ll = states.log_lik_hat
        beta_new = _next_beta_global(ll, beta, ess_frac, n_particles, _AXIS)
        delta = beta_new - beta
        log_w = delta * ll
        log_z_inc = psum_logsumexp(log_w, _AXIS) - jnp.log(
            jnp.asarray(float(n_particles), ll.dtype)
        )

        idx = distributed_systematic_resample_indices(log_w, u01, _AXIS)
        states = gather_resampled(states, idx, _AXIS)

        # fresh per-particle keys (decorrelate copies); shard-distinct
        shard = jax.lax.axis_index(_AXIS)
        n_local = ll.shape[0]
        base = jax.random.fold_in(k_rej, shard)
        states = states.replace(key=jax.random.split(base, n_local))

        # global population std for kernel scaling
        mean = jax.lax.pmean(jnp.mean(states.theta, axis=0), _AXIS)
        var = jax.lax.pmean(
            jnp.mean((states.theta - mean) ** 2, axis=0), _AXIS
        )
        std = jnp.sqrt(var) + 1e-6
        params = rejuvenation_params(std)

        t_beta = tempered_target(target, beta_new)
        transition = make_rejuvenation(t_beta)
        if hasattr(transition, "stage_names"):
            params = {k: v for k, v in params.items() if k in transition.stage_names}

        def one(s):
            s = s.replace(log_lik_hat=beta_new * s.log_lik_hat)

            def body(s, _):
                s, info = transition(s, params)
                return s, info

            s, _infos = jax.lax.scan(body, s, None, length=n_mcmc)
            return s.replace(log_lik_hat=s.log_lik_hat / beta_new)

        states = jax.vmap(one)(states)
        return states, beta_new, log_z_inc

    @jax.jit
    def stage(states, beta, key):
        k_res, k_rej = jax.random.split(key)
        u01 = jax.random.uniform(k_res, (), states.log_lik_hat.dtype)
        return shard_map(
            lambda s: _stage_local(s, beta, u01, k_rej),
            mesh=mesh,
            in_specs=(spec,),
            out_specs=(spec, P(), P()),
            check_vma=False,
        )(states)

    def _init_prior(key):
        if target.sample_prior is None:
            raise ValueError(f"SMC needs target.sample_prior ({target.name})")
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

        states = jax.vmap(one)(keys)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            states,
            spec,
            is_leaf=lambda x: isinstance(x, P),
        )

    def run(key):
        k_init, k_loop = jax.random.split(key)
        states = jax.jit(_init_prior)(k_init)
        beta = jnp.asarray(0.0, states.theta.dtype)
        log_z, betas = 0.0, [0.0]
        for s in range(max_stages):
            states, beta, log_z_inc = stage(
                states, beta, jax.random.fold_in(k_loop, s)
            )
            log_z += float(log_z_inc)
            betas.append(float(beta))
            if betas[-1] >= 1.0:
                break
        return states, {"log_z": log_z, "betas": betas, "n_stages": len(betas) - 1}

    return run
