"""Hamiltonian Monte Carlo on theta (u held fixed).

BASELINE.json:5 mandates "standard NUTS/HMC ... baselines for the same
targets" — absent from the reference (SURVEY.md §2.2).  The potential is the
pseudo-marginal conditional

    U(theta) = -[log p(theta) + log L̂(theta, u)]

which is differentiable in theta because the estimator is a deterministic
chain of Gram -> Cholesky -> whiten -> log-lik (JAX differentiates through
``jnp.linalg.cholesky``); composing with the ESS u-update gives a valid
auxiliary sampler, exactly the structure used for SMC's "NUTS rejuvenation"
(BASELINE.json:11).

TPU design: the leapfrog integrator is a ``lax.fori_loop`` of vector ops +
one estimator gradient per step; under ``vmap`` all chains integrate in
lock-step (static L).  The accept is branch-free.

Params:
  step_size: leapfrog step size (scalar).
  n_leapfrog: MAXIMUM number of leapfrog steps (default 8).  The actual
    count each step is drawn uniformly from {1..n_leapfrog}: fixed-length
    HMC resonates on near-Gaussian targets (trajectory ~ oscillation period
    makes second moments mix pathologically slowly — observed directly on
    the MVN validation target), and uniform jittering is the standard cure
    (Neal 2011 §3.2).
  inv_mass: diagonal inverse mass (scalar or (d,), default 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import ChainState


def potential_fn(target, u):
    def u_fn(theta):
        return -(target.log_prior(theta) + target.log_lik_est(theta, u))

    return u_fn


def leapfrog(z, r, grad, eps, inv_mass, n_steps, value_and_grad):
    """Standard leapfrog; returns (z, r, grad, potential) after n_steps."""

    def body(_, carry):
        z, r, g, _pe = carry
        r = r - 0.5 * eps * g
        z = z + eps * inv_mass * r
        pe, g = value_and_grad(z)
        r = r - 0.5 * eps * g
        return z, r, g, pe

    pe0 = jnp.asarray(0.0, z.dtype)
    return jax.lax.fori_loop(0, n_steps, body, (z, r, grad, pe0))


def make_hmc(target):
    def step(state: ChainState, params: dict):
        eps = params.get("step_size", 0.1)
        n_leapfrog = params.get("n_leapfrog", 8)
        inv_mass = jnp.asarray(params.get("inv_mass", 1.0), state.theta.dtype)

        key, k_mom, k_acc, k_traj = jax.random.split(state.key, 4)
        u_fn = potential_fn(target, state.u)
        vg = jax.value_and_grad(u_fn)

        n_steps = jax.random.randint(
            k_traj, (), 1, jnp.asarray(n_leapfrog, jnp.int32) + 1
        )
        pe0, g0 = vg(state.theta)
        # r ~ N(0, M): sample with std = 1/sqrt(inv_mass)
        r0 = jax.random.normal(k_mom, state.theta.shape, state.theta.dtype) / jnp.sqrt(
            inv_mass
        )
        h0 = pe0 + 0.5 * jnp.sum(inv_mass * r0 * r0)

        z1, r1, _, pe1 = leapfrog(state.theta, r0, g0, eps, inv_mass, n_steps, vg)
        h1 = pe1 + 0.5 * jnp.sum(inv_mass * r1 * r1)

        delta_h = h0 - h1
        diverged = ~jnp.isfinite(delta_h) | (delta_h < -1000.0)
        log_u = jnp.log(jax.random.uniform(k_acc, (), state.theta.dtype))
        accept = (log_u < delta_h) & ~diverged

        new_theta = jnp.where(accept, z1, state.theta)
        new_log_lik = jnp.where(
            accept, -pe1 - target.log_prior(z1), state.log_lik_hat
        )
        from auxpm_tpu.core.state import refresh_target_cache

        new_state = state.replace(
            theta=new_theta,
            log_lik_hat=new_log_lik,
            key=key,
            extras=refresh_target_cache(target, state.extras, new_theta),
        )
        info = {
            "accept": accept.astype(jnp.float32),
            "accept_prob": jnp.exp(jnp.minimum(jnp.where(diverged, -jnp.inf, delta_h), 0.0)),
            "diverged": diverged.astype(jnp.float32),
        }
        return new_state, info

    return step
