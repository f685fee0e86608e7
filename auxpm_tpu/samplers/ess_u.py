"""Elliptical slice update of the auxiliary draws u | theta.

Murray, Adams & MacKay (2010) ESS applied to the auxiliary block — the
"whitened elliptical-slice auxiliary updates" of BASELINE.json:9, algorithm
reproduced in SURVEY.md §3.3:

    v ~ N(0, I);  log_y = log L̂(theta, u) + log Uniform(0,1)
    a ~ U(0, 2π); bracket = [a - 2π, a]
    while log L̂(theta, u cos a + v sin a) <= log_y:
        shrink bracket toward 0; redraw a
    u <- u cos a + v sin a

Rejection-free and tuning-free; because u and v enter through a rotation, the
N(0, I) prior on u is preserved exactly, and the update moves all S
importance samples coherently.  Terminates a.s. (a = 0 recovers the current
u whose log-lik exceeds log_y by construction), so the iteration cap is a
safety net, not an approximation: on cap-hit we keep the current state.

TPU design: the bracket/shrink ``while`` becomes a ``lax.while_loop`` whose
carry is pure arrays; under ``vmap`` JAX masks per-chain termination
automatically, so thousands of chains share one compiled loop and each lane
stops consuming randomness once converged (SURVEY.md §3.3 build constraint).
Per-iteration randomness comes from ``fold_in(key, iter)`` so the draw
sequence is independent of other lanes — lanes can never desynchronise.

Params:
  max_iters: bracket-shrink cap (default 32; typical usage is 1-10 probes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import ChainState

_TWO_PI = 2.0 * jnp.pi


def make_ess_u(target, particle_axis=None):
    """``particle_axis``: mesh axis name when u is particle-sharded — the
    u-shaped draw ``v`` must then differ per shard (fold in the axis index)
    while every other draw stays replicated across the particle group."""

    def step(state: ChainState, params: dict):
        max_iters = params.get("max_iters", 32)
        key, k_v, k_h, k_loop = jax.random.split(state.key, 4)

        if particle_axis is not None:
            k_v = jax.random.fold_in(k_v, jax.lax.axis_index(particle_axis))
        v = jax.random.normal(k_v, state.u.shape, state.u.dtype)
        log_y = state.log_lik_hat + jnp.log(
            jax.random.uniform(k_h, (), state.u.dtype)
        )

        # theta is fixed for every probe: amortise the expensive part of the
        # estimator (Gram + Cholesky for GP targets) across the whole loop.
        # Probes carry only the ANGLE; the rotated proposal u' = u cos a +
        # v sin a is either fused into the estimator kernel
        # (target.log_lik_est_rot — Pallas on TPU, never materialising u')
        # or formed on the fly; the accepted u' is materialised ONCE after
        # the loop.
        if target.prepare is not None:
            prepared = target.prepare(state.theta)
            if target.log_lik_est_rot is not None:
                est_rot = lambda a: target.log_lik_est_rot(  # noqa: E731
                    prepared, state.u, v, a
                )
            else:
                est_rot = lambda a: target.log_lik_est_u(  # noqa: E731
                    prepared, state.u * jnp.cos(a) + v * jnp.sin(a)
                )
        else:
            est_rot = lambda a: target.log_lik_est(  # noqa: E731
                state.theta, state.u * jnp.cos(a) + v * jnp.sin(a)
            )

        # Initial angle and bracket.
        a0 = jax.random.uniform(k_loop, (), state.u.dtype) * _TWO_PI
        ll0 = est_rot(a0)

        def cond(carry):
            i, a, a_min, a_max, ll_p, done = carry
            return jnp.logical_and(~done, i < max_iters)

        def body(carry):
            i, a, a_min, a_max, ll_p, done = carry
            # shrink toward 0, redraw angle
            a_min = jnp.where(a < 0, a, a_min)
            a_max = jnp.where(a < 0, a_max, a)
            ku = jax.random.fold_in(k_loop, i + 1)
            a_new = a_min + (a_max - a_min) * jax.random.uniform(
                ku, (), state.u.dtype
            )
            ll_new = est_rot(a_new)
            return (
                i + 1,
                a_new,
                a_min,
                a_max,
                ll_new,
                ll_new > log_y,
            )

        init = (jnp.int32(0), a0, a0 - _TWO_PI, a0, ll0, ll0 > log_y)
        n_shrink, a, _, _, ll_p, done = jax.lax.while_loop(cond, body, init)

        u_p = state.u * jnp.cos(a) + v * jnp.sin(a)  # accepted u', once
        # Cap-hit safety: keep the current state (exact — a no-op move).
        new_state = state.replace(
            u=jnp.where(done, u_p, state.u),
            log_lik_hat=jnp.where(done, ll_p, state.log_lik_hat),
            key=key,
        )
        info = {
            "n_shrink": n_shrink.astype(jnp.float32),
            "moved": done.astype(jnp.float32),
        }
        return new_state, info

    return step
