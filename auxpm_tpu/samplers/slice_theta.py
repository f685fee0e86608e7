"""Linear slice sampling of theta | u (Neal 2003) with stepping-out + shrink.

The reference's "slice-sampling bracket/shrink loops" (BASELINE.json:5,
SURVEY.md §3.3) on the conditional

    f(theta') = log p(theta') + log L̂(theta', u)     (u held fixed),

which is a *deterministic* function of theta' because u is part of the chain
state — the key property that turns the pseudo-marginal problem into a
plain slice-sampling problem (Murray & Graham 2016 §4).  Two variants:

- ``make_slice_theta``: per-coordinate updates, coordinate loop unrolled
  (d is small: 2-10 hyperparameters), each with its own width ``w_i``.
- ``make_slice_theta_rd``: one update along a random unit direction.

Algorithm per 1-D update (Neal 2003 §4, "stepping out" fig. 3 + "shrinkage"
fig. 5):

    log_y = f(theta) + log U
    l = x0 - w U1; r = l + w
    while f(l) > log_y and steps < m: l -= w      (step out left)
    while f(r) > log_y and steps < m: r += w      (step out right)
    repeat: x ~ U(l, r)
            if f(x) > log_y: accept
            elif x < x0: l = x else r = x         (shrink)

TPU design: each while becomes a bounded ``lax.while_loop``; every probe
pays one full estimator evaluation (the dominant cost, SURVEY.md §3.1), and
under ``vmap`` all chains advance the same compiled loop with automatic
per-lane termination masks.  Shrinkage terminates a.s.; on cap-hit the
coordinate keeps its current value (exact no-op).

Params:
  widths: scalar or (d,) initial bracket width w.
  max_step_out: cap m on step-out expansions each side (default 8).
  max_shrink: cap on shrink iterations (default 32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import ChainState


def _slice_1d(key, x0, log_fx0, f, w, max_step_out, max_shrink, dtype):
    """One 1-D slice update along scalar coordinate value ``x0``.

    ``f(x) -> (log_post, log_lik)``; log_fx0 is f(x0)[0] (cached).
    Returns (x_new, log_post_new, log_lik_new, n_probe).
    """
    k_h, k_init, k_loop = jax.random.split(key, 3)
    log_y = log_fx0 + jnp.log(jax.random.uniform(k_h, (), dtype))

    u1 = jax.random.uniform(k_init, (), dtype)
    l0 = x0 - w * u1
    r0 = l0 + w

    def probe(x):
        lp, ll = f(x)
        return lp, ll

    # --- step out (left and right run in the same bounded loop) ---
    def so_cond(carry):
        l, r, i, expand_l, expand_r = carry
        return jnp.logical_and(i < max_step_out, jnp.logical_or(expand_l, expand_r))

    def so_body(carry):
        l, r, i, expand_l, expand_r = carry
        lp_l, _ = probe(l)
        lp_r, _ = probe(r)
        expand_l = jnp.logical_and(expand_l, lp_l > log_y)
        expand_r = jnp.logical_and(expand_r, lp_r > log_y)
        l = jnp.where(expand_l, l - w, l)
        r = jnp.where(expand_r, r + w, r)
        return l, r, i + 1, expand_l, expand_r

    l, r, n_so, _, _ = jax.lax.while_loop(
        so_cond, so_body, (l0, r0, jnp.int32(0), jnp.bool_(True), jnp.bool_(True))
    )

    # --- shrinkage ---
    def sh_cond(carry):
        i, l, r, x, lp, ll, done = carry
        return jnp.logical_and(~done, i < max_shrink)

    def sh_body(carry):
        i, l, r, x, lp, ll, done = carry
        kx = jax.random.fold_in(k_loop, i)
        x_new = l + (r - l) * jax.random.uniform(kx, (), dtype)
        lp_new, ll_new = probe(x_new)
        ok = lp_new > log_y
        l = jnp.where(jnp.logical_or(ok, x_new >= x0), l, x_new)
        r = jnp.where(jnp.logical_or(ok, x_new < x0), r, x_new)
        return i + 1, l, r, x_new, lp_new, ll_new, ok

    init = (jnp.int32(0), l, r, x0, log_fx0, jnp.asarray(0.0, dtype), jnp.bool_(False))
    n_sh, _, _, x_new, lp_new, ll_new, done = jax.lax.while_loop(
        sh_cond, sh_body, init
    )
    n_probe = (2 * n_so + n_sh).astype(jnp.float32)
    return (
        jnp.where(done, x_new, x0),
        jnp.where(done, lp_new, log_fx0),
        ll_new,  # only valid when done; caller selects
        done,
        n_probe,
    )


def make_slice_theta(target):
    """Per-coordinate slice sampling of theta | u."""

    def step(state: ChainState, params: dict):
        widths = jnp.broadcast_to(
            jnp.asarray(params.get("widths", 1.0), state.theta.dtype),
            state.theta.shape,
        )
        max_step_out = params.get("max_step_out", 8)
        max_shrink = params.get("max_shrink", 32)
        dtype = state.theta.dtype

        key, *coord_keys = jax.random.split(state.key, state.theta.shape[0] + 1)

        theta = state.theta
        log_lik = state.log_lik_hat
        log_post = target.log_prior(theta) + log_lik
        n_probe_total = jnp.float32(0.0)

        for i in range(target.d):  # d is small & static: unrolled
            def f(x, i=i, theta=theta):
                th = theta.at[i].set(x)
                ll = target.log_lik_est(th, state.u)
                return target.log_prior(th) + ll, ll

            x_new, lp_new, ll_new, done, n_probe = _slice_1d(
                coord_keys[i],
                theta[i],
                log_post,
                f,
                widths[i],
                max_step_out,
                max_shrink,
                dtype,
            )
            theta = theta.at[i].set(x_new)
            log_post = lp_new
            log_lik = jnp.where(done, ll_new, log_lik)
            n_probe_total = n_probe_total + n_probe

        new_state = state.replace(theta=theta, log_lik_hat=log_lik, key=key)
        info = {"n_probe": n_probe_total}
        return new_state, info

    return step


def make_slice_theta_rd(target):
    """Random-direction slice sampling of theta | u (one 1-D update/step)."""

    def step(state: ChainState, params: dict):
        width = jnp.asarray(params.get("widths", 1.0), state.theta.dtype)
        width = jnp.mean(jnp.broadcast_to(width, state.theta.shape))
        max_step_out = params.get("max_step_out", 8)
        max_shrink = params.get("max_shrink", 32)
        dtype = state.theta.dtype

        key, k_dir, k_slice = jax.random.split(state.key, 3)
        direction = jax.random.normal(k_dir, state.theta.shape, dtype)
        direction = direction / jnp.linalg.norm(direction)

        theta0 = state.theta
        log_post0 = target.log_prior(theta0) + state.log_lik_hat

        def f(t):
            th = theta0 + t * direction
            ll = target.log_lik_est(th, state.u)
            return target.log_prior(th) + ll, ll

        t_new, lp_new, ll_new, done, n_probe = _slice_1d(
            k_slice,
            jnp.asarray(0.0, dtype),
            log_post0,
            f,
            width,
            max_step_out,
            max_shrink,
            dtype,
        )
        new_state = state.replace(
            theta=theta0 + t_new * direction,
            log_lik_hat=jnp.where(done, ll_new, state.log_lik_hat),
            key=key,
        )
        info = {"n_probe": n_probe, "moved": done.astype(jnp.float32)}
        return new_state, info

    return step
