"""Joint (theta, u) updates — moving parameters and auxiliaries TOGETHER.

SURVEY.md §2.1 row 9 names "the paper's joint theta,u updates" (Murray &
Graham 2016 §4) alongside the alternating compositions.  The reference mount
is empty (SURVEY.md §0), so the exact reference formulation cannot be cited
line-by-line; the two kernels here are the canonical joint moves for the
auxiliary pseudo-marginal construction, each with a self-contained
invariance argument:

Joint slice (``make_joint_slice``).  Augment the state with v ~ N(0, I) and
consider the one-parameter flow

    T_t(theta, u, v) = (theta + t e,
                        u cos(c t) + v sin(c t),
                        v cos(c t) - u sin(c t)),

with e a random unit direction in theta-space and c = angle_scale / width
the rotation rate.  T_t is a group (T_t T_s = T_{t+s}), volume-preserving,
and leaves N(u) N(v) invariant for every t (rotation invariance) — so along
the orbit the augmented target pi(theta,u) N(v) varies only through

    h(t) = p(theta + t e) * L-hat(theta + t e, u cos(ct) + v sin(ct)),

and Neal (2003) slice sampling on t (step-out + shrinkage toward t=0,
reusing slice_theta._slice_1d) is a valid update of the joint chain.
c -> 0 recovers random-direction slice on theta | u; the coupling lets u
adapt WHILE theta moves, attacking the theta–log L-hat autocorrelation that
alternating updates leave behind (small accepted |t| => small rotation, so
the estimator re-draw is automatically tempered to the step size).

Joint MH (``make_joint_mh``).  Random-walk proposal on theta paired with a
preconditioned-Crank–Nicolson proposal on u:

    theta' = theta + s xi,   u' = u cos(rho) + v sin(rho),  v ~ N(0, I).

The pCN rotation is reversible w.r.t. N(u) (its proposal ratio cancels the
prior ratio exactly), so the MH acceptance is simply

    min(1, p(theta') L-hat(theta', u') / (p(theta) L-hat(theta, u))).

rho = pi/2 gives an independent fresh u' — exactly classic PM-MH — while
small rho keeps the estimator noise correlated between numerator and
denominator (the correlated pseudo-marginal idea), removing the sticking
pathology at the cost of slower u refresh.

Params (group names "joint_slice" / "joint_mh"):
  width: slice bracket width along the theta direction (scalar).
  angle_scale: u-rotation (radians) per ``width`` of theta motion
    (default pi/2).
  max_step_out / max_shrink: loop caps, as in slice_theta.
  step_size: joint-MH random-walk scale.
  rho: joint-MH u-rotation angle (default 0.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import ChainState, make_u_normal
from auxpm_tpu.samplers.slice_theta import _slice_1d


def make_joint_slice(target, particle_axis=None):
    draw_v = make_u_normal(target, particle_axis)

    def step(state: ChainState, params: dict):
        dtype = state.theta.dtype
        width = jnp.asarray(params.get("width", 1.0), dtype)
        angle_scale = jnp.asarray(params.get("angle_scale", jnp.pi / 2), dtype)
        max_step_out = params.get("max_step_out", 8)
        max_shrink = params.get("max_shrink", 32)

        key, k_dir, k_v, k_slice = jax.random.split(state.key, 4)
        e = jax.random.normal(k_dir, state.theta.shape, dtype)
        e = e / jnp.linalg.norm(e)
        v = draw_v(k_v, state.u)

        theta0, u0 = state.theta, state.u
        log_post0 = target.log_prior(theta0) + state.log_lik_hat
        rate = angle_scale / width

        def path(t):
            a = rate * t
            return theta0 + t * e, u0 * jnp.cos(a) + v * jnp.sin(a)

        def f(t):
            th, ut = path(t)
            ll = target.log_lik_est(th, ut)
            return target.log_prior(th) + ll, ll

        def f2(ts):
            return jax.vmap(f)(ts)

        t_new, _lp, ll_new, done, n_probe = _slice_1d(
            k_slice,
            jnp.asarray(0.0, dtype),
            log_post0,
            f,
            f2,
            width,
            max_step_out,
            max_shrink,
            dtype,
        )
        th_new, u_new = path(t_new)
        from auxpm_tpu.core.state import refresh_target_cache

        theta_out = jnp.where(done, th_new, theta0)
        new_state = state.replace(
            theta=theta_out,
            u=jnp.where(done, u_new, u0),
            log_lik_hat=jnp.where(done, ll_new, state.log_lik_hat),
            key=key,
            extras=refresh_target_cache(target, state.extras, theta_out),
        )
        info = {"n_probe": n_probe, "moved": done.astype(jnp.float32)}
        return new_state, info

    return step


def make_joint_mh(target, particle_axis=None):
    draw_v = make_u_normal(target, particle_axis)

    def step(state: ChainState, params: dict):
        dtype = state.theta.dtype
        s = jnp.asarray(params.get("step_size", 0.3), dtype)
        rho = jnp.asarray(params.get("rho", 0.3), dtype)

        key, k_xi, k_v, k_acc = jax.random.split(state.key, 4)
        theta_p = state.theta + s * jax.random.normal(
            k_xi, state.theta.shape, dtype
        )
        v = draw_v(k_v, state.u)
        u_p = state.u * jnp.cos(rho) + v * jnp.sin(rho)

        ll_p = target.log_lik_est(theta_p, u_p)
        log_a = (
            target.log_prior(theta_p)
            + ll_p
            - target.log_prior(state.theta)
            - state.log_lik_hat
        )
        accept = jnp.log(jax.random.uniform(k_acc, (), dtype)) < log_a

        from auxpm_tpu.core.state import refresh_target_cache

        theta_out = jnp.where(accept, theta_p, state.theta)
        new_state = state.replace(
            theta=theta_out,
            u=jnp.where(accept, u_p, state.u),
            log_lik_hat=jnp.where(accept, ll_p, state.log_lik_hat),
            key=key,
            extras=refresh_target_cache(target, state.extras, theta_out),
        )
        info = {"accept": accept.astype(jnp.float32)}
        return new_state, info

    return step
