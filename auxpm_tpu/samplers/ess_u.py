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

The bracket-shrink cap is 32 (typical usage is 1-10 probes; the cap is a
safety net — on cap-hit the state is kept, an exact no-op).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import ChainState, make_u_normal

_TWO_PI = 2.0 * jnp.pi


def make_ess_u(target, particle_axis=None, n_repeats=1):
    """``particle_axis``: mesh axis name when u is particle-sharded — the
    u-shaped draw ``v`` then covers only this shard's rows.  Draws go
    through ``core.state.make_u_normal``: blocked targets get per-block
    keys so sharded and unsharded chains see identical v rows (bitwise TP
    invariance); every other draw stays replicated across the particle
    group.

    ``n_repeats`` applies the ESS update that many times per call while
    paying ``target.prepare`` (the Gram + Cholesky for GP targets) ONCE:
    theta is fixed throughout, so extra repeats cost only cheap estimator
    probes.  Repeats directly attack the log L̂ autocorrelation that
    throttles theta mixing in the estimator-noise-limited regime.

    When the target provides ``ess_sweep_factory`` (GP fused path,
    unsharded), the WHOLE sweep — every repeat and every bracket-shrink
    probe — runs as ONE fused call with the Cholesky factor resident in
    VMEM (ops/ess_sweep.py): the per-probe dispatch + HBM re-read of C
    that dominated the round-3 profile disappears, and each chain executes
    only its own probe count instead of the vmapped worst lane's.  The
    randomness is precomputed here with the EXACT key discipline of the
    loop path below, so the sampled chain LAW is identical (measured
    1.80x on the ESS step at the bench shape, scripts/ess_sweep_bench.py).

    Trajectory-definition note: like ``whiten_dtype`` and the fused column
    block, which path computes the probes is part of the realized float
    TRAJECTORY — identical decisions and values to ~1 ulp, but not
    guaranteed bitwise across paths (XLA lowers cos/sin per fusion
    context; on TPU the measured one-step difference is exactly 0).  Runs
    that must be bitwise-reproducible across resumes must keep
    AUXPM_ESS_SWEEP fixed; the particle-sharded path never uses the sweep
    (collectives cannot live inside the kernel), so bitwise TP-invariance
    is stated loop-path-vs-loop-path (tests/test_distributed.py)."""

    draw_v = make_u_normal(target, particle_axis)

    # AUXPM_ESS_SWEEP=0 disables the fused whole-sweep path (A/B benching
    # and emergency fallback); read at build time like the other env knobs.
    sweep = None
    if (
        particle_axis is None
        and target.ess_sweep_factory is not None
        and os.environ.get("AUXPM_ESS_SWEEP", "1") != "0"
    ):
        sweep = target.ess_sweep_factory(n_repeats)

    def _prepare(state):
        """prepare() off the carried factor when present (bitwise-equal by
        the cache contract, models/base.py) — the ESS step then pays ZERO
        Cholesky: theta is fixed for every probe and repeat."""
        cache = (
            state.extras.get("target_cache")
            if isinstance(state.extras, dict)
            else None
        )
        if cache is not None and target.prepare_c is not None:
            return target.prepare_c(state.theta, cache)
        return target.prepare(state.theta)

    if sweep is not None:
        from auxpm_tpu.ops.ess_sweep import MAX_SHRINK

        def step(state: ChainState, params: dict):
            prepared = _prepare(state)
            dt = state.u.dtype
            key = state.key
            vs, rows = [], []
            for r in range(n_repeats):
                # IDENTICAL split order to one_update below.
                key, k_v, k_h, k_loop = jax.random.split(key, 4)
                vs.append(draw_v(k_v, state.u))
                log_h = jnp.log(jax.random.uniform(k_h, (), dt))
                a0 = jax.random.uniform(k_loop, (), dt) * _TWO_PI
                shr = jax.vmap(
                    lambda i, k=k_loop: jax.random.uniform(
                        jax.random.fold_in(k, i + 1), (), dt)
                )(jnp.arange(MAX_SHRINK))
                ll0 = (state.log_lik_hat.astype(jnp.float32)
                       if r == 0 else jnp.float32(0.0))
                rows.append(jnp.concatenate([jnp.stack([ll0, log_h, a0]), shr]))
            scal = jnp.stack(rows).astype(jnp.float32)  # (R, 3 + MAX_SHRINK)
            v = jnp.stack(vs)  # (R, S, n)
            u, ll, n_shrink_total, moved_total = sweep(
                prepared, state.u, scal, v)
            new_state = state.replace(u=u, log_lik_hat=ll, key=key)
            info = {
                "n_shrink": n_shrink_total / n_repeats,
                "moved": moved_total / n_repeats,
            }
            return new_state, info

        step.uses_sweep = True
        return step

    def one_update(prepared, est_rot_p, theta, u, log_lik, key):
        """One ESS update of u given the amortised ``prepared``."""
        key, k_v, k_h, k_loop = jax.random.split(key, 4)
        v = draw_v(k_v, u)
        log_y = log_lik + jnp.log(jax.random.uniform(k_h, (), u.dtype))

        # Probes carry only the ANGLE; the rotated proposal u' = u cos a +
        # v sin a is either fused into the estimator kernel
        # (target.log_lik_est_rot — Pallas on TPU, never materialising u')
        # or formed on the fly; the accepted u' is materialised ONCE after
        # the loop.
        est_rot = lambda a: est_rot_p(prepared, theta, u, v, a)  # noqa: E731

        a0 = jax.random.uniform(k_loop, (), u.dtype) * _TWO_PI
        ll0 = est_rot(a0)

        def cond(carry):
            i, a, a_min, a_max, ll_p, done = carry
            return jnp.logical_and(~done, i < 32)

        def body(carry):
            i, a, a_min, a_max, ll_p, done = carry
            # shrink toward 0, redraw angle
            a_min = jnp.where(a < 0, a, a_min)
            a_max = jnp.where(a < 0, a_max, a)
            ku = jax.random.fold_in(k_loop, i + 1)
            a_new = a_min + (a_max - a_min) * jax.random.uniform(ku, (), u.dtype)
            ll_new = est_rot(a_new)
            return (i + 1, a_new, a_min, a_max, ll_new, ll_new > log_y)

        init = (jnp.int32(0), a0, a0 - _TWO_PI, a0, ll0, ll0 > log_y)
        n_shrink, a, _, _, ll_p, done = jax.lax.while_loop(cond, body, init)

        u_p = u * jnp.cos(a) + v * jnp.sin(a)  # accepted u', once
        # Cap-hit safety: keep the current state (exact — a no-op move).
        return (
            jnp.where(done, u_p, u),
            jnp.where(done, ll_p, log_lik),
            key,
            n_shrink,
            done,
        )

    def step(state: ChainState, params: dict):
        # theta is fixed for every probe and repeat: amortise the expensive
        # part of the estimator across the whole call.
        if target.prepare is not None:
            prepared = _prepare(state)
            if target.log_lik_est_rot is not None:
                est_rot_p = lambda p, th, u, v, a: target.log_lik_est_rot(  # noqa: E731
                    p, u, v, a
                )
            else:
                est_rot_p = lambda p, th, u, v, a: target.log_lik_est_u(  # noqa: E731
                    p, u * jnp.cos(a) + v * jnp.sin(a)
                )
        else:
            prepared = None
            est_rot_p = lambda p, th, u, v, a: target.log_lik_est(  # noqa: E731
                th, u * jnp.cos(a) + v * jnp.sin(a)
            )

        u, log_lik, key = state.u, state.log_lik_hat, state.key
        n_shrink_total = jnp.float32(0.0)
        moved_total = jnp.float32(0.0)
        for _ in range(n_repeats):
            u, log_lik, key, n_shrink, done = one_update(
                prepared, est_rot_p, state.theta, u, log_lik, key
            )
            n_shrink_total = n_shrink_total + n_shrink.astype(jnp.float32)
            moved_total = moved_total + done.astype(jnp.float32)

        new_state = state.replace(u=u, log_lik_hat=log_lik, key=key)
        info = {
            "n_shrink": n_shrink_total / n_repeats,
            "moved": moved_total / n_repeats,
        }
        return new_state, info

    step.uses_sweep = False
    return step
