"""Linear slice sampling of theta | u (Neal 2003) with stepping-out + shrink.

The reference's "slice-sampling bracket/shrink loops" (BASELINE.json:5,
SURVEY.md §3.3) on the conditional

    f(theta') = log p(theta') + log L̂(theta', u)     (u held fixed),

which is a *deterministic* function of theta' because u is part of the chain
state — the key property that turns the pseudo-marginal problem into a
plain slice-sampling problem (Murray & Graham 2016 §4).  Two variants:

- ``make_slice_theta``: per-coordinate updates via a ``fori_loop`` over
  coordinates (dynamic coordinate index -> the estimator graph is traced
  ONCE, not d times — compile time through the tunneled TPU backend scales
  with the number of estimator instantiations), each coordinate with its
  own width ``w_i``.
- ``make_slice_theta_rd``: one update along a random unit direction.

Algorithm per 1-D update (Neal 2003 §4 "stepping out" + §5 "shrinkage"):

    log_y = f(theta) + log U
    l = x0 - w U1; r = l + w
    while f(l) > log_y and steps < m: l -= w      (step out left)
    while f(r) > log_y and steps < m: r += w      (step out right)
    repeat: x ~ U(l, r)
            if f(x) > log_y: accept
            elif x < x0: l = x else r = x         (shrink)

TPU design notes:
- both step-out ends are probed in ONE batched estimator call per
  iteration (vmap over the 2 endpoints): half the sequential depth, and
  one estimator instantiation for the whole step-out loop;
- every loop is a bounded ``lax.while_loop``; under ``vmap`` all chains
  advance the same compiled loop with automatic per-lane termination;
- shrinkage terminates a.s.; on cap-hit the coordinate keeps its current
  value (exact no-op), matching the NumPy oracle bit-for-bit.

Params:
  widths: scalar or (d,) initial bracket width w.
  max_step_out: cap m on step-out expansions each side (default 8).
  max_shrink: cap on shrink iterations (default 32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import ChainState


def _slice_1d(key, x0, log_fx0, f, f2, w, max_step_out, max_shrink, dtype):
    """One 1-D slice update along scalar coordinate value ``x0``.

    ``f(x) -> (log_post, log_lik)``; ``f2(xs) -> (log_posts, log_liks)`` is
    the 2-point batched version (step-out probes); log_fx0 = f(x0)[0].
    Returns (x_new, log_post_new, log_lik_new, done, n_probe).

    NOTE (r5 negative result): a variant that threaded the accepted
    ell-probe's Cholesky factor through the shrink carry was built and
    MEASURED SLOWER than recomputing the factor once after the sweep
    (95.7 vs 84.9 ms/step at the bench shape): XLA copies the (n, n)
    loop-carry every iteration of every subsequent while_loop it passes
    through (~2 x 1.6 MB x chains x iterations of pure HBM traffic), which
    exceeds the one n^3/3 factorisation it saves.  The carried-factor cache
    therefore refreshes OUTSIDE the loops (make_slice_theta cached branch).
    """
    k_h, k_init, k_loop = jax.random.split(key, 3)
    log_y = log_fx0 + jnp.log(jax.random.uniform(k_h, (), dtype))

    u1 = jax.random.uniform(k_init, (), dtype)
    l0 = x0 - w * u1
    r0 = l0 + w

    # --- step out: probe both ends in one batched estimator call ---
    # max_step_out == 0 gives Neal 2003 §4.1's shrinkage-only variant — the
    # randomly positioned width-w interval is used directly, which is still
    # an exact slice sampler (interval placement is symmetric in (x0, x'))
    # and saves up to 2*max_step_out full-estimator probes per coordinate
    # on the worst vmap lane; pair with a generous adapted width
    # (adaptation.py width_scale).  When the 0 arrives as a STATIC Python
    # int, skip tracing the loop entirely: a traced-0 cap still compiles
    # the body — for the GP ell coordinate that is a 2-point-batched full
    # Gram+Cholesky+estimator subgraph sitting dead in the program, pure
    # compile-time cost (part of the r5 cold-start fix).
    if isinstance(max_step_out, int) and max_step_out == 0:
        l, r, n_so = l0, r0, jnp.int32(0)
    else:
        def so_cond(carry):
            l, r, i, expand_l, expand_r = carry
            return jnp.logical_and(
                i < max_step_out, jnp.logical_or(expand_l, expand_r)
            )

        def so_body(carry):
            l, r, i, expand_l, expand_r = carry
            lps, _ = f2(jnp.stack([l, r]))
            expand_l = jnp.logical_and(expand_l, lps[0] > log_y)
            expand_r = jnp.logical_and(expand_r, lps[1] > log_y)
            l = jnp.where(expand_l, l - w, l)
            r = jnp.where(expand_r, r + w, r)
            return l, r, i + 1, expand_l, expand_r

        l, r, n_so, _, _ = jax.lax.while_loop(
            so_cond, so_body,
            (l0, r0, jnp.int32(0), jnp.bool_(True), jnp.bool_(True)),
        )

    # --- shrinkage ---
    def sh_cond(carry):
        i, l, r, x, lp, ll, done = carry
        return jnp.logical_and(~done, i < max_shrink)

    def sh_body(carry):
        i, l, r, x, lp, ll, done = carry
        kx = jax.random.fold_in(k_loop, i)
        x_new = l + (r - l) * jax.random.uniform(kx, (), dtype)
        lp_new, ll_new = f(x_new)
        ok = lp_new > log_y
        l = jnp.where(jnp.logical_or(ok, x_new >= x0), l, x_new)
        r = jnp.where(jnp.logical_or(ok, x_new < x0), r, x_new)
        return i + 1, l, r, x_new, lp_new, ll_new, ok

    init = (jnp.int32(0), l, r, x0, log_fx0, jnp.asarray(0.0, dtype),
            jnp.bool_(False))
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


def make_slice_theta(target, n_sigma_extra=0):
    """Per-coordinate slice sampling of theta | u (coordinates scanned).

    ``n_sigma_extra`` (STATIC — it unrolls a Python loop; structure-aware
    targets only, default 0):
    repeat the LAST coordinate's update that many extra times per sweep.
    For the GP target the last coordinate is log_sigma, whose probe factory
    is Cholesky-free (gp_classification._sigma_coord_factory: one chol_r
    per sweep, each probe pays only the O(S n²) whiten) — extra repeats
    reuse the SAME factory, so k extra log_sigma updates cost k·(probes)
    estimator calls and ZERO extra Choleskys.  Repeating a valid slice
    update is itself a valid kernel, so exactness is untouched; the NumPy
    oracle parity holds at the default 0.
    """
    if n_sigma_extra and target.coord_estimators is None:
        # the generic fori_loop path below has no per-coordinate factories,
        # so the knob would be a silent no-op (advisor finding r3) — e.g.
        # `--proposal laplace --n-sigma-extra 4`.
        import warnings

        warnings.warn(
            "n_sigma_extra > 0 requires a target with coord_estimators "
            "(structure-aware per-coordinate probes); ignoring it for "
            f"target {getattr(target, 'name', target)!r}"
        )

    # Fused whole-sigma-slice sweep (ops/sigma_sweep.py): all
    # 1 + n_sigma_extra log_sigma updates in one dispatch with the carried
    # factor resident and per-chain probe counts.  Taken only on the cached
    # path with the shrinkage-only variant (static max_step_out == 0);
    # AUXPM_SIGMA_SWEEP=0 disables (A/B + emergency fallback, mirroring
    # AUXPM_ESS_SWEEP).
    import os

    sigma_sweep_fn = None
    if (
        target.sigma_sweep_factory is not None
        and os.environ.get("AUXPM_SIGMA_SWEEP", "1") != "0"
    ):
        sigma_sweep_fn = target.sigma_sweep_factory(1 + n_sigma_extra)

    def step(state: ChainState, params: dict):
        widths = jnp.broadcast_to(
            jnp.asarray(params.get("widths", 1.0), state.theta.dtype),
            state.theta.shape,
        )
        max_step_out = params.get("max_step_out", 8)
        max_shrink = params.get("max_shrink", 32)
        # separate (smaller) shrink cap for the coordinates whose probes pay
        # a full factorisation (the GP ell coordinates): under vmap every
        # chain pays the WORST lane's shrink count, so the expected loop
        # depth is E[max over chains] (~7 at 128 chains) while the mean
        # useful count is ~2 — a small cap bounds the worst lane at an
        # exact no-op cost for the rare capped chain (Neal 2003 cap
        # semantics; keep current point).  Default = max_shrink (off).
        max_shrink_chol = params.get("max_shrink_chol", max_shrink)
        dtype = state.theta.dtype

        key, *coord_keys = jax.random.split(state.key, target.d + 1)
        coord_keys_arr = jnp.stack(coord_keys)

        theta0 = state.theta
        log_lik0 = state.log_lik_hat
        log_post0 = target.log_prior(theta0) + log_lik0

        cache = (
            state.extras.get("target_cache")
            if isinstance(state.extras, dict)
            else None
        )
        new_extras = state.extras

        if target.coord_estimators_c is not None and cache is not None:
            # carried-factor path (models/base.py cache contract): after the
            # ell coordinate(s), the factor is refreshed ONCE at the updated
            # theta — outside every while_loop, see the _slice_1d negative-
            # result note — and then feeds the sigma probes (this step) and
            # the ESS prepare (next step).  Per step that is p_chol + 1
            # factorisations instead of the uncached p_chol + 2, with a
            # bitwise-identical trajectory (chol_r is deterministic and the
            # use-site expressions are unchanged; tests/test_cache.py).
            theta, log_post, log_lik = theta0, log_post0, log_lik0
            n_probe_total = jnp.float32(0.0)
            n_probe_chol = jnp.float32(0.0)
            n_coords = len(target.coord_estimators_c)
            for i, factory in enumerate(target.coord_estimators_c):
                last = i == n_coords - 1
                reps = 1 + (n_sigma_extra if last else 0)
                if last:
                    # the ell coordinate(s) are final: refresh the carried
                    # factor at the post-ell theta (the ONE factorisation
                    # of this path; the old sigma factory paid the same)
                    cache = target.cache_init(theta)
                if (
                    last
                    and sigma_sweep_fn is not None
                    and isinstance(max_step_out, int)
                    and max_step_out == 0
                ):
                    # whole-sigma-slice fused sweep: identical randomness
                    # rows to the _slice_1d_aux discipline below (per rep:
                    # split -> [log U(k_h), U(k_init), U(fold_in(k_loop,
                    # j))_j]), so the sampled law is unchanged; the
                    # realized trajectory may differ at ~1 ulp
                    # (ops/sigma_sweep.py docstring).
                    from auxpm_tpu.ops.sigma_sweep import (
                        MAX_SHRINK as _SIG_MAX_SHRINK,
                    )

                    rows = []
                    for rep in range(reps):
                        k_rep = (
                            coord_keys[i]
                            if rep == 0
                            else jax.random.fold_in(coord_keys[i], rep)
                        )
                        k_h, k_init, k_loop = jax.random.split(k_rep, 3)
                        log_u = jnp.log(
                            jax.random.uniform(k_h, (), dtype)
                        )
                        u1 = jax.random.uniform(k_init, (), dtype)
                        shr = jax.vmap(
                            lambda j, k=k_loop: jax.random.uniform(
                                jax.random.fold_in(k, j), (), dtype
                            )
                        )(jnp.arange(_SIG_MAX_SHRINK))
                        rows.append(
                            jnp.concatenate([jnp.stack([log_u, u1]), shr])
                        )
                    rep_arr = jnp.stack(rows)
                    sig_new, ll_new, lp_new, n_sh, _moved = sigma_sweep_fn(
                        theta, state.u, cache, log_lik, log_post,
                        widths[i], rep_arr,
                    )
                    theta = theta.at[i].set(sig_new)
                    log_post = lp_new
                    log_lik = ll_new
                    n_probe_total = n_probe_total + n_sh
                    continue
                f, f2 = factory(theta, state.u, cache)
                for rep in range(reps):
                    k_rep = (
                        coord_keys[i]
                        if rep == 0
                        else jax.random.fold_in(coord_keys[i], rep)
                    )
                    x_new, lp_new, ll_new, done, n_probe = _slice_1d(
                        k_rep,
                        theta[i],
                        log_post,
                        f,
                        f2,
                        widths[i],
                        max_step_out,
                        max_shrink if last else max_shrink_chol,
                        dtype,
                    )
                    theta = theta.at[i].set(x_new)
                    log_post = lp_new
                    log_lik = jnp.where(done, ll_new, log_lik)
                    n_probe_total = n_probe_total + n_probe
                    if not last:
                        n_probe_chol = n_probe_chol + n_probe
            new_extras = {**state.extras, "target_cache": cache}
        elif target.coord_estimators is not None:
            # structure-aware path: per-coordinate probe factories (e.g. the
            # GP's Cholesky-free log_sigma coordinate) — unrolled over the
            # (small) coordinate count.
            theta, log_post, log_lik = theta0, log_post0, log_lik0
            n_probe_total = jnp.float32(0.0)
            n_probe_chol = jnp.float32(0.0)  # probes that paid a Cholesky
            n_coords = len(target.coord_estimators)
            for i, factory in enumerate(target.coord_estimators):
                last = i == n_coords - 1
                reps = 1 + (n_sigma_extra if last else 0)
                # the factory closes over the OTHER coordinates only, so it
                # stays valid across repeats of its own coordinate
                f, f2 = factory(theta, state.u)
                for rep in range(reps):
                    # rep 0 consumes coord_keys[i] exactly as before so the
                    # default path stays bitwise-identical (oracle parity);
                    # extra reps fold in their index
                    k_rep = (
                        coord_keys[i]
                        if rep == 0
                        else jax.random.fold_in(coord_keys[i], rep)
                    )
                    x_new, lp_new, ll_new, done, n_probe = _slice_1d(
                        k_rep,
                        theta[i],
                        log_post,
                        f,
                        f2,
                        widths[i],
                        max_step_out,
                        max_shrink if last else max_shrink_chol,
                        dtype,
                    )
                    theta = theta.at[i].set(x_new)
                    log_post = lp_new
                    log_lik = jnp.where(done, ll_new, log_lik)
                    n_probe_total = n_probe_total + n_probe
                    if not last:
                        n_probe_chol = n_probe_chol + n_probe
        else:

            def coord_body(i, carry):
                theta, log_post, log_lik, n_probe_total = carry

                def f(x):
                    th = theta.at[i].set(x)
                    ll = target.log_lik_est(th, state.u)
                    return target.log_prior(th) + ll, ll

                def f2(xs):  # (2,) batched probe
                    def g(x):
                        th = theta.at[i].set(x)
                        ll = target.log_lik_est(th, state.u)
                        return target.log_prior(th) + ll, ll

                    return jax.vmap(g)(xs)

                x_new, lp_new, ll_new, done, n_probe = _slice_1d(
                    coord_keys_arr[i],
                    theta[i],
                    log_post,
                    f,
                    f2,
                    widths[i],
                    max_step_out,
                    max_shrink,
                    dtype,
                )
                theta = theta.at[i].set(x_new)
                log_lik = jnp.where(done, ll_new, log_lik)
                return theta, lp_new, log_lik, n_probe_total + n_probe

            theta, log_post, log_lik, n_probe_total = jax.lax.fori_loop(
                0,
                target.d,
                coord_body,
                (theta0, log_post0, log_lik0, jnp.float32(0.0)),
            )
            # generic path: every probe pays the full estimator (incl. its
            # Cholesky for targets that have one)
            n_probe_chol = n_probe_total

        if cache is not None and new_extras is state.extras:
            # a non-cache-aware branch ran while a cache was carried (e.g.
            # a cached target routed through the generic fori_loop path):
            # refresh so the invariant cache == cache_init(theta) holds
            from auxpm_tpu.core.state import refresh_target_cache

            new_extras = refresh_target_cache(target, state.extras, theta)
        new_state = state.replace(
            theta=theta, log_lik_hat=log_lik, key=key, extras=new_extras
        )
        info = {"n_probe": n_probe_total, "n_probe_chol": n_probe_chol}
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

        def f2(ts):
            return jax.vmap(f)(ts)

        t_new, lp_new, ll_new, done, n_probe = _slice_1d(
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
        from auxpm_tpu.core.state import refresh_target_cache

        theta_new = theta0 + t_new * direction
        new_state = state.replace(
            theta=theta_new,
            log_lik_hat=jnp.where(done, ll_new, state.log_lik_hat),
            key=key,
            extras=refresh_target_cache(target, state.extras, theta_new),
        )
        info = {"n_probe": n_probe, "moved": done.astype(jnp.float32)}
        return new_state, info

    return step
