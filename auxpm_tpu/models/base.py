"""Target protocol: log-prior + deterministic likelihood estimator.

Mirrors the reference's L3 layer (SURVEY.md §1: "log-prior +
log-lik-estimator pairs per experiment") but as an explicit, jit-friendly
object.  The auxiliary-variable contract (Murray & Graham 2016 §3):

    u ~ N(0, I) over ``u_shape``;  log_lik_est(theta, u) is a deterministic,
    (where possible) differentiable function whose exponential is an unbiased
    estimate of the marginal likelihood p(y | theta).

The joint target the samplers leave invariant is

    p(theta, u)  ∝  exp(log_prior(theta) + log_lik_est(theta, u)) N(u; 0, I).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax


@dataclasses.dataclass(frozen=True)
class Target:
    """A pseudo-marginal target.

    Attributes:
      d: parameter dimension.
      u_shape: shape of the auxiliary standard-normal block (e.g. ``(S, n)``).
      log_prior: ``theta (d,) -> scalar`` log prior density.
      log_lik_est: ``(theta, u) -> scalar`` deterministic log of the unbiased
        marginal-likelihood estimate.
      theta_init: default initial parameter vector.
      name: identifier used by presets / metrics.
      exact_log_post: optional closed-form unnormalised log posterior
        (Gaussian toy only) for exactness tests.
      posterior_mean / posterior_cov: optional closed-form moments for tests.
      prepare / log_lik_est_u: optional split of the estimator into a
        theta-only precomputation (Gram + Cholesky for GPs) and a cheap
        per-u evaluation, so samplers whose probes hold theta fixed (the
        elliptical-slice u-update) amortise the O(n³) part across probes
        (SURVEY.md §3.1 "θ unchanged ⇒ cacheable").  Contract:
        ``log_lik_est(theta, u) == log_lik_est_u(prepare(theta), u)``.
    """

    d: int
    u_shape: tuple
    log_prior: Callable
    log_lik_est: Callable
    theta_init: jax.Array
    name: str = "target"
    exact_log_post: Optional[Callable] = None
    posterior_mean: Optional[jax.Array] = None
    posterior_cov: Optional[jax.Array] = None
    prepare: Optional[Callable] = None
    log_lik_est_u: Optional[Callable] = None
    # Optional exact prior sampler ``key -> theta`` — required by SMC, whose
    # stage-0 population must be exact prior draws for the normalising
    # constant telescage to estimate Z (tested against the toy's closed form).
    sample_prior: Optional[Callable] = None
    # Optional per-coordinate slice-probe factories exploiting model
    # structure: ``coord_estimators[i](theta, u) -> (f, f2)`` is called by
    # the per-coordinate slice sampler right before updating coordinate i
    # (theta = current full vector), returning probe functions
    # ``f(x) -> (log_post, log_lik)`` and the 2-point batched ``f2``.
    # GP isotropic example: chol(sigma²(R+eps I)) = sigma chol(R+eps I), so
    # the log_sigma coordinate's probes skip the O(n³) factorisation
    # entirely.  None -> the sampler uses the generic estimator for every
    # coordinate.
    coord_estimators: Optional[tuple] = None
    # Optional fused elliptical-slice probe ``(prepared, u, v, angle) ->
    # scalar`` = log_lik_est_u(prepared, u cos a + v sin a) WITHOUT
    # materialising the rotated proposal (Pallas kernel on TPU —
    # ops/fused_estimator.py); used by samplers/ess_u.py when present.
    log_lik_est_rot: Optional[Callable] = None
    # Optional factory ``n_repeats -> sweep`` where ``sweep(prepared, u,
    # scal, v)`` runs the WHOLE elliptical-slice sweep (all repeats, the
    # data-dependent bracket-shrink loop included) in one fused call with
    # the prepared factor resident in VMEM (ops/ess_sweep.py — Pallas on
    # TPU, jnp reference elsewhere).  samplers/ess_u.py prefers this over
    # per-probe ``log_lik_est_rot`` calls when present; the sampled chain
    # law is identical (same estimator expression, same key discipline).
    ess_sweep_factory: Optional[Callable] = None
    # Optional: per-importance-sample log-weights ``(prepared, u) -> (S,)``
    # with ``log_lik_est_u == logsumexp(log_weights_u) - log S``.  Lets the
    # particle-sharding wrapper swap the local reduction for a collective
    # psum-logsumexp (SURVEY.md §2.3 "TP -> particle parallelism").
    log_weights_u: Optional[Callable] = None
    # Width of the estimator's canonical blocked reduction tree
    # (ops/logsumexp.blocked_logsumexp) — ALSO the granularity of the
    # samplers' u-shaped PRNG draws (core/state.blocked_normal): a particle-
    # sharded chain over any shard count dividing this is bitwise-equal to
    # the unsharded chain (SURVEY.md §4.6).  1 = plain reduction/draws.
    n_weight_blocks: int = 1
    # Optional factory ``axis_name -> Target`` returning a particle-sharded
    # build of THIS target for use inside shard_map (local u blocks,
    # collective reductions), preserving all structure-aware fast paths.
    # parallel/particle_shard.shard_target_particles delegates to it.
    make_sharded: Optional[Callable] = None
    # ---- carried-factor cache (r5) --------------------------------------
    # The aux-slice step at round-4 shapes paid chol(R(log_ell)) THREE times
    # per iteration for the same log_ell: once in the ESS prepare, once in
    # the sigma coordinate's factory, and once inside the accepted
    # ell-coordinate probe.  Targets that can carry the expensive
    # theta-dependent factor across kernels expose:
    #   cache_init:   ``theta -> dict``  — build the cache (one factor).
    #   prepare_c:    ``(theta, cache) -> prepared``  — prepare() without
    #                 refactorising, DEFINED to be bitwise-equal to
    #                 prepare(theta) whenever cache == cache_init(theta).
    #   coord_estimators_c: like ``coord_estimators`` but factories take
    #                 ``(theta, u, cache)``; the LAST coordinate's factory
    #                 may read the cache (the GP sigma coordinate probes
    #                 off the carried factor), and the slice sampler
    #                 refreshes the cache ONCE per sweep via cache_init at
    #                 the post-ell theta — outside the shrink loops
    #                 (threading the factor through loop carries was
    #                 measured slower than refactorising once,
    #                 samplers/slice_theta.py note).
    # The cache lives in ``ChainState.extras["target_cache"]``; samplers
    # that change theta must refresh it (core/state.refresh_target_cache)
    # — the cached kernels keep the invariant
    # ``extras["target_cache"] == cache_init(state.theta)`` at every step
    # boundary, so enabling the cache changes no sampled value.
    cache_init: Optional[Callable] = None
    prepare_c: Optional[Callable] = None
    coord_estimators_c: Optional[tuple] = None
    # Optional factory ``n_reps -> fn(theta, u, cache, ll0, lp0, width,
    # rep) -> (sigma', ll', lp', n_shrink, moved)`` running ALL n_reps
    # log_sigma slice updates as one fused call with the carried factor
    # resident (ops/sigma_sweep.py — Pallas on TPU, jnp reference
    # elsewhere); ``rep`` is (n_reps, 2 + MAX_SHRINK) randomness filled by
    # the sampler with the _slice_1d key discipline.  Used by
    # samplers/slice_theta.py's cached path in the shrinkage-only variant.
    sigma_sweep_factory: Optional[Callable] = None

    def log_joint(self, theta, u):
        """Unnormalised joint log density in (theta, u) minus the N(u;0,I)
        factor (which every sampler here preserves by construction)."""
        return self.log_prior(theta) + self.log_lik_est(theta, u)
