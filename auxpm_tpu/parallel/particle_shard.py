"""Particle (importance-sample) sharding — the workload's tensor parallelism.

SURVEY.md §2.3 "TP -> particle/importance-sample parallelism": the S
importance samples of ONE estimate are sharded over the ``particles`` mesh
axis; each device whitens and scores its local S/P block against the
replicated Cholesky factor, and the log-sum-exp reduction becomes a
two-collective online combine (``pmax`` + ``psum``, BASELINE.json:5,11).

``shard_target_particles`` wraps a Target for execution INSIDE ``shard_map``
where ``u`` carries only the local particle block:

- estimator results are bitwise-identical on every shard of a particle
  group (the psum makes them replicated), so accept/shrink decisions driven
  by replicated chain keys stay consistent across the group with no extra
  synchronisation — the correctness invariant of the whole scheme.

- samplers must draw *u-shaped* randomness per-shard (each shard owns a
  different block of u).  They do this by folding the particle-axis index
  into the key when ``particle_axis`` is set (see ess_u / pm_mh); all other
  draws use the replicated chain key unchanged so every shard makes the
  same theta-level decisions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from auxpm_tpu.parallel.collectives import psum_logsumexp


def shard_target_particles(target, axis_name="particles"):
    """Wrap ``target`` so the estimator reduces over a sharded particle axis.

    Requires ``target.log_weights_u`` (all built-in targets provide it).
    Inside ``shard_map``, ``u`` has shape (S_local, ...); the returned
    estimator is the exact global-S estimate.
    """
    if target.make_sharded is not None:
        # The target knows how to rebuild itself sharded (GP classification
        # does): the rebuild keeps ALL structure-aware fast paths —
        # coord_estimators and the fused rotated-probe kernel — because its
        # estimator functions are collective-aware (blocked all_gather
        # combine, bitwise-equal to the unsharded reduction; SURVEY.md §4.6).
        return target.make_sharded(axis_name), target.u_shape[0]

    if target.log_weights_u is None or target.prepare is None:
        raise ValueError(f"target {target.name} does not expose log_weights_u")

    def log_lik_est_u(prepared, u_local):
        log_w = target.log_weights_u(prepared, u_local)  # (S_local,)
        n_shards = jax.lax.psum(1, axis_name)
        s_global = u_local.shape[0] * n_shards
        return psum_logsumexp(log_w, axis_name) - jnp.log(
            jnp.asarray(1.0, u_local.dtype) * s_global
        )

    def log_lik_est(theta, u_local):
        return log_lik_est_u(target.prepare(theta), u_local)

    s_global_static = target.u_shape[0]

    return dataclasses.replace(
        target,
        log_lik_est=log_lik_est,
        log_lik_est_u=log_lik_est_u,
        # structure-aware coordinate probes close over the UNSHARDED
        # estimator; keeping them here would give per-shard inconsistent
        # likelihoods -> divergent loop trip counts inside the particle
        # group -> collective mismatch (observed as a runtime abort).  The
        # generic path below uses the wrapped psum estimator.
        coord_estimators=None,
        # the fused rotated-probe kernel reduces locally (no psum) — the
        # fallback path through the wrapped log_lik_est_u is the sharded one
        log_lik_est_rot=None,
        name=f"{target.name}@{axis_name}",
    ), s_global_static
