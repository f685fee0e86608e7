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

Two particle layouts, selected by ``carry_u``:

``carry_u=True`` (default, exact up to ~10^5 GP particles): the u block
travels with its particle through resampling — the joint-space view moves
(theta, u, ll) together; the payload all_gather is O(N * (S n + d)).

``carry_u=False`` (the 1M-particle mode): u is never materialised across
stages.  Each particle stores the PRNG key that GENERATED its u — the
invariant ``u == normal(u_key, u_shape)`` makes transporting the 2-word key
equivalent to transporting the whole (S, n) block, so resampling moves only
``(theta, log_lik, u_key, key)`` = O(N (d+5)) words (~36 MB/device at 1M
GP particles vs ~160 TB for materialised u).  The invariant is preserved by
restricting the moves that touch u to an *independence* MH refresh
``u' ~ N(0, I)`` accepted w.p. ``min(1, exp(beta (ll' - ll)))`` — exactly
pi_beta(u | theta)-invariant, and on acceptance the new u is a fresh draw
whose key we store; on rejection the old key stands.  theta-rejuvenation
then uses a theta-only kernel (``composite.THETA_ONLY``: slice/MH/NUTS/HMC
on theta | u) with u re-materialised locally in fixed-size particle chunks
(``rejuv_batch``) so peak memory is O(chunk * S * n), never O(N S n).
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


def _default_rejuvenation_params(target):
    """Population-adaptive kernel hyperparameters: the particle cloud is a
    free posterior-moment estimate, so HMC/NUTS get a diagonal mass matrix
    ``inv_mass = population var`` (the SMC analogue of the chain-warmup mass
    adaptation in samplers/adaptation.py) — the conditioned target then has
    ~unit scale and a fixed O(1) step size works across stages."""

    def rejuvenation_params(std):
        var = std * std
        return {
            "slice_theta": {"widths": 2.0 * std},
            "mh_theta": {"step_size": 2.38 * jnp.mean(std) / np.sqrt(target.d)},
            "nuts": {"step_size": 0.5, "inv_mass": var},
            "hmc": {"step_size": 0.5, "inv_mass": var},
        }

    return rejuvenation_params


def _chunk_size(n_local, rejuv_batch):
    """Largest divisor of n_local that is <= rejuv_batch (static)."""
    chunk = max(1, min(int(rejuv_batch), n_local))
    while n_local % chunk:
        chunk -= 1
    return chunk


def _chunked_map(fn, args, n_local, chunk):
    """scan-of-vmap over fixed-size particle chunks: bounds peak memory at
    O(chunk) particle working set instead of O(n_local)."""
    n_chunks = n_local // chunk

    def resh(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    def body(_, chunk_args):
        return None, jax.vmap(fn)(*chunk_args)

    _, outs = jax.lax.scan(body, None, tuple(resh(a) for a in args))
    return jax.tree.map(lambda x: x.reshape((n_local,) + x.shape[2:]), outs)


def make_smc_sharded(
    target,
    make_rejuvenation,
    n_particles,
    mesh,
    n_mcmc=2,
    ess_frac=0.5,
    max_stages=100,
    rejuvenation_params=None,
    carry_u=True,
    n_u_mh=2,
    rejuv_batch=256,
    time_stages=False,
    rejuv_dispatches=1,
    checkpoint_dir=None,
    checkpoint_every=1,
    u_blocks=1,
):
    """Sharded analogue of ``smc.make_smc``; same semantics, same PRNG
    discipline per particle, population sharded over the mesh.

    Args:
      carry_u: True — particles materialise and transport their u block
        (exact joint-space SMC; payload O(N S n)).  False — the 1M-particle
        mode: u is stored as its generating PRNG key, refreshed by ``n_u_mh``
        independence-MH proposals per stage, and ``make_rejuvenation`` MUST
        build a theta-only kernel (``composite.THETA_ONLY``; a u-updating
        kernel like aux_slice would silently break the key↔u invariant).
      n_u_mh: independence-MH u-refresh proposals per stage (carry_u=False).
      rejuv_batch: particle chunk size for re-materialising u during
        rejuvenation (carry_u=False); peak memory O(rejuv_batch * S * n).
      rejuv_dispatches: carry_u=False only — split each stage's
        rejuvenation into this many separate device dispatches over
        contiguous local particle groups (dispatch-wall-time bound; results
        bitwise-equal to 1).  1 = whole stage in one dispatch (default).
      u_blocks: carry_u=False only — store one generating key per
        contiguous u ROW-BLOCK (S/u_blocks importance samples each) and
        refresh blocks independently: a systematic-scan independence-MH
        within Gibbs over blocks, each update targeting
        pi_beta(u_b | theta, u_-b) exactly.  Replacing 1/u_blocks of the
        samples perturbs log L̂ far less than a full redraw, so the IMH
        log-accept beta*(ll' - ll) stays O(1) where the whole-u refresh
        (u_blocks=1, the default — bitwise-unchanged legacy path) freezes
        at large n (VERDICT r3 weak #2: measured 0.55 accept at n=32 ->
        0.11 at n=128 at beta=1).  Per-proposal cost is one BLOCK's
        whiten+loglik (cached per-sample log-weights are stitched and
        re-reduced through the target's canonical blocked tree), so a full
        sweep over all blocks costs ~one full-u refresh.  Requires
        ``target.log_weights_u`` and S % u_blocks == 0.
      checkpoint_dir: per-STAGE checkpoint/resume (SURVEY.md §5 failure
        recovery applied to the SMC path — a pod-scale config-5 run is
        hours, VERDICT r3 weak #7).  After every ``checkpoint_every``-th
        completed stage the sharded population plus the loop carries
        (beta, log Z, stage index) are saved via utils/checkpoint; a
        subsequent ``run`` with the SAME key and config resumes from the
        last stage and — because each stage's randomness is
        ``fold_in(k_loop, s)`` — reproduces the uninterrupted run
        BIT-FOR-BIT (tested: tests/test_smc.py).
    """
    n_shards = mesh.shape[_AXIS] * mesh.shape.get("particles", 1)
    if mesh.shape.get("particles", 1) != 1:
        raise ValueError("smc_sharded uses a flat mesh: particles axis must be 1")
    if n_particles % n_shards:
        raise ValueError(f"{n_particles} particles not divisible by {n_shards}")
    n_local = n_particles // n_shards

    if rejuvenation_params is None:
        rejuvenation_params = _default_rejuvenation_params(target)

    spec = ChainState(theta=P(_AXIS), u=P(_AXIS), log_lik_hat=P(_AXIS), key=P(_AXIS))

    def _resample_and_params(states, beta, u01, k_rej):
        """Shared head of both stage variants: adaptive beta, logZ increment,
        distributed systematic resample, fresh keys, population-std params."""
        ll = states.log_lik_hat
        beta_new = _next_beta_global(ll, beta, ess_frac, n_particles, _AXIS)
        delta = beta_new - beta
        log_w = delta * ll
        log_z_inc = psum_logsumexp(log_w, _AXIS) - jnp.log(
            jnp.asarray(float(n_particles), ll.dtype)
        )

        idx = distributed_systematic_resample_indices(log_w, u01, _AXIS)
        states = gather_resampled(states, idx, _AXIS)

        # fresh per-particle keys (decorrelate copies), keyed by GLOBAL slot
        # index so the stage is mesh-shape independent
        shard = jax.lax.axis_index(_AXIS)
        g = shard * n_local + jnp.arange(n_local)
        states = states.replace(key=jax.vmap(jax.random.fold_in, (None, 0))(k_rej, g))

        # global population std for kernel scaling
        mean = jax.lax.pmean(jnp.mean(states.theta, axis=0), _AXIS)
        var = jax.lax.pmean(jnp.mean((states.theta - mean) ** 2, axis=0), _AXIS)
        std = jnp.sqrt(var) + 1e-6
        params = rejuvenation_params(std)
        return states, beta_new, log_z_inc, params, std

    def _rejuv_params(std, transition):
        params = rejuvenation_params(std)
        if hasattr(transition, "stage_names"):
            params = {k: v for k, v in params.items() if k in transition.stage_names}
        return params

    # ------------------------------------------------------------------
    # carry_u=True: materialised u travels with its particle
    # ------------------------------------------------------------------
    def _stage_local(states, beta, u01, k_rej):
        states, beta_new, log_z_inc, params, _std = _resample_and_params(
            states, beta, u01, k_rej
        )

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
        return states, beta_new, log_z_inc, jnp.zeros((), states.theta.dtype)

    # ------------------------------------------------------------------
    # carry_u=False: u implicit in its generating key (the 1M-particle mode)
    # ------------------------------------------------------------------
    u_dtype = jnp.result_type(float)

    if u_blocks > 1:
        if carry_u:
            raise ValueError("u_blocks > 1 requires carry_u=False")
        if target.log_weights_u is None:
            raise ValueError(
                "u_blocks > 1 needs target.log_weights_u (per-sample "
                "log-weights) for the blocked refresh"
            )
        if target.u_shape[0] % u_blocks:
            raise ValueError(
                f"S={target.u_shape[0]} not divisible by u_blocks={u_blocks}"
            )
    _bs = target.u_shape[0] // u_blocks
    _block_shape = (_bs,) + tuple(target.u_shape[1:])

    def _materialize_u(u_key_data):
        """u from its generating key(s).  u_blocks == 1: one key, one draw
        (legacy layout, key data shape (2,)).  u_blocks > 1: key data is
        (u_blocks, 2); row-block b = normal(key_b, (S/u_blocks, ...))."""
        if u_blocks == 1:
            return jax.random.normal(
                jax.random.wrap_key_data(u_key_data), target.u_shape, u_dtype
            )
        blocks = jax.vmap(
            lambda kd: jax.random.normal(
                jax.random.wrap_key_data(kd), _block_shape, u_dtype
            )
        )(u_key_data)
        return blocks.reshape(target.u_shape)

    def _ll_of(theta, u):
        return target.log_lik_est(theta, u)

    def _make_one(beta_new, params, transition):
        """Per-particle rejuvenation body (u-refresh IMH + theta-only
        kernel); shared between the single-dispatch stage and the
        split-dispatch path."""

        def one(theta, ll, u_key_data, key):
            k_imh, k_theta = jax.random.split(key)

            # --- u-refresh: independence MH, pi_beta(u | theta)-invariant.
            # Amortise the theta-only precomputation (GP: Gram + Cholesky)
            # across the n_u_mh proposals.
            if target.prepare is not None and target.log_lik_est_u is not None:
                prepared = target.prepare(theta)
                est = lambda u: target.log_lik_est_u(prepared, u)  # noqa: E731
            else:
                est = lambda u: _ll_of(theta, u)  # noqa: E731

            if u_blocks > 1:
                # Blocked refresh: systematic-scan IMH-within-Gibbs over
                # the u row-blocks.  Each update targets
                # pi_beta(u_b | theta, u_-b) ∝ N(u_b) L̂(theta, u)^beta
                # exactly (fresh-prior proposal, accept beta*(ll'-ll)), so
                # the composition leaves pi_beta invariant.  Per-sample
                # log-weights are cached; a proposal recomputes ONE block's
                # weights and re-reduces the stitched (S,) column through
                # the target's canonical tree — the same estimator value
                # definition as log_lik_est_u.
                from auxpm_tpu.ops.logsumexp import blocked_logsumexp

                if target.prepare is not None:
                    lw_arg = prepared
                else:
                    lw_arg = theta
                log_s = jnp.log(jnp.asarray(float(target.u_shape[0]), u_dtype))

                def lw_block(kd):
                    u_b = jax.random.normal(
                        jax.random.wrap_key_data(kd), _block_shape, u_dtype
                    )
                    return target.log_weights_u(lw_arg, u_b)  # (S/u_blocks,)

                def reduce_lw(lw):
                    return (
                        blocked_logsumexp(
                            lw.reshape(-1), target.n_weight_blocks
                        )
                        - log_s
                    )

                lw0 = jax.vmap(lw_block)(u_key_data)  # (u_blocks, bs)
                ll = reduce_lw(lw0)

                def imh_body(carry, idx):
                    u_kd, lw, ll_cur = carry
                    b = idx % u_blocks
                    kj = jax.random.fold_in(k_imh, idx)
                    k_prop, k_acc = jax.random.split(kj)
                    kd_prop = jax.random.key_data(k_prop)
                    lw_new = jax.lax.dynamic_update_index_in_dim(
                        lw, lw_block(kd_prop), b, 0
                    )
                    ll_new = reduce_lw(lw_new)
                    log_a = beta_new * (ll_new - ll_cur)
                    acc = (
                        jnp.log(jax.random.uniform(k_acc, (), ll_cur.dtype))
                        < log_a
                    )
                    u_kd = jnp.where(
                        acc,
                        jax.lax.dynamic_update_index_in_dim(
                            u_kd, kd_prop, b, 0
                        ),
                        u_kd,
                    )
                    lw = jnp.where(acc, lw_new, lw)
                    ll_cur = jnp.where(acc, ll_new, ll_cur)
                    return (u_kd, lw, ll_cur), acc

                (u_key_data, _, ll), accs = jax.lax.scan(
                    imh_body,
                    (u_key_data, lw0, ll),
                    jnp.arange(n_u_mh * u_blocks),
                )
            else:

                def imh_body(carry, j):
                    u_kd, ll_cur = carry
                    kj = jax.random.fold_in(k_imh, j)
                    k_prop, k_acc = jax.random.split(kj)
                    u_prop = jax.random.normal(k_prop, target.u_shape, u_dtype)
                    ll_prop = est(u_prop)
                    log_a = beta_new * (ll_prop - ll_cur)
                    acc = (
                        jnp.log(jax.random.uniform(k_acc, (), ll_cur.dtype))
                        < log_a
                    )
                    u_kd = jnp.where(acc, jax.random.key_data(k_prop), u_kd)
                    ll_cur = jnp.where(acc, ll_prop, ll_cur)
                    return (u_kd, ll_cur), acc

                (u_key_data, ll), accs = jax.lax.scan(
                    imh_body, (u_key_data, ll), jnp.arange(n_u_mh)
                )

            # --- theta-rejuvenation with u held FIXED (theta-only kernel)
            s = ChainState(
                theta=theta,
                u=_materialize_u(u_key_data),
                log_lik_hat=beta_new * ll,
                key=k_theta,
            )

            def body(s, _):
                s, info = transition(s, params)
                return s, info

            s, _infos = jax.lax.scan(body, s, None, length=n_mcmc)
            return (
                s.theta,
                s.log_lik_hat / beta_new,
                u_key_data,
                s.key,
                jnp.mean(accs.astype(u_dtype)),
            )

        return one

    def _stage_local_light(states, beta, u01, k_rej):
        # states.u holds raw key DATA (uint32 words) per particle
        states, beta_new, log_z_inc, params, _std = _resample_and_params(
            states, beta, u01, k_rej
        )

        t_beta = tempered_target(target, beta_new)
        transition = make_rejuvenation(t_beta)
        if hasattr(transition, "stage_names"):
            params = {k: v for k, v in params.items() if k in transition.stage_names}

        one = _make_one(beta_new, params, transition)
        theta, ll, ukd, keys, u_acc = _chunked_map(
            one,
            (states.theta, states.log_lik_hat, states.u, states.key),
            n_local,
            _chunk_size(n_local, rejuv_batch),
        )
        states = ChainState(theta=theta, u=ukd, log_lik_hat=ll, key=keys)
        u_acc = jax.lax.pmean(jnp.mean(u_acc), _AXIS)
        return states, beta_new, log_z_inc, u_acc

    stage_local = _stage_local_light if not carry_u else _stage_local

    @jax.jit
    def stage(states, beta, key):
        k_res, k_rej = jax.random.split(key)
        u01 = jax.random.uniform(k_res, (), states.log_lik_hat.dtype)
        return shard_map(
            lambda s: stage_local(s, beta, u01, k_rej),
            mesh=mesh,
            in_specs=(spec,),
            out_specs=(spec, P(), P(), P()),
            check_vma=False,
        )(states)

    # ------------------------------------------------------------------
    # Split-dispatch stage (carry_u=False only): the resample head runs as
    # one dispatch, then the rejuvenation runs as ``rejuv_dispatches``
    # separate dispatches over contiguous local particle groups.  Needed
    # wherever a single dispatch's wall time is bounded (the tunneled dev
    # backend kills ~60s dispatches; a 1M-particle GP rejuvenation is one
    # ~5-minute dispatch otherwise).  Per-particle math is IDENTICAL to the
    # single-dispatch stage (grouping a vmap changes nothing), so results
    # are bitwise-equal to rejuv_dispatches=1 — tested in test_smc.py.
    # ------------------------------------------------------------------
    # group size = largest divisor of n_local <= n_local/K, so the group
    # count is the smallest divisor-compatible count >= rejuv_dispatches
    g_size = _chunk_size(n_local, max(1, n_local // max(1, int(rejuv_dispatches))))
    n_groups = n_local // g_size

    @jax.jit
    def stage_head(states, beta, key):
        k_res, k_rej = jax.random.split(key)
        u01 = jax.random.uniform(k_res, (), states.log_lik_hat.dtype)

        def local(s):
            s2, beta_new, log_z_inc, _params, std = _resample_and_params(
                s, beta, u01, k_rej
            )
            return s2, beta_new, log_z_inc, std

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(spec,),
            out_specs=(spec, P(), P(), P()),
            check_vma=False,
        )(states)

    @jax.jit
    def stage_rejuv_group(states, beta_new, std, j):
        def local(s, beta_new, std, j):
            t_beta = tempered_target(target, beta_new)
            transition = make_rejuvenation(t_beta)
            params = _rejuv_params(std, transition)
            one = _make_one(beta_new, params, transition)

            off = j * g_size

            def sl(x):
                return jax.lax.dynamic_slice_in_dim(x, off, g_size, 0)

            key_data = jax.random.key_data(s.key)
            theta, ll, ukd, keys, u_acc = _chunked_map(
                one,
                (
                    sl(s.theta),
                    sl(s.log_lik_hat),
                    sl(s.u),
                    jax.random.wrap_key_data(sl(key_data)),
                ),
                g_size,
                _chunk_size(g_size, rejuv_batch),
            )

            def upd(x, vals):
                return jax.lax.dynamic_update_slice_in_dim(x, vals, off, 0)

            s2 = ChainState(
                theta=upd(s.theta, theta),
                u=upd(s.u, ukd),
                log_lik_hat=upd(s.log_lik_hat, ll),
                key=jax.random.wrap_key_data(
                    upd(key_data, jax.random.key_data(keys))
                ),
            )
            return s2, jax.lax.pmean(jnp.mean(u_acc), _AXIS)

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, P(), P(), P()),
            out_specs=(spec, P()),
            check_vma=False,
        )(states, beta_new, std, j)

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

    def _init_one_light(key):
        """Per-particle light init: a pure function of (key, global slot)."""

        def one(g):
            k = jax.random.fold_in(key, g)
            k_t, k_u, k_carry = jax.random.split(k, 3)
            theta = target.sample_prior(k_t)
            if u_blocks == 1:
                u_kd = jax.random.key_data(k_u)
            else:
                u_kd = jax.vmap(
                    lambda b: jax.random.key_data(jax.random.fold_in(k_u, b))
                )(jnp.arange(u_blocks))
            ll = _ll_of(theta, _materialize_u(u_kd))
            return theta, ll, u_kd, k_carry

        return one

    def _init_prior_light(key):
        """Sharded, chunked init: never materialises more than one chunk of
        u per device.  Each particle's state is a pure function of (key,
        global slot index), so the init is mesh-shape independent."""
        if target.sample_prior is None:
            raise ValueError(f"SMC needs target.sample_prior ({target.name})")

        chunk = _chunk_size(n_local, rejuv_batch)
        one = _init_one_light(key)

        def local():
            shard = jax.lax.axis_index(_AXIS)
            g = shard * n_local + jnp.arange(n_local)
            theta, ll, ukd, keys = _chunked_map(one, (g,), n_local, chunk)
            return ChainState(theta=theta, u=ukd, log_lik_hat=ll, key=keys)

        return shard_map(
            local, mesh=mesh, in_specs=(), out_specs=spec, check_vma=False
        )()

    # Split-dispatch init (carry_u=False): the prior init pays one
    # log_lik_est per particle — at full-n GP scale a single init dispatch
    # exceeds backend dispatch-wall bounds just like a rejuvenation stage
    # does (measured: it killed the tunneled device at 8k particles,
    # n=640), so it splits over the same contiguous groups.  Per-particle
    # init is a pure function of (key, global slot), so the result is
    # bitwise-equal to the single-dispatch init.
    def _init_prior_light_split(key):
        if target.sample_prior is None:
            raise ValueError(f"SMC needs target.sample_prior ({target.name})")

        chunk = _chunk_size(g_size, rejuv_batch)
        one = _init_one_light(key)

        @jax.jit
        def init_group(states, j):
            def local(s, j):
                shard = jax.lax.axis_index(_AXIS)
                off = j * g_size
                g = shard * n_local + off + jnp.arange(g_size)
                theta, ll, ukd, keys = _chunked_map(one, (g,), g_size, chunk)

                def upd(x, vals):
                    return jax.lax.dynamic_update_slice_in_dim(x, vals, off, 0)

                kd = jax.random.key_data(s.key)
                return ChainState(
                    theta=upd(s.theta, theta),
                    u=upd(s.u, ukd),
                    log_lik_hat=upd(s.log_lik_hat, ll),
                    key=jax.random.wrap_key_data(
                        upd(kd, jax.random.key_data(keys))
                    ),
                )

            return shard_map(
                local, mesh=mesh, in_specs=(spec, P()), out_specs=spec,
                check_vma=False,
            )(states, j)

        @jax.jit
        def init_zero():
            def local():
                kd_shape = (n_local, 2) if u_blocks == 1 else (
                    n_local, u_blocks, 2
                )
                return ChainState(
                    theta=jnp.zeros((n_local, target.d), u_dtype),
                    u=jnp.zeros(kd_shape, jnp.uint32),
                    log_lik_hat=jnp.zeros((n_local,), u_dtype),
                    key=jax.random.split(jax.random.key(0), n_local),
                )

            return shard_map(
                local, mesh=mesh, in_specs=(), out_specs=spec,
                check_vma=False,
            )()

        states = init_zero()
        for j in range(n_groups):
            states = init_group(states, jnp.int32(j))
        return states

    init_prior = _init_prior_light if not carry_u else _init_prior

    def run(key, stop_after=None):
        """``stop_after``: end the loop after that many completed stages
        (fault-injection hook for the checkpoint tests — a killed run is a
        run that stopped after its last checkpointed stage)."""
        import time as _time

        k_init, k_loop = jax.random.split(key)
        t0 = _time.time()
        if (not carry_u) and n_groups > 1:
            states = _init_prior_light_split(k_init)
        else:
            states = jax.jit(init_prior)(k_init)
        if time_stages:
            from auxpm_tpu.utils.profiling import device_sync

            device_sync(states.theta)
        init_wall = _time.time() - t0
        beta = jnp.asarray(0.0, states.theta.dtype)
        split = (not carry_u) and n_groups > 1
        log_z, betas, u_accs, walls = 0.0, [0.0], [], []
        start_stage = 0
        ckpt_config = None
        if checkpoint_dir is not None:
            import os as _os

            from auxpm_tpu.utils.checkpoint import (
                load_checkpoint,
                save_checkpoint,
            )

            # the config hash binds the checkpoint to the run definition —
            # every knob that changes the sampled TRAJECTORY, including the
            # run key (a resume with a different key would silently
            # continue a DIFFERENT random trajectory) and u_blocks (r5 fix:
            # the blocked u-refresh draws per-block keys, so a resume under
            # a different block count is a different chain).  Deliberately
            # EXCLUDED: rejuv_batch and rejuv_dispatches — both are
            # bitwise-equal re-chunkings of the same computation
            # (tests/test_smc.py split-dispatch bitwise test), so a resume
            # may re-split to fit a different dispatch-wall budget.
            ckpt_config = {
                "smc": target.name,
                "n_particles": n_particles,
                "carry_u": carry_u,
                "n_u_mh": n_u_mh,
                "ess_frac": ess_frac,
                "n_mcmc": n_mcmc,
                "u_blocks": u_blocks,
                "key": np.asarray(jax.random.key_data(key)).tolist(),
            }
            shard_file = _os.path.join(
                checkpoint_dir, f"shard_{jax.process_index()}.npz"
            )
            if _os.path.exists(shard_file):
                states, start_stage, meta = load_checkpoint(
                    checkpoint_dir, states, config=ckpt_config
                )
                beta = jnp.asarray(meta["beta"], states.theta.dtype)
                log_z = float(meta["log_z"])
                betas = [float(b) for b in meta["betas"]]
                u_accs = [float(a) for a in meta["u_accs"]]

        def _save(s_done):
            save_checkpoint(
                checkpoint_dir,
                states,
                step=s_done,
                config=ckpt_config,
                params={
                    "beta": float(beta),
                    "log_z": log_z,
                    "betas": betas,
                    "u_accs": u_accs,
                },
            )

        for s in range(start_stage, max_stages):
            if betas[-1] >= 1.0:
                break
            t0 = _time.time()
            if split:
                states, beta, log_z_inc, std = stage_head(
                    states, beta, jax.random.fold_in(k_loop, s)
                )
                accs = []
                for j in range(n_groups):
                    states, acc_j = stage_rejuv_group(
                        states, beta, std, jnp.int32(j)
                    )
                    accs.append(acc_j)
                u_acc = sum(float(a) for a in accs) / n_groups
            else:
                states, beta, log_z_inc, u_acc = stage(
                    states, beta, jax.random.fold_in(k_loop, s)
                )
            log_z += float(log_z_inc)
            betas.append(float(beta))
            u_accs.append(float(u_acc))
            if time_stages:
                from auxpm_tpu.utils.profiling import device_sync

                device_sync(states.theta)
                walls.append(round(_time.time() - t0, 3))
            done = betas[-1] >= 1.0
            if checkpoint_dir is not None and (
                done or (s + 1) % checkpoint_every == 0
            ):
                _save(s + 1)
            if done:
                break
            if stop_after is not None and (s + 1) >= stop_after:
                break
        diag = {"log_z": log_z, "betas": betas, "n_stages": len(betas) - 1}
        if not carry_u:
            diag["u_mh_accept"] = u_accs
        if time_stages:
            diag["init_wall"] = round(init_wall, 3)
            diag["stage_wall"] = walls
        return states, diag

    return run
