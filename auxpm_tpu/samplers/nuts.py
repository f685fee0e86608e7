"""Multinomial NUTS (No-U-Turn Sampler), iterative and vmappable.

BASELINE.json:5/11: NUTS baseline + "NUTS rejuvenation" inside SMC.  The
algorithm is Hoffman & Gelman (2014) Alg. 3 with Betancourt (2017)
multinomial sampling and biased progressive tree sampling, restructured for
XLA: NO recursion, bounded loops only, per-chain masks under ``vmap``
(SURVEY.md §7 hard part #1).

Iterative tree building: a subtree of 2^d leaves is built by one
``fori_loop`` of leapfrog steps.  The recursive algorithm's internal-node
U-turn checks are reproduced with the checkpoint trick: while integrating
leaves i = 0..2^d-1,

- leaf i with i even is stored in checkpoint slot ``popcount(i)`` (pending
  left endpoints of open spans have strictly increasing popcount, so slots
  never collide; <= max_depth slots needed);
- on completing leaf i, every span of size 2^k that ends at i (k =
  1..ctz(i+1)) is checked for a U-turn against its left endpoint, which
  sits in slot ``popcount(i+1 - 2^k)``.

Backward-direction subtrees need care: leapfrog with -eps follows the orbit
backwards but the momenta it produces are the *forward* momenta of those
points (reversing Hamiltonian flow negates momentum only if r is negated
explicitly, which leapfrog does not do).  So for a span integrated with
direction v, the time-ordered displacement is v * (z_later - z_earlier) and
the U-turn dot products must be scaled by v; the whole-trajectory check
needs no scaling because z_minus always holds the time-minus end with its
forward momentum.  (Getting this sign wrong makes backward subtrees report
U-turns in exactly the healthy case — found against a step-count oracle.)

The proposal is exact multinomial sampling over the trajectory (no MH
accept); ``accept_prob`` reported in info is the Stan-style mean Metropolis
statistic used for step-size adaptation.

Factory args:
  max_depth: maximum tree depth (static: sizes the checkpoint buffers;
    default 8 => <= 255 grad evals per step).
Params:
  step_size: leapfrog step size.
  inv_mass: diagonal inverse mass (scalar or (d,)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import ChainState
from auxpm_tpu.samplers.hmc import potential_fn

_DIVERGENCE = 1000.0


def _popcount(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def _ctz(x):
    """Count trailing zeros of x > 0 (number of low-order zero bits)."""
    x = x.astype(jnp.uint32)
    return jax.lax.population_count(~x & (x - 1)).astype(jnp.int32)


def _uturn(z_minus, r_minus, z_plus, r_plus, inv_mass):
    dz = z_plus - z_minus
    return (jnp.dot(dz, inv_mass * r_minus) < 0.0) | (
        jnp.dot(dz, inv_mass * r_plus) < 0.0
    )


def make_nuts(target, max_depth=8):
    def step(state: ChainState, params: dict):
        eps = jnp.asarray(params.get("step_size", 0.1), state.theta.dtype)
        inv_mass = jnp.asarray(params.get("inv_mass", 1.0), state.theta.dtype)
        inv_mass_v = jnp.broadcast_to(inv_mass, state.theta.shape)

        key, k_mom, k_loop = jax.random.split(state.key, 3)
        u_fn = potential_fn(target, state.u)
        vg = jax.value_and_grad(u_fn)
        d = state.theta.shape[0]
        dtype = state.theta.dtype

        pe0, g0 = vg(state.theta)
        r0 = jax.random.normal(k_mom, (d,), dtype) / jnp.sqrt(inv_mass_v)
        h0 = pe0 + 0.5 * jnp.sum(inv_mass_v * r0 * r0)

        def one_leapfrog(z, r, g, direction):
            e = direction * eps
            r = r - 0.5 * e * g
            z = z + e * inv_mass_v * r
            pe, g = vg(z)
            r = r - 0.5 * e * g
            return z, r, g, pe

        def build_subtree(carry_key, z0, r0_, g0_, n_leaves, direction):
            """Integrate n_leaves leapfrog steps from (z0, r0_); returns
            subtree summary.  All loops bounded by runtime n_leaves."""
            ckpt_z = jnp.zeros((max_depth + 1, d), dtype)
            ckpt_r = jnp.zeros((max_depth + 1, d), dtype)

            def body(s, c):
                (z, r, g, lsw, zp, pep, sum_met, turn, div, cz, cr) = c
                z, r, g, pe = one_leapfrog(z, r, g, direction)
                h = pe + 0.5 * jnp.sum(inv_mass_v * r * r)
                log_w = h0 - h
                log_w = jnp.where(jnp.isfinite(log_w), log_w, -jnp.inf)
                div = div | ((h - h0) > _DIVERGENCE) | ~jnp.isfinite(h)
                sum_met = sum_met + jnp.exp(jnp.minimum(log_w, 0.0))

                # progressive multinomial sampling within the subtree
                new_lsw = jnp.logaddexp(lsw, log_w)
                p_take = jnp.exp(log_w - jnp.where(jnp.isfinite(new_lsw), new_lsw, 0.0))
                u_samp = jax.random.uniform(
                    jax.random.fold_in(carry_key, s), (), dtype
                )
                take = u_samp < p_take
                zp = jnp.where(take, z, zp)
                pep = jnp.where(take, pe, pep)

                # checkpoint store (even leaf) — slot popcount(s)
                slot = _popcount(s)
                is_even = (s % 2) == 0
                cz = jnp.where(
                    is_even,
                    cz.at[slot].set(z),
                    cz,
                )
                cr = jnp.where(
                    is_even,
                    cr.at[slot].set(r),
                    cr,
                )

                # U-turn checks for spans ending at this (odd) leaf
                t = jnp.where(is_even, 0, _ctz(s + 1))

                def chk(k, turn_acc):
                    l_idx = s + 1 - (1 << k)
                    slot_l = _popcount(l_idx)
                    zl = cz[slot_l]
                    rl = cr[slot_l]
                    active = k <= t
                    # time-ordered span: scale displacement by direction
                    bad = _uturn(
                        direction * zl, rl, direction * z, r, inv_mass_v
                    )
                    return turn_acc | (active & bad)

                turn = jax.lax.fori_loop(1, max_depth + 1, chk, turn)
                return (z, r, g, new_lsw, zp, pep, sum_met, turn, div, cz, cr)

            init = (
                z0,
                r0_,
                g0_,
                jnp.asarray(-jnp.inf, dtype),
                z0,
                jnp.asarray(0.0, dtype),
                jnp.asarray(0.0, dtype),
                jnp.bool_(False),
                jnp.bool_(False),
                ckpt_z,
                ckpt_r,
            )
            (z, r, g, lsw, zp, pep, sum_met, turn, div, _, _) = jax.lax.fori_loop(
                0, n_leaves, body, init
            )
            return z, r, g, lsw, zp, pep, sum_met, turn, div

        # ------- outer doubling loop -------
        def cond(c):
            (depth, turn, div, *_rest) = c
            return (depth < max_depth) & ~turn & ~div

        def body(c):
            (
                depth,
                turn,
                div,
                zm,
                rm,
                gm,
                zp_,
                rp_,
                gp_,
                z_prop,
                pe_prop,
                lsw,
                sum_met,
                n_met,
                kkey,
            ) = c
            kd, kb, ks, kkey = jax.random.split(kkey, 4)
            direction = jnp.where(
                jax.random.bernoulli(kd), jnp.asarray(1.0, dtype), jnp.asarray(-1.0, dtype)
            )
            z0 = jnp.where(direction > 0, zp_, zm)
            r0_ = jnp.where(direction > 0, rp_, rm)
            g0_ = jnp.where(direction > 0, gp_, gm)

            n_leaves = jnp.asarray(1, jnp.int32) << depth
            ze, re, ge, lsw_sub, zp_sub, pe_sub, sm_sub, turn_sub, div_sub = (
                build_subtree(ks, z0, r0_, g0_, n_leaves, direction)
            )

            ok = ~(turn_sub | div_sub)
            # biased progressive sampling between old tree and new subtree
            p_new = jnp.exp(jnp.minimum(lsw_sub - lsw, 0.0))
            take = ok & (jax.random.uniform(kb, (), dtype) < p_new)
            z_prop = jnp.where(take, zp_sub, z_prop)
            pe_prop = jnp.where(take, pe_sub, pe_prop)
            lsw = jnp.where(ok, jnp.logaddexp(lsw, lsw_sub), lsw)
            sum_met = sum_met + sm_sub
            n_met = n_met + n_leaves.astype(dtype)

            # extend trajectory endpoint in the chosen direction
            zm = jnp.where(ok & (direction < 0), ze, zm)
            rm = jnp.where(ok & (direction < 0), re, rm)
            gm = jnp.where(ok & (direction < 0), ge, gm)
            zp_ = jnp.where(ok & (direction > 0), ze, zp_)
            rp_ = jnp.where(ok & (direction > 0), re, rp_)
            gp_ = jnp.where(ok & (direction > 0), ge, gp_)

            turn_all = _uturn(zm, rm, zp_, rp_, inv_mass_v)
            turn = turn_sub | (ok & turn_all)
            div = div | div_sub
            return (
                depth + 1,
                turn,
                div,
                zm,
                rm,
                gm,
                zp_,
                rp_,
                gp_,
                z_prop,
                pe_prop,
                lsw,
                sum_met,
                n_met,
                kkey,
            )

        init = (
            jnp.asarray(0, jnp.int32),
            jnp.bool_(False),
            jnp.bool_(False),
            state.theta,
            r0,
            g0,
            state.theta,
            r0,
            g0,
            state.theta,
            pe0,
            jnp.asarray(0.0, dtype),  # log_sum_w of the initial point: log 1
            jnp.asarray(0.0, dtype),
            jnp.asarray(0.0, dtype),
            k_loop,
        )
        out = jax.lax.while_loop(cond, body, init)
        (depth, turn, div, _, _, _, _, _, _, z_prop, pe_prop, _, sum_met, n_met, _) = out

        new_log_lik = -pe_prop - target.log_prior(z_prop)
        from auxpm_tpu.core.state import refresh_target_cache

        new_state = state.replace(
            theta=z_prop,
            log_lik_hat=new_log_lik,
            key=key,
            extras=refresh_target_cache(target, state.extras, z_prop),
        )
        info = {
            "depth": depth.astype(jnp.float32),
            "diverged": div.astype(jnp.float32),
            "accept_prob": (sum_met / jnp.maximum(n_met, 1.0)).astype(jnp.float32),
            "n_leapfrog": n_met.astype(jnp.float32),
        }
        return new_state, info

    return step
