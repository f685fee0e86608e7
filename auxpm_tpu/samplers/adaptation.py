"""Windowed global adaptation of sampler hyperparameters.

BASELINE.json:10: "global step-size/bracket adaptation via psum" — the
reference has only per-chain hand tuning (SURVEY.md §2.3 last row).  Here
adaptation statistics are reduced across ALL chains on ALL devices each
window; under jit over sharded arrays the cross-device part of the mean IS
the psum (GSPMD inserts it), so the same code adapts on one chip and on a
pod slice.

Rules (standard, robust):
- random-walk step sizes (pm_mh / mh_theta): Robbins-Monro on log step
  toward a target acceptance rate (0.234 for RWM).
- slice widths: set to ``width_scale`` x the global per-coordinate posterior
  std estimated from the window's samples — the classic width heuristic
  (Neal 2003 §4 discussion); clamped to a sane range.
- HMC/NUTS step sizes: Nesterov dual averaging of log eps toward a target
  mean Metropolis statistic (0.8), Hoffman & Gelman (2014) Alg. 5 with Stan
  defaults (gamma=0.05, t0=10, kappa=0.75).  Crucially this runs IN-SCAN —
  ``wrap_dual_averaging`` threads per-chain DA state through
  ``ChainState.extras`` so eps responds to every step's accept statistic
  inside the compiled window (a window-level update cannot work: eps would
  be frozen for the whole window while the schedule assumes per-step
  feedback, and one all-reject window drives log eps to -inf).  Warmup ends
  by freezing each group's step size at the cross-chain geometric mean of
  the averaged iterate eps_bar.
- HMC/NUTS diagonal mass matrix: regularized per-coordinate sample variance
  of each window's draws (Stan's diag_e regularisation,
  var * n/(n+5) + 1e-3 * 5/(n+5)) as ``inv_mass``; each metric update
  re-anchors the dual-averaging schedule at the current step size (the
  optimal eps changes with the metric).

Adaptation runs in an outer Python loop over windows (a handful of compiled
calls); the inner ``window_size`` steps are one compiled scan.  Burn-in
only: params are frozen afterwards so the main chain is a fixed valid
kernel.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_DA_GROUPS = ("nuts", "hmc")  # groups that report accept_prob for DA
_DA_FIELDS = ("log_eps", "log_eps_bar", "h_bar", "t", "mu")


@jax.jit
def _global_moments(theta_rec):
    """Global per-coordinate std over (chains, steps, d) — sharded-safe."""
    flat = theta_rec.reshape(-1, theta_rec.shape[-1])
    return jnp.std(flat, axis=0)


@jax.jit
def _global_mean(x):
    return jnp.mean(x)


def regularized_inv_mass(theta_rec):
    """Stan-style diagonal inverse metric from window samples: the
    regularized per-coordinate variance over (chains, steps)."""
    flat = np.asarray(theta_rec, np.float64).reshape(-1, theta_rec.shape[-1])
    n = flat.shape[0]
    var = flat.var(axis=0)
    return (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))


# ---------------------------------------------------------------------------
# In-scan dual averaging (Hoffman & Gelman 2014 Alg. 5, per chain)
# ---------------------------------------------------------------------------


def _da_key(group, field):
    return f"da_{group}_{field}"


def wrap_dual_averaging(
    transition, groups, target_accept=0.8, gamma=0.05, t0=10.0, kappa=0.75
):
    """Wrap a (per-chain) transition so each listed group's ``step_size`` is
    read from, and its dual-averaging state updated in, ``state.extras`` —
    one DA update per transition application, inside the compiled scan.

    The wrapped kernel is only for WARMUP: it is not a fixed Markov kernel
    (eps changes every step), which is exactly why warmup ends with
    ``finalize_dual_averaging`` freezing eps and stripping the extras.
    """
    groups = tuple(groups)

    def wrapped(state, params):
        p = dict(params)
        for g in groups:
            gg = dict(p.get(g, {}))
            gg["step_size"] = jnp.exp(state.extras[_da_key(g, "log_eps")])
            p[g] = gg
        state, info = transition(state, p)
        ex = dict(state.extras)
        for g in groups:
            acc = info[f"{g}/accept_prob"]
            t = ex[_da_key(g, "t")] + 1.0
            eta = 1.0 / (t + t0)
            h_bar = (1.0 - eta) * ex[_da_key(g, "h_bar")] + eta * (
                target_accept - acc
            )
            log_eps = ex[_da_key(g, "mu")] - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * ex[_da_key(g, "log_eps_bar")]
            ex.update(
                {
                    _da_key(g, "t"): t,
                    _da_key(g, "h_bar"): h_bar,
                    _da_key(g, "log_eps"): log_eps,
                    _da_key(g, "log_eps_bar"): log_eps_bar,
                }
            )
        return state.replace(extras=ex), info

    wrapped.stage_names = getattr(transition, "stage_names", ())
    return wrapped


def init_dual_averaging(states, params, groups):
    """Add per-chain DA fields to a batched state (schedule anchored at each
    group's current step_size, Stan's mu = log(10 eps0))."""
    n = states.theta.shape[0]
    dtype = states.theta.dtype
    ex = dict(states.extras) if states.extras else {}
    for g in groups:
        eps0 = float(np.asarray(params.get(g, {}).get("step_size", 0.5)))
        ex[_da_key(g, "log_eps")] = jnp.full((n,), np.log(eps0), dtype)
        ex[_da_key(g, "log_eps_bar")] = jnp.full((n,), np.log(eps0), dtype)
        ex[_da_key(g, "h_bar")] = jnp.zeros((n,), dtype)
        ex[_da_key(g, "t")] = jnp.zeros((n,), dtype)
        ex[_da_key(g, "mu")] = jnp.full((n,), np.log(10.0 * eps0), dtype)
    return states.replace(extras=ex)


def restart_dual_averaging(states, groups):
    """Re-anchor each chain's schedule at its CURRENT eps (called after a
    mass-matrix update: the optimal step size moved with the metric)."""
    ex = dict(states.extras)
    for g in groups:
        log_eps = ex[_da_key(g, "log_eps")]
        ex[_da_key(g, "mu")] = log_eps + np.log(10.0)
        ex[_da_key(g, "log_eps_bar")] = log_eps
        ex[_da_key(g, "h_bar")] = jnp.zeros_like(log_eps)
        ex[_da_key(g, "t")] = jnp.zeros_like(log_eps)
    return states.replace(extras=ex)


def finalize_dual_averaging(states, params, groups):
    """Freeze each group's step size at the cross-chain geometric mean of
    eps_bar and strip the DA fields from the state."""
    new = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}
    ex = dict(states.extras)
    for g in groups:
        log_eps_bar = np.asarray(ex[_da_key(g, "log_eps_bar")], np.float64)
        gg = dict(new.get(g, {}))
        gg["step_size"] = float(np.exp(log_eps_bar.mean()))
        new[g] = gg
        for f in _DA_FIELDS:
            ex.pop(_da_key(g, f), None)
    return states.replace(extras=ex), new


# ---------------------------------------------------------------------------
# Window-level rules (RWM step, slice widths) + the warmup driver
# ---------------------------------------------------------------------------


def adapt_params(params, recs, infos, target_accept=0.234, lr=1.0,
                 width_scale=2.0, width_bounds=(1e-3, 1e3)):
    """One window update; returns a new params dict (host-side plumbing,
    device-side reductions).  HMC/NUTS groups are handled by the in-scan
    dual-averaging machinery above, not here."""
    new = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}

    for group in ("pm_mh", "mh_theta"):
        key = f"{group}/accept" if f"{group}/accept" in infos else None
        if group == "pm_mh" and "accept" in infos:  # un-namespaced pm_mh
            acc = float(_global_mean(infos["accept"]))
            old = float(np.asarray(params.get("step_size", 0.5)))
            new["step_size"] = old * float(
                np.exp(lr * (acc - target_accept))
            )
        elif key is not None:
            acc = float(_global_mean(infos[key]))
            g = dict(new.get(group, {}))
            old = float(np.asarray(g.get("step_size", 0.5)))
            g["step_size"] = old * float(np.exp(lr * (acc - target_accept)))
            new[group] = g

    if any(k.startswith("slice_theta/") for k in infos):
        stds = np.asarray(_global_moments(recs["theta"]))
        widths = np.clip(width_scale * stds, *width_bounds)
        g = dict(new.get("slice_theta", {}))
        g["widths"] = jnp.asarray(widths, np.float32)
        new["slice_theta"] = g

    # random-direction stage appended after the per-coordinate sweep
    # (aux_slice_pcrd): same posterior-std rule, its own group
    if any(k.startswith("slice_theta_rd/") for k in infos):
        stds = np.asarray(_global_moments(recs["theta"]))
        g = dict(new.get("slice_theta_rd", {}))
        g["widths"] = jnp.asarray(
            np.clip(width_scale * stds, *width_bounds), np.float32
        )
        new["slice_theta_rd"] = g

    if any(k.startswith("joint_slice/") for k in infos):
        # scalar bracket along a random unit direction: mean posterior std
        stds = np.asarray(_global_moments(recs["theta"]))
        g = dict(new.get("joint_slice", {}))
        g["width"] = float(np.clip(width_scale * stds.mean(), *width_bounds))
        new["joint_slice"] = g

    return new


def warmup(run_fn, states, params, n_windows, window_size,
           step=None, target_accept_hmc=0.8, adapt_mass=True, **adapt_kw):
    """Run ``n_windows`` adaptation windows; returns (states, params, log).

    ``run_fn(transition, states, params, n_steps) -> (states, recs, infos)``
    — the plain or sharded runner, NOT closed over the transition (warmup
    substitutes a dual-averaging-wrapped kernel during the windows).
    ``step`` is the transition; its ``stage_names`` determine which groups
    get dual-averaged step sizes + mass warmup (none -> pure adapt_params
    behavior, backward compatible with a run_fn that ignores the first
    argument).
    """
    if step is None:
        # legacy signature: run_fn closed over the step
        legacy_run_fn = run_fn
        run_fn = lambda _t, s, p, n: legacy_run_fn(s, p, n)  # noqa: E731
    da_groups = tuple(
        g for g in getattr(step, "stage_names", ()) if g in _DA_GROUPS
    )
    transition = step
    if da_groups:
        transition = wrap_dual_averaging(
            step, da_groups, target_accept=target_accept_hmc
        )
        states = init_dual_averaging(states, params, da_groups)

    history = []
    for w in range(n_windows):
        states, recs, infos = run_fn(transition, states, params, window_size)
        params = adapt_params(params, recs, infos, **adapt_kw)
        if da_groups and adapt_mass:
            inv_mass = jnp.asarray(regularized_inv_mass(recs["theta"]), jnp.float32)
            for g in da_groups:
                gg = dict(params.get(g, {}))
                gg["inv_mass"] = inv_mass
                params[g] = gg
            states = restart_dual_averaging(states, da_groups)
        history.append(
            {
                "window": w,
                **{
                    k: float(_global_mean(v))
                    for k, v in infos.items()
                },
            }
        )
    if da_groups:
        states, params = finalize_dual_averaging(states, params, da_groups)
    return states, params, history
