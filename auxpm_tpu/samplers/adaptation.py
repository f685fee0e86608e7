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

Adaptation runs in an outer Python loop over windows (a handful of compiled
calls); the inner ``window_size`` steps are one compiled scan.  Burn-in only:
freeze params afterwards so the chain is a fixed valid kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _global_moments(theta_rec):
    """Global per-coordinate std over (chains, steps, d) — sharded-safe."""
    flat = theta_rec.reshape(-1, theta_rec.shape[-1])
    return jnp.std(flat, axis=0)


@jax.jit
def _global_mean(x):
    return jnp.mean(x)


def adapt_params(params, recs, infos, target_accept=0.234, lr=1.0,
                 width_scale=2.0, width_bounds=(1e-3, 1e3)):
    """One window update; returns a new params dict (host-side plumbing,
    device-side reductions)."""
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

    return new


def warmup(run_fn, states, params, n_windows, window_size, **adapt_kw):
    """Run ``n_windows`` adaptation windows; returns (states, params, log).

    ``run_fn(states, params, n_steps) -> (states, recs, infos)`` — either
    the plain or the sharded runner, partially applied.
    """
    history = []
    for w in range(n_windows):
        states, recs, infos = run_fn(states, params, window_size)
        params = adapt_params(params, recs, infos, **adapt_kw)
        history.append(
            {
                "window": w,
                **{
                    k: float(_global_mean(v))
                    for k, v in infos.items()
                },
            }
        )
    return states, params, history
