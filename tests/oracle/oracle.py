"""Pure-NumPy oracle implementation of the reference semantics.

SURVEY.md §4.4: a faithful scalar Python-loop implementation of the
reference's samplers (pseudo-marginal MH, elliptical slice on u, stepping
out + shrinkage slice on theta — Murray & Graham 2016 §2-4, BASELINE.json:5)
used two ways:

1. **Equivalence tests**: the JAX transitions, whose bracket/shrink loops are
   bounded masked ``lax.while_loop``s, must produce *identical* samples to
   this oracle when both consume the same random draws.  Randomness is
   injected through a ``draws`` provider so the tests can mirror the JAX
   key-splitting discipline exactly (see ``tests/test_oracle_equivalence``).
2. **CPU reference baseline**: with a NumPy ``Generator`` provider this is
   the "CPU reference" for BASELINE Target 1 (≥5x ESS/sec at 1 chip),
   labeled as an oracle reimplementation because the reference mount was
   empty (SURVEY.md §0, BASELINE.md).

No JAX imports here — this module must stay a plain single-threaded
NumPy/Python implementation, mirroring the reference's L1/L2 layers.
"""

from __future__ import annotations

import dataclasses

import numpy as np

TWO_PI = 2.0 * np.pi


@dataclasses.dataclass
class OracleState:
    theta: np.ndarray
    u: np.ndarray
    log_lik_hat: float


class NumpyDraws:
    """Randomness provider backed by a NumPy Generator (benchmark mode)."""

    def __init__(self, rng: np.random.Generator):
        self.rng = rng

    def normal(self, name, shape):
        return self.rng.standard_normal(shape)

    def uniform(self, name):
        return float(self.rng.uniform())


class ScriptedDraws:
    """Randomness provider fed from a dict of precomputed draws.

    Keys: draw name -> array or callable; loop draws are indexed
    ``name`` -> array indexed by iteration.
    """

    def __init__(self, table):
        self.table = table

    def normal(self, name, shape):
        out = np.asarray(self.table[name])
        assert out.shape == tuple(shape), (name, out.shape, shape)
        return out

    def uniform(self, name):
        return float(np.asarray(self.table[name]))


# ---------------------------------------------------------------------------
# Transitions (scalar, single chain).  Semantics: SURVEY.md §3.2-3.3.
# ---------------------------------------------------------------------------


def pm_mh_step(state, target, step_size, draws):
    """Pseudo-marginal MH: fresh u each proposal (SURVEY.md §3.2)."""
    theta_p = state.theta + step_size * draws.normal("prop", state.theta.shape)
    u_p = draws.normal("u", state.u.shape)
    log_lik_p = target.log_lik_est(theta_p, u_p)
    log_accept = (
        target.log_prior(theta_p)
        + log_lik_p
        - target.log_prior(state.theta)
        - state.log_lik_hat
    )
    if np.log(draws.uniform("acc")) < log_accept:
        return OracleState(theta_p, u_p, float(log_lik_p)), True
    return state, False


def ess_update_u(state, target, draws, max_iters=32):
    """Elliptical slice update of u | theta (SURVEY.md §3.3)."""
    v = draws.normal("v", state.u.shape)
    log_y = state.log_lik_hat + np.log(draws.uniform("h"))
    a = draws.uniform("a0") * TWO_PI
    a_min, a_max = a - TWO_PI, a

    n = 0
    while True:
        u_p = state.u * np.cos(a) + v * np.sin(a)
        ll_p = float(target.log_lik_est(state.theta, u_p))
        if ll_p > log_y:
            return OracleState(state.theta.copy(), u_p, ll_p), n
        if n >= max_iters:
            return state, n  # cap-hit: keep current state (matches JAX kernel)
        if a < 0:
            a_min = a
        else:
            a_max = a
        a = a_min + (a_max - a_min) * draws.uniform(f"shrink_{n}")
        n += 1


def _slice_1d(x0, log_fx0, f, w, draws, prefix, max_step_out=8, max_shrink=32):
    """Neal (2003) stepping-out + shrinkage along one scalar coordinate.

    Mirrors the bounded-loop JAX kernel exactly: both step-out directions
    advance in lock-step rounds sharing one iteration budget, and cap-hit in
    shrinkage keeps the current point.
    """
    log_y = log_fx0 + np.log(draws.uniform(f"{prefix}_h"))
    l = x0 - w * draws.uniform(f"{prefix}_init")
    r = l + w

    expand_l = expand_r = True
    i = 0
    while i < max_step_out and (expand_l or expand_r):
        if expand_l:
            lp_l, _ = f(l)
            expand_l = lp_l > log_y
            if expand_l:
                l -= w
        if expand_r:
            lp_r, _ = f(r)
            expand_r = lp_r > log_y
            if expand_r:
                r += w
        i += 1
    n_so = i

    for j in range(max_shrink):
        x = l + (r - l) * draws.uniform(f"{prefix}_shrink_{j}")
        lp, ll = f(x)
        if lp > log_y:
            return x, lp, ll, True, 2 * n_so + j + 1
        if x < x0:
            l = x
        else:
            r = x
    return x0, log_fx0, None, False, 2 * n_so + max_shrink


def slice_update_theta(state, target, widths, draws, max_step_out=8, max_shrink=32):
    """Per-coordinate slice sampling of theta | u (SURVEY.md §3.3)."""
    theta = state.theta.copy()
    log_lik = state.log_lik_hat
    log_post = float(target.log_prior(theta)) + log_lik
    widths = np.broadcast_to(np.asarray(widths, float), theta.shape)
    n_probe = 0

    for i in range(theta.shape[0]):
        def f(x, i=i):
            th = theta.copy()
            th[i] = x
            ll = float(target.log_lik_est(th, state.u))
            return float(target.log_prior(th)) + ll, ll

        x_new, lp_new, ll_new, done, k = _slice_1d(
            float(theta[i]), log_post, f, float(widths[i]), draws, f"c{i}",
            max_step_out, max_shrink,
        )
        theta[i] = x_new
        log_post = lp_new
        if done:
            log_lik = ll_new
        n_probe += k

    return OracleState(theta, state.u.copy(), log_lik), n_probe
