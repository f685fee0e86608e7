"""Carried chol_r cache (models/base.py cache contract, r5).

The aux-slice step used to factorise chol(R(log_ell)) three times per
iteration for the same log_ell (ESS prepare, sigma factory, accepted
ell-probe).  The cache carries the factor in ``state.extras["target_cache"]``
with the invariant ``cache == target.cache_init(state.theta)`` at every step
boundary.  These tests pin the two load-bearing claims:

1. BITWISE parity: enabling the cache changes no sampled value (the cached
   use sites evaluate the identical expression exp(log_sigma) *
   chol_r(log_ell); only where the factor is computed moves).
2. The invariant survives kernels that change theta, including
   non-cache-aware ones covered by the refresh net
   (core/state.refresh_target_cache).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.gp_classification import make_gp_classification
from auxpm_tpu.samplers.chain import run_chains
from auxpm_tpu.samplers.composite import SAMPLERS, make_aux_slice


def _gp_target(n=48, d=3, s=8, **kw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d))
    w = rng.standard_normal(d)
    y = np.where(x @ w + 0.3 * rng.standard_normal(n) > 0, 1.0, -1.0)
    return make_gp_classification(x, y, n_importance=s, **kw)


def _run(step, states, params, n=25):
    out, recs, infos = run_chains(step, states, params, n)
    return out, recs, infos


def test_cached_aux_slice_bitwise_parity():
    target = _gp_target()
    step = make_aux_slice(target, n_ess=2, n_sigma_extra=1)
    params = {"slice_theta": {"widths": jnp.full((target.d,), 1.5)},
              "ess_u": {}}
    s_nc = init_chain_states(jax.random.key(0), target, 4, jitter_scale=0.3)
    s_c = init_chain_states(jax.random.key(0), target, 4, jitter_scale=0.3,
                            with_cache=True)
    assert "target_cache" in s_c.extras and not s_nc.extras

    out_nc, recs_nc, _ = _run(step, s_nc, params)
    out_c, recs_c, _ = _run(step, s_c, params)
    np.testing.assert_array_equal(np.asarray(recs_nc["theta"]),
                                  np.asarray(recs_c["theta"]))
    np.testing.assert_array_equal(np.asarray(out_nc.u), np.asarray(out_c.u))
    np.testing.assert_array_equal(np.asarray(out_nc.log_lik_hat),
                                  np.asarray(out_c.log_lik_hat))


def _assert_invariant(target, states):
    want = jax.vmap(lambda t: target.cache_init(t)["chol_r"])(states.theta)
    np.testing.assert_array_equal(
        np.asarray(want),
        np.asarray(states.extras["target_cache"]["chol_r"]),
    )


def test_cache_invariant_after_aux_slice():
    target = _gp_target()
    step = make_aux_slice(target, n_ess=1, n_sigma_extra=0)
    params = {"slice_theta": {"widths": jnp.full((target.d,), 1.5)},
              "ess_u": {}}
    states = init_chain_states(jax.random.key(1), target, 3,
                               jitter_scale=0.3, with_cache=True)
    out, _, _ = _run(step, states, params, 10)
    _assert_invariant(target, out)


@pytest.mark.parametrize("sampler,params", [
    ("aux_slice_pcrd", {"slice_theta": {"widths": 1.0},
                        "slice_theta_rd": {"widths": 1.0}, "ess_u": {}}),
    ("aux_mh", {"mh_theta": {"step_size": 0.4}, "ess_u": {}}),
])
def test_cache_refresh_net_non_cache_aware_kernels(sampler, params):
    """Kernels that change theta without knowing the cache must refresh it
    (core/state.refresh_target_cache) so a mixed composite stays correct."""
    target = _gp_target(n=20, d=2, s=4)
    step = SAMPLERS[sampler](target)
    states = init_chain_states(jax.random.key(2), target, 2,
                               jitter_scale=0.3, with_cache=True)
    out, _, _ = _run(step, states, params, 8)
    _assert_invariant(target, out)


def test_max_shrink_chol_caps_ell_probes():
    """A small Cholesky-coordinate shrink cap bounds n_probe_chol while the
    sigma coordinate keeps the full cap (cap-hit = exact no-op move)."""
    target = _gp_target()
    step = make_aux_slice(target, n_ess=1, n_sigma_extra=0)
    params = {"slice_theta": {"widths": jnp.full((target.d,), 1.5),
                              "max_step_out": 0, "max_shrink_chol": 1},
              "ess_u": {}}
    states = init_chain_states(jax.random.key(3), target, 4,
                               jitter_scale=0.3, with_cache=True)
    out, recs, infos = _run(step, states, params, 12)
    # ell coords: <= 1 shrink probe each per step (2 ell coords here)
    n_ell = target.d - 1
    assert float(np.max(np.asarray(infos["slice_theta/n_probe_chol"]))) <= n_ell
    _assert_invariant(target, out)
    assert np.isfinite(np.asarray(recs["theta"])).all()
