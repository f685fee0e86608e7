"""Fused estimator path (ops/fused_estimator.py) — CPU-side contracts.

The Pallas kernel itself needs a TPU (exercised by bench.py and the
on-device drive); what is testable on CPU and must hold everywhere:

- the jnp reference path equals the unfused logsumexp(log_weights_u)
  estimator bit-for-bit (same ops),
- the ESS update produces IDENTICAL chains whether the rotated-probe hook
  ``log_lik_est_rot`` is present or not (same PRNG keys, same bracket
  sequence — only the fusion differs),
- gradients flow through the custom_vjp wrapper.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.datasets import load
from auxpm_tpu.models.gp_classification import make_gp_classification
from auxpm_tpu.ops.logsumexp import logsumexp
from auxpm_tpu.samplers.ess_u import make_ess_u


def _target():
    x, y = load("pima", subsample=64)
    return make_gp_classification(x, y, n_importance=8, pad_to_tiles=True)


def test_fused_fallback_equals_unfused():
    t = _target()
    theta = jnp.asarray([0.1, 0.2], jnp.float32)
    u = jax.random.normal(jax.random.key(0), t.u_shape, jnp.float32)
    prep = t.prepare(theta)
    fused = float(t.log_lik_est_u(prep, u))
    unfused = float(
        logsumexp(t.log_weights_u(prep, u), axis=0) - np.log(t.u_shape[0])
    )
    assert abs(fused - unfused) < 1e-5

    # rotated probe equals rotate-then-estimate
    v = jax.random.normal(jax.random.key(1), t.u_shape, jnp.float32)
    a = jnp.float32(0.6)
    rot = float(t.log_lik_est_rot(prep, u, v, a))
    manual = float(t.log_lik_est_u(prep, u * jnp.cos(a) + v * jnp.sin(a)))
    assert abs(rot - manual) < 1e-5


def test_ess_update_identical_with_and_without_rot_hook():
    t = _target()
    t_plain = dataclasses.replace(t, log_lik_est_rot=None)
    states = init_chain_states(jax.random.key(2), t, 4, jitter_scale=0.2)

    s1, i1 = jax.vmap(lambda s: make_ess_u(t)(s, {}))(states)
    s2, i2 = jax.vmap(lambda s: make_ess_u(t_plain)(s, {}))(states)
    np.testing.assert_array_equal(np.asarray(s1.u), np.asarray(s2.u))
    np.testing.assert_allclose(
        np.asarray(s1.log_lik_hat), np.asarray(s2.log_lik_hat), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(i1["n_shrink"]), np.asarray(i2["n_shrink"])
    )


def test_gradients_flow_through_estimator():
    t = _target()
    u = jax.random.normal(jax.random.key(3), t.u_shape, jnp.float32)
    g = jax.grad(lambda th: t.log_lik_est(th, u))(
        jnp.asarray([0.0, 0.1], jnp.float32)
    )
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0
