"""Bounded-masked-loop equivalence vs. the scalar NumPy oracle.

SURVEY.md §4.4: the vmapped/bounded ``lax.while_loop`` slice and ESS kernels
must produce *identical* samples to a scalar Python-loop oracle at the same
PRNG draws.  The draws are mirrored by replicating each JAX transition's
key-splitting discipline (documented in the respective sampler modules) and
feeding them to the oracle through a ``ScriptedDraws`` provider.

Run in float64 (toggled per-test) so agreement is tested to 1e-10, far below
any chance of a threshold-flip divergence.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auxpm_tpu.core.state import ChainState
from auxpm_tpu.models.gaussian_toy import make_gaussian_toy
from auxpm_tpu.samplers.ess_u import make_ess_u
from auxpm_tpu.samplers.pm_mh import make_pm_mh
from auxpm_tpu.samplers.slice_theta import make_slice_theta
from tests.oracle.oracle import (
    OracleState,
    ScriptedDraws,
    ess_update_u,
    pm_mh_step,
    slice_update_theta,
)


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@dataclasses.dataclass
class NpTarget:
    """NumPy view of a JAX target (evaluates on host in float64)."""

    jt: object

    def log_prior(self, theta):
        return float(self.jt.log_prior(jnp.asarray(theta)))

    def log_lik_est(self, theta, u):
        return float(self.jt.log_lik_est(jnp.asarray(theta), jnp.asarray(u)))


def _toy64():
    return make_gaussian_toy(n_importance=8, dtype=jnp.float64)


def _init_state(key, target):
    k_u, k_carry = jax.random.split(key)
    theta0 = jnp.asarray([0.4, -0.3], jnp.float64)
    u0 = jax.random.normal(k_u, target.u_shape, jnp.float64)
    return ChainState(
        theta=theta0,
        u=u0,
        log_lik_hat=target.log_lik_est(theta0, u0),
        key=k_carry,
    )


def _uniform(key):
    return float(jax.random.uniform(key, (), jnp.float64))


def test_pm_mh_matches_oracle(x64):
    target = _toy64()
    state = _init_state(jax.random.key(7), target)
    step = make_pm_mh(target)

    for _ in range(10):
        # mirror of pm_mh key discipline: key, k_prop, k_u, k_acc = split(key, 4)
        key, k_prop, k_u, k_acc = jax.random.split(state.key, 4)
        table = {
            "prop": np.asarray(jax.random.normal(k_prop, (2,), jnp.float64)),
            "u": np.asarray(jax.random.normal(k_u, target.u_shape, jnp.float64)),
            "acc": _uniform(k_acc),
        }
        o_state = OracleState(
            np.asarray(state.theta), np.asarray(state.u), float(state.log_lik_hat)
        )
        o_new, _ = pm_mh_step(
            o_state, NpTarget(target), 0.5, ScriptedDraws(table)
        )

        state, _ = step(state, {"step_size": 0.5})
        np.testing.assert_allclose(np.asarray(state.theta), o_new.theta, atol=1e-10)
        np.testing.assert_allclose(
            float(state.log_lik_hat), o_new.log_lik_hat, atol=1e-10
        )


def test_ess_u_matches_oracle(x64):
    target = _toy64()
    state = _init_state(jax.random.key(3), target)
    step = make_ess_u(target)

    for _ in range(10):
        # mirror of ess_u key discipline: key, k_v, k_h, k_loop = split(key, 4)
        key, k_v, k_h, k_loop = jax.random.split(state.key, 4)
        table = {
            "v": np.asarray(jax.random.normal(k_v, target.u_shape, jnp.float64)),
            "h": _uniform(k_h),
            "a0": _uniform(k_loop),
        }
        for i in range(32):
            table[f"shrink_{i}"] = _uniform(jax.random.fold_in(k_loop, i + 1))
        o_state = OracleState(
            np.asarray(state.theta), np.asarray(state.u), float(state.log_lik_hat)
        )
        o_new, _ = ess_update_u(o_state, NpTarget(target), ScriptedDraws(table))

        state, _ = step(state, {})
        np.testing.assert_allclose(np.asarray(state.u), o_new.u, atol=1e-10)
        np.testing.assert_allclose(
            float(state.log_lik_hat), o_new.log_lik_hat, atol=1e-10
        )


@pytest.mark.parametrize("max_step_out", [8, 0])
def test_slice_theta_matches_oracle(x64, max_step_out):
    # max_step_out=0 is Neal's shrinkage-only variant (slice_theta.py);
    # the oracle honors the same parameter, so equivalence covers both.
    target = _toy64()
    state = _init_state(jax.random.key(11), target)
    step = make_slice_theta(target)
    widths = 1.3 if max_step_out else 3.0

    for _ in range(10):
        # mirror: key, *coord_keys = split(key, d+1);
        # per coord: k_h, k_init, k_loop = split(coord_keys[i], 3);
        # shrink j uses fold_in(k_loop, j)
        key, *coord_keys = jax.random.split(state.key, target.d + 1)
        table = {}
        for i in range(target.d):
            k_h, k_init, k_loop = jax.random.split(coord_keys[i], 3)
            table[f"c{i}_h"] = _uniform(k_h)
            table[f"c{i}_init"] = _uniform(k_init)
            for j in range(32):
                table[f"c{i}_shrink_{j}"] = _uniform(jax.random.fold_in(k_loop, j))
        o_state = OracleState(
            np.asarray(state.theta), np.asarray(state.u), float(state.log_lik_hat)
        )
        o_new, _ = slice_update_theta(
            o_state, NpTarget(target), widths, ScriptedDraws(table),
            max_step_out=max_step_out,
        )

        state, _ = step(state, {"widths": widths, "max_step_out": max_step_out})
        np.testing.assert_allclose(np.asarray(state.theta), o_new.theta, atol=1e-10)
        np.testing.assert_allclose(
            float(state.log_lik_hat), o_new.log_lik_hat, atol=1e-10
        )
