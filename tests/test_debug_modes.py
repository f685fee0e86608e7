"""Debug/sanitizer utilities (utils/debug.py) — SURVEY.md §5 analog of TSan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.gaussian_toy import make_gaussian_toy
from auxpm_tpu.samplers.composite import make_aux_slice
from auxpm_tpu.utils.debug import (
    assert_finite_state,
    checked_step,
    throw_on_errors,
)

PARAMS = {"slice_theta": {"widths": 1.0}}


def test_checked_step_clean_run():
    target = make_gaussian_toy(n_importance=8)
    step = checked_step(make_aux_slice(target))
    states = init_chain_states(jax.random.key(0), target, 4)
    new_states, info = jax.jit(jax.vmap(lambda s: step(s, PARAMS)))(states)
    throw_on_errors(info)  # no error on a healthy kernel
    assert np.isfinite(np.asarray(new_states.theta)).all()
    assert np.all(np.asarray(info["error_flags"]) == 0)


def test_checked_step_catches_nan():
    target = make_gaussian_toy(n_importance=8)
    step = checked_step(make_aux_slice(target))
    states = init_chain_states(jax.random.key(0), target, 4)
    # poison the cached estimate -> log_y = nan -> slice never accepts and
    # the carried log_lik_hat stays non-finite
    states = states.replace(
        log_lik_hat=jnp.full_like(states.log_lik_hat, jnp.nan)
    )
    _, info = jax.jit(jax.vmap(lambda s: step(s, PARAMS)))(states)
    with pytest.raises(FloatingPointError):
        throw_on_errors(info)


def test_assert_finite_state():
    target = make_gaussian_toy(n_importance=8)
    states = init_chain_states(jax.random.key(0), target, 4)
    assert_finite_state(states)  # clean
    bad = states.replace(theta=states.theta.at[0, 0].set(jnp.inf))
    with pytest.raises(FloatingPointError):
        assert_finite_state(bad)
