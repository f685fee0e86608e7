"""Debug / sanitizer modes — the TPU analog of race detectors (SURVEY.md §5).

XLA collectives are compiler-scheduled and deterministic, so there are no
data races to detect; the failure modes that play the same role here are
NaNs/Infs escaping a kernel, out-of-bounds gathers, and mis-sharded
reductions.  Mechanisms:

- ``checked_step(step)``: wraps a transition with in-graph finiteness
  checks on the returned state; the wrapped step's info dict carries an
  ``error_flags`` bitmask per chain (0 = clean) that survives jit/vmap/scan
  and is summed into windowed metrics.  (``jax.experimental.checkify``
  cannot functionalize this framework's bounded ``lax.while_loop`` kernels
  in jax 0.9 — its loop rewrite trips on closed-over tracers — so the
  checks are explicit instead, which also keeps them free of the checkify
  error-state plumbing overhead.)
- ``assert_finite_state(state)``: host-side post-window pytree check (cheap,
  call between windows, works on sharded arrays).
- mis-sharded reductions are caught by the mesh-shape invariance tests
  (tests/test_distributed.py) — the moral equivalent of a race here.

For interactive debugging there are also the global switches
``jax.config.update("jax_debug_nans", True)`` / ``jax_debug_infs`` which
re-run failing primitives eagerly; they are process-wide, so keep them out
of production configs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# error_flags bit assignments
ERR_LOGLIK_NONFINITE = 1
ERR_THETA_NONFINITE = 2
ERR_U_NONFINITE = 4


def checked_step(step):
    """Wrap ``step(state, params) -> (state, info)`` with finiteness checks.

    The returned step adds ``info["error_flags"]`` (int32 bitmask, see
    module constants).  Composable under jit/vmap/scan; zero host syncs.
    """

    def wrapped(state, params):
        new_state, info = step(state, params)
        flags = jnp.int32(0)
        flags += jnp.where(
            jnp.isfinite(new_state.log_lik_hat), 0, ERR_LOGLIK_NONFINITE
        ).astype(jnp.int32)
        flags += jnp.where(
            jnp.all(jnp.isfinite(new_state.theta)), 0, ERR_THETA_NONFINITE
        ).astype(jnp.int32)
        flags += jnp.where(
            jnp.all(jnp.isfinite(new_state.u)), 0, ERR_U_NONFINITE
        ).astype(jnp.int32)
        info = dict(info)
        info["error_flags"] = flags
        return new_state, info

    return wrapped


def throw_on_errors(info):
    """Host-side: raise if any chain/step accumulated error flags."""
    flags = jnp.asarray(info.get("error_flags", 0))
    total = int(jnp.sum(flags))
    if total:
        raise FloatingPointError(
            f"transition produced non-finite values (summed error_flags="
            f"{total}; bits: 1=log_lik 2=theta 4=u)"
        )


def assert_finite_state(state):
    """Host-side finiteness check over every inexact leaf of the state."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.inexact):
            if not bool(jnp.isfinite(arr).all()):
                name = jax.tree_util.keystr(path)
                raise FloatingPointError(f"non-finite values in state{name}")
