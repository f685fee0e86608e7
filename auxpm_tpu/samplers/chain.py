"""Chain driver: jitted lax.scan over steps, vmapped over chains.

Replaces the reference's Python for-loop over iterations (SURVEY.md §3.1
``run_chain(theta0, u0, n_iter, rng)``).  TPU design: the *entire* loop is
one compiled program — `lax.scan` of the composed transition, `vmap` over a
leading chains axis — so steps never round-trip to the host.  Thinning is
static so recorded output has static shape.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import ChainState


def _scan_chain(transition, state, params, n_steps, thin, record_u):
    """Scan a single chain; returns final state + recorded (thinned) history."""

    def one(state, _):
        state, info = transition(state, params)
        return state, info

    def block(state, _):
        # `thin` inner steps; record only the last state of the block.
        state, infos = jax.lax.scan(one, state, None, length=thin)
        info_mean = jax.tree.map(lambda x: jnp.mean(x, axis=0), infos)
        rec = {"theta": state.theta, "log_lik_hat": state.log_lik_hat}
        if record_u:
            rec["u"] = state.u
        return state, (rec, info_mean)

    n_out = n_steps // thin
    state, (recs, infos) = jax.lax.scan(block, state, None, length=n_out)
    return state, recs, infos


# Structural loop caps that must reach the transitions as STATIC Python
# ints: they size/gate compiled loops (a traced max_step_out=0 still
# compiles the whole step-out body — for the GP ell coordinate a dead
# 2-point-batched Gram+Cholesky+estimator subgraph — and a traced cap
# defeats the static `== 0` gates that select fused whole-sweep kernels).
# Values under these keys are extracted from ``params`` and closed over;
# changing one recompiles, exactly as a structural knob should.
_STATIC_PARAM_KEYS = ("max_step_out", "max_shrink", "max_shrink_chol")


def split_static_params(params):
    """-> (static, dynamic): static = hashable ((group, key), int) tuple."""
    static, dynamic = [], {}
    for g, sub in params.items():
        if isinstance(sub, dict):
            dsub = {}
            for k, v in sub.items():
                if k in _STATIC_PARAM_KEYS and isinstance(v, (int, bool)):
                    static.append(((g, k), int(v)))
                else:
                    dsub[k] = v
            dynamic[g] = dsub
        else:
            dynamic[g] = sub
    return tuple(static), dynamic


def merge_static_params(static, dynamic):
    params = {g: dict(sub) if isinstance(sub, dict) else sub
              for g, sub in dynamic.items()}
    for (g, k), v in static:
        params.setdefault(g, {})[k] = v
    return params


@partial(
    jax.jit,
    static_argnames=("transition", "n_steps", "thin", "record_u",
                     "static_params"),
)
def _run_chains_jit(
    transition,
    states: ChainState,
    params: dict,
    n_steps: int,
    thin: int,
    record_u: bool,
    static_params: tuple,
):
    params = merge_static_params(static_params, params)

    def per_chain(state):
        return _scan_chain(transition, state, params, n_steps, thin, record_u)

    return jax.vmap(per_chain)(states)


def run_chains(
    transition,
    states: ChainState,
    params: dict,
    n_steps: int,
    thin: int = 1,
    record_u: bool = False,
):
    """Run ``n_steps`` of ``transition`` on a batch of chains.

    Args:
      transition: per-chain ``(state, params) -> (state, info)``.
      states: batched ``ChainState`` (leading chains axis on every leaf).
      params: sampler hyperparameters, shared across chains (broadcast).
        Structural loop caps (``_STATIC_PARAM_KEYS``) given as Python ints
        are passed statically — see the note above.
      n_steps: total steps; must be divisible by ``thin``.
      thin: record every ``thin``-th state; per-step info is averaged within
        each thinning block (acceptance rates etc. stay interpretable).
      record_u: also record the auxiliary block (large — off by default).

    Returns:
      (final_states, records, infos) where records["theta"] has shape
      (chains, n_steps // thin, d) and each info leaf (chains, n_steps//thin).
    """
    if n_steps % thin:
        raise ValueError(f"n_steps={n_steps} not divisible by thin={thin}")
    static, dynamic = split_static_params(params)
    return _run_chains_jit(
        transition, states, dynamic, n_steps, thin, record_u, static
    )
