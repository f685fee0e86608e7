"""Composable transition protocol.

The reference composes updates ad hoc inside experiment loops (SURVEY.md
§3.1: per iteration, e.g. ``ess_update_u`` then ``slice_update_theta``).
Here a *transition* is any pure function

    transition(state: ChainState, params: dict) -> (ChainState, info: dict)

where ``params`` holds tunable hyperparameters (step sizes, slice widths —
kept outside the state so a global adaptation loop can rewrite them between
windows after a cross-chain ``psum``; BASELINE.json:10) and ``info`` holds
per-step diagnostics (acceptance indicators, shrink counts, ...).

Transitions close over the target.  Composition concatenates info dicts with
name prefixes.  All transitions are written per-chain; batching is always via
``jax.vmap`` at the driver level — inside-jit data parallelism over thousands
of chains is the framework's "DP" axis (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Callable, Sequence

from auxpm_tpu.core.state import ChainState

# A transition maps (state, params) -> (state, info).
Transition = Callable[[ChainState, dict], tuple[ChainState, dict]]


def compose(named_transitions: Sequence[tuple[str, Transition]]) -> Transition:
    """Sequential composition; info keys are prefixed with the stage name.

    ``params`` is expected to contain a sub-dict per stage name; stages see
    only their own sub-dict (missing -> {}).
    """

    stage_names = [name for name, _ in named_transitions]

    def composed(state: ChainState, params: dict):
        unknown = set(params) - set(stage_names)
        if unknown:
            # typo'd group names would otherwise be silently ignored and the
            # stage would run on defaults
            raise ValueError(
                f"unknown param group(s) {sorted(unknown)}; stages are "
                f"{stage_names}"
            )
        info_all = {}
        for name, t in named_transitions:
            state, info = t(state, params.get(name, {}))
            for k, v in info.items():
                info_all[f"{name}/{k}"] = v
        return state, info_all

    composed.stage_names = tuple(stage_names)
    return composed


def repeat(transition: Transition, n: int) -> Transition:
    """Apply a transition ``n`` times (static n; unrolled under jit via scan).

    Info from the last application is returned.
    """
    import jax

    def repeated(state: ChainState, params: dict):
        def body(s, _):
            s, info = transition(s, params)
            return s, info

        state, infos = jax.lax.scan(body, state, None, length=n)
        info_last = jax.tree.map(lambda x: x[-1], infos)
        return state, info_last

    return repeated
