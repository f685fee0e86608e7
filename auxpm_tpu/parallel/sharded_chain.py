"""Mesh-sharded chain execution.

BASELINE.json:10 (config 4): "4096 vectorized chains on GP posterior, chains
sharded across hosts, global step-size/bracket adaptation via psum".

Two modes over a ('chains', 'particles') mesh:

- **DP only** (``shard_particles=False``): chains sharded over ALL devices;
  the jitted scan runs under ``shard_map`` with every per-chain leaf split
  on the chains axis.  Chains never communicate, so the compiled program
  contains zero collectives — scaling is embarrassing by construction, and
  the samples are bitwise-identical to the single-device run (tested:
  mesh-shape invariance, SURVEY.md §4.6).

- **DP + TP** (``shard_particles=True``): additionally, each chain's u
  block (S, n) is split over the particles axis.  The transition must have
  been built with ``particle_axis='particles'`` against a
  ``shard_target_particles``-wrapped target; estimator reductions become
  pmax/psum collectives inside the loop (see particle_shard.py).

Everything — the n_steps scan included — lives inside one ``shard_map`` so
steps never leave the device; the host sees only the final state and the
thinned records.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from auxpm_tpu.core.state import ChainState
from auxpm_tpu.samplers.chain import _scan_chain


def state_pspec(shard_particles=False, extras=None):
    """PartitionSpec pytree for a batched ChainState.

    ``extras`` mirrors the state's extras dict (per-chain quantities, e.g.
    the in-scan dual-averaging fields from samplers/adaptation.py or the
    carried chol_r factor) — every LEAF (extras may nest, e.g.
    ``extras["target_cache"]["chol_r"]``) shards over 'chains'.
    """
    pu = P("chains", "particles") if shard_particles else P("chains")
    return ChainState(
        theta=P("chains"),
        u=pu,
        log_lik_hat=P("chains"),
        key=P("chains"),
        extras=jax.tree.map(lambda _: P("chains"), extras or {}),
    )


def shard_states(states, mesh, shard_particles=False):
    """Place a batched ChainState according to the mesh."""
    spec = state_pspec(shard_particles, states.extras)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        states,
        spec,
        is_leaf=lambda x: isinstance(x, P),
    )


@partial(
    jax.jit,
    static_argnames=("transition", "n_steps", "thin", "mesh", "shard_particles",
                     "static_params"),
)
def _run_chains_sharded_jit(
    transition,
    states: ChainState,
    params: dict,
    n_steps: int,
    mesh,
    thin: int,
    shard_particles: bool,
    static_params: tuple,
):
    from auxpm_tpu.samplers.chain import merge_static_params

    params = merge_static_params(static_params, params)
    spec = state_pspec(shard_particles, states.extras)
    rec_spec = {"theta": P("chains"), "log_lik_hat": P("chains")}
    info_spec = P("chains")

    def local(states_local):
        def per_chain(s):
            return _scan_chain(
                transition, s, params, n_steps, thin, record_u=False
            )
        return jax.vmap(per_chain)(states_local)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, rec_spec, info_spec),
        check_vma=False,
    )
    return f(states)


def run_chains_sharded(
    transition,
    states: ChainState,
    params: dict,
    n_steps: int,
    mesh,
    thin: int = 1,
    shard_particles: bool = False,
):
    """Sharded analogue of ``samplers.chain.run_chains`` (no u recording).

    Structural loop caps in ``params`` (Python ints under
    samplers.chain._STATIC_PARAM_KEYS) are passed statically, exactly as in
    ``run_chains`` — a traced cap would compile dead loop bodies and defeat
    the fused-sweep `== 0` gates.
    """
    from auxpm_tpu.samplers.chain import split_static_params

    if n_steps % thin:
        raise ValueError(f"n_steps={n_steps} not divisible by thin={thin}")
    static, dynamic = split_static_params(params)
    return _run_chains_sharded_jit(
        transition, states, dynamic, n_steps, mesh, thin, shard_particles,
        static,
    )
