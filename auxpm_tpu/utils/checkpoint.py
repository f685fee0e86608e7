"""Checkpoint / resume for sampler state.

SURVEY.md §5: multi-host JAX is gang-scheduled — a lost host kills the
program — so recovery is frequent checkpoints + restart.  MCMC state is tiny
(theta, u, PRNG key, params per chain), so checkpointing every K windows is
~free, and because the PRNG key is part of the state, a restarted run
continues BIT-FOR-BIT identically to the uninterrupted one (tested in
tests/test_distributed.py::test_checkpoint_resume_bitwise).

Format: one ``.npz`` per process (host) holding that host's addressable
shards of every leaf, plus the step index and a config hash that is checked
on load.  No external deps (Orbax would add async; unnecessary at this
state size).
"""

from __future__ import annotations

import hashlib
import json
import os

import jax
import numpy as np

from auxpm_tpu.core.state import ChainState


def _config_hash(config: dict) -> str:
    return hashlib.sha256(
        json.dumps(config, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def save_checkpoint(path, states: ChainState, step: int, config: dict | None = None,
                    params: dict | None = None):
    """Save this process's shards.  ``path`` is a directory."""
    os.makedirs(path, exist_ok=True)
    proc = jax.process_index()
    leaves, treedef = jax.tree.flatten(states)
    key_leaf_idx = [
        i
        for i, l in enumerate(leaves)
        if jax.dtypes.issubdtype(l.dtype, jax.dtypes.prng_key)
    ]
    arrs = {}
    for i, leaf in enumerate(leaves):
        if i in key_leaf_idx:
            leaf = jax.random.key_data(leaf)
        # addressable local shards, concatenated in GLOBAL INDEX order —
        # addressable_shards order is a device-placement detail, not the
        # array order, so sort by each shard's starting offset
        if hasattr(leaf, "addressable_shards"):
            srt = sorted(
                leaf.addressable_shards,
                key=lambda s: tuple(sl.start or 0 for sl in s.index),
            )
            shards = [np.asarray(s.data) for s in srt]
            arrs[f"leaf{i}"] = (
                np.concatenate(shards, axis=0) if len(shards) > 1 else shards[0]
            )
        else:
            arrs[f"leaf{i}"] = np.asarray(leaf)
    meta = {
        "step": step,
        "config_hash": _config_hash(config or {}),
        "key_leaves": key_leaf_idx,
        "params": params or {},
    }
    np.savez(
        os.path.join(path, f"shard_{proc}.npz"),
        __meta__=json.dumps(meta, default=lambda o: np.asarray(o).tolist()),
        **arrs,
    )


def load_checkpoint(path, example_states: ChainState, config: dict | None = None,
                    reshard: bool = True):
    """Load this process's shards; returns (states, step, params).

    ``example_states`` provides the treedef AND (with ``reshard=True``, the
    default) the target device placement: each loaded leaf is
    ``device_put`` with the example leaf's sharding, so a sharded runner
    resumes directly — including onto a DIFFERENT mesh shape than the one
    that wrote the checkpoint (the .npz holds globally-ordered host arrays;
    tested bitwise in tests/test_distributed.py).
    """
    proc = jax.process_index()
    ex_leaves, treedef = jax.tree.flatten(example_states)
    with np.load(os.path.join(path, f"shard_{proc}.npz"), allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        if config is not None and meta["config_hash"] != _config_hash(config):
            raise ValueError("checkpoint config hash mismatch")
        out = []
        for i, ex in enumerate(ex_leaves):
            arr = z[f"leaf{i}"]
            if i in meta["key_leaves"]:
                leaf = jax.random.wrap_key_data(jax.numpy.asarray(arr))
            else:
                leaf = jax.numpy.asarray(arr)
            if reshard and hasattr(ex, "sharding"):
                leaf = jax.device_put(leaf, ex.sharding)
            out.append(leaf)
        states = jax.tree.unflatten(treedef, out)
        return states, meta["step"], meta["params"]
