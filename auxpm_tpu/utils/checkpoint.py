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


def _assemble_addressable(leaf) -> np.ndarray:
    """Copy a jax.Array's addressable shards into one host buffer using each
    shard's global ``.index`` slices.  Returns the bounding-box region
    [min_start, max_stop) per axis — the full array on a single process.

    Correct only when this process's (deduplicated) shards exactly TILE that
    bounding box — always true single-process and for rectangular
    per-process regions; a multi-host mesh whose device order scatters a
    process's shards non-contiguously would leave gaps, so coverage is
    VALIDATED before writing (advisor finding r3): the union of distinct
    shard boxes must cover out.size exactly, else we raise rather than
    silently checkpoint uninitialised memory."""
    shards = list(leaf.addressable_shards)
    gshape = leaf.shape
    ndim = len(gshape)
    starts = [
        min((s.index[a].start or 0) for s in shards) for a in range(ndim)
    ]
    stops = [
        max(
            (s.index[a].stop if s.index[a].stop is not None else gshape[a])
            for s in shards
        )
        for a in range(ndim)
    ]
    first = np.asarray(shards[0].data)
    out = np.empty([sp - st for st, sp in zip(starts, stops)], first.dtype)
    seen: set[tuple] = set()
    covered = 0
    for s in shards:
        sl = tuple(
            slice(
                (ix.start or 0) - st,
                (ix.stop if ix.stop is not None else g) - st,
            )
            for ix, st, g in zip(s.index, starts, gshape)
        )
        key = tuple((x.start, x.stop) for x in sl)
        if key not in seen:  # replicas repeat the same box; count once
            seen.add(key)
            covered += int(np.prod([x.stop - x.start for x in sl])) if ndim else 1
        out[sl] = np.asarray(s.data)
    if covered != out.size:
        raise ValueError(
            "checkpoint shards do not tile this process's bounding box "
            f"({covered} of {out.size} elements covered) — non-rectangular "
            "per-process shard layout; refusing to write a checkpoint with "
            "uninitialised gaps"
        )
    return out


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
        # Reassemble this process's addressable shards via their GLOBAL
        # index slices into one buffer spanning the addressable region.
        # Axis-0 concatenation is NOT enough: a DP x TP state (u sharded
        # over 'chains' AND 'particles') has shards tiling a 2-D grid, and
        # concatenating them along axis 0 silently interleaves blocks
        # (advisor finding r2).  For a single process the addressable
        # region is the full array; multi-host keeps the per-process-block
        # semantics as before (each file holds that host's region).
        if hasattr(leaf, "addressable_shards"):
            arrs[f"leaf{i}"] = _assemble_addressable(leaf)
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
