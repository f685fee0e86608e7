"""Systematic resampling — single-device and distributed.

BASELINE.json:11: "SMC with 1M particles ... distributed resampling".
Systematic resampling (one uniform, N evenly-spaced positions through the
weight CDF) is the lowest-variance standard scheme and — crucially for a
distributed setting — is a *deterministic function of (weights, one shared
uniform)*, which makes the sharded version exactly equal to the
single-device one (tested in tests/test_smc.py).

Distributed scheme (SURVEY.md §2.3 "Distributed resampling"): inside
``shard_map`` over a ``particles`` mesh axis,

1. each shard computes the sum of its local (unnormalised) weights;
2. an ``all_gather`` of the P shard sums gives every shard the global
   normaliser and its own prefix offset — the only collective needed to
   place the local CDF inside the global one;
3. every shard computes its OWN output slots' global positions
   (u + k)/N for k in its contiguous slot range and inverts the global
   CDF against gathered per-shard cumulative boundaries + a local
   searchsorted;
4. source particles are fetched with one ``all_gather`` of the (small)
   particle payload — theta and log-lik only; O(N (d+1)) bytes, 12 MB at
   1M particles, far below the all-to-all alternative's bookkeeping.
   (Huge-N SMC avoids transporting u entirely: the carry_u=False mode in
   samplers/smc_sharded.py stores u as its generating PRNG key, so the
   payload stays O(N (d+5)) words even at 1M GP particles.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def systematic_resample_indices(log_w, u01):
    """Single-device systematic resampling.

    Args:
      log_w: (n,) unnormalised log-weights.
      u01: scalar uniform in [0, 1).
    Returns:
      (n,) int32 source indices, non-decreasing.
    """
    n = log_w.shape[0]
    w = jnp.exp(log_w - jnp.max(log_w))
    cdf = jnp.cumsum(w)
    total = cdf[-1]
    pos = (u01 + jnp.arange(n, dtype=log_w.dtype)) / n * total
    return jnp.clip(
        jnp.searchsorted(cdf, pos, side="left"), 0, n - 1
    ).astype(jnp.int32)


def distributed_systematic_resample_indices(log_w_local, u01, axis_name):
    """Sharded systematic resampling: returns GLOBAL source indices for this
    shard's output slots.  Exactly equals the single-device result on the
    concatenated weights (same u01).

    Must run inside shard_map; log_w_local is this shard's (n_local,) block,
    shards ordered by axis index.
    """
    n_local = log_w_local.shape[0]
    p = jax.lax.psum(1, axis_name)
    r = jax.lax.axis_index(axis_name)
    n_global = n_local * p

    # global max for a shared stable exponent
    m = jax.lax.pmax(jnp.max(log_w_local), axis_name)
    w = jnp.exp(log_w_local - m)
    local_cum = jnp.cumsum(w)
    local_sum = local_cum[-1]

    sums = jax.lax.all_gather(local_sum, axis_name)  # (P,)
    total = jnp.sum(sums)

    # this shard's output slots: global ks in [r*n_local, (r+1)*n_local)
    k = r * n_local + jnp.arange(n_local, dtype=log_w_local.dtype)
    pos = (u01 + k) / n_global * total

    # reconstruct the global CDF from gathered per-shard local cumsums
    # (N_global floats per device — 4 MB at 1M particles) and invert once.
    shard_offset = jnp.cumsum(sums) - sums  # exclusive prefix sums
    all_cum = jax.lax.all_gather(local_cum, axis_name)  # (P, n_local)
    global_cum = (all_cum + shard_offset[:, None]).reshape(-1)
    return jnp.clip(
        jnp.searchsorted(global_cum, pos, side="left"), 0, n_global - 1
    ).astype(jnp.int32)


def gather_resampled(tree_local, global_idx, axis_name):
    """Fetch source particles by GLOBAL index via all_gather of the payload.

    tree_local: pytree of (n_local, ...) arrays (theta, log_lik — small).
    Returns the resampled local pytree.
    """

    def fetch(x_local):
        x_all = jax.lax.all_gather(x_local, axis_name)  # (P, n_local, ...)
        x_flat = x_all.reshape((-1,) + x_all.shape[2:])
        return x_flat[global_idx]

    return jax.tree.map(fetch, tree_local)
