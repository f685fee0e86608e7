"""Cross-device collective reductions.

The TPU-native "communication backend" (SURVEY.md §2.3, §5): XLA collectives
inside ``shard_map`` — deterministic, compiler-scheduled, riding ICI.  The
reference has no analogue (single process); BASELINE.json:5 names the
primitives directly ("log-sum-exp likelihood-estimate reductions ... via
jax.lax.psum/all_gather collectives").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psum_logsumexp(log_w_local, axis_name, axis=None):
    """Global log-sum-exp of log-weights sharded over ``axis_name``.

    Online-softmax trick (the ring/flash-attention reduction applied to
    importance weights, SURVEY.md §5 item 1): global max via ``pmax``, then
    psum of the max-shifted exponential sums.  Two small collectives instead
    of gathering the full weight vector.

    Args:
      log_w_local: this shard's log-weights; reduced over ``axis`` (local
        array axis, default: all) AND the mesh axis.
    """
    m_local = jnp.max(log_w_local, axis=axis, keepdims=axis is not None)
    m = jax.lax.pmax(m_local, axis_name)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s_local = jnp.sum(jnp.exp(log_w_local - m_safe), axis=axis, keepdims=axis is not None)
    s = jax.lax.psum(s_local, axis_name)
    out = jnp.log(s) + m_safe
    if axis is not None:
        out = jnp.squeeze(out, axis=axis)
    return out


def allgather_blocked_logsumexp(logw_local, n_blocks_local, axis_name):
    """Global blocked log-sum-exp, bitwise-equal to the unsharded
    ``ops.logsumexp.blocked_logsumexp`` at the same global block count.

    Each shard computes (max, shifted-sum) partials for its LOCAL contiguous
    blocks, all-gathers the tiny partial vectors (2 * n_blocks floats), and
    folds them sequentially in GLOBAL block order (shard-major == global
    order because blocks are contiguous per shard).  Unlike
    ``psum_logsumexp`` the combine has a fixed associativity, so the result
    is a deterministic function of the weights independent of the shard
    count — the TP bitwise-invariance contract (SURVEY.md §4.6).
    """
    from auxpm_tpu.ops.logsumexp import block_partials, combine_block_partials

    m, se = block_partials(logw_local, n_blocks_local)
    m_all = jax.lax.all_gather(m, axis_name)  # (k, nb_local) in axis order
    se_all = jax.lax.all_gather(se, axis_name)
    return combine_block_partials(m_all.reshape(-1), se_all.reshape(-1))


def pmean_tree(tree, axis_name):
    """Cross-shard mean of every leaf (adaptation statistics aggregation,
    BASELINE.json:10)."""
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), tree)
