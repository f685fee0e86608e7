"""Tracing / profiling helpers.

SURVEY.md §5 "Tracing / profiling": the reference has only ad-hoc notebook
timing.  Here:

- ``trace(logdir)``: context manager around ``jax.profiler.trace`` for
  TensorBoard/Perfetto traces of benchmark windows.
- ``timed(fn, *args)``: wall-clock with ``block_until_ready`` (the only
  honest way to time async dispatch).  NOTE: on the tunneled single-chip
  dev environment, per-call timings under ~1s are dominated by relay
  noise — always amplify with ``reps`` until total wall is seconds.
- ``cost_analysis(fn, *args)``: XLA's static FLOP/byte estimates for a
  jitted callable (hot-kernel inspection).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir="/tmp/auxpm_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_sync(x):
    """Force device completion of everything that produced ``x``.

    ``jax.block_until_ready`` is UNRELIABLE on the tunneled ``axon``
    backend (measured 2026-08-19: it returns before the device finishes —
    10 serialized 9.5 ms kernels "blocked" in 0.4 ms total).  A host
    transfer of one element of each output buffer cannot lie: the runtime
    can only serve bytes of a buffer after the producing computation has
    completed, and device execution is in-order, so syncing on the last
    output awaits the whole queue.  Cost: one tunnel round-trip.
    """
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
    return x


def timed(fn, *args, reps=1, warmup=1, **kw):
    """Returns (seconds_per_call, last_result).

    Uses ``device_sync`` (host-transfer sync), not ``block_until_ready``
    — see ``device_sync``.  The async dispatch queue is in-order, so the
    single end sync covers all ``reps`` calls.
    """
    r = None
    for _ in range(warmup):
        r = fn(*args, **kw)
    device_sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args, **kw)
    device_sync(r)
    return (time.time() - t0) / reps, r


def cost_analysis(fn, *args, **kw):
    """Static cost analysis of the jitted ``fn`` at these args."""
    lowered = jax.jit(fn).lower(*args, **kw)
    return lowered.compile().cost_analysis()
