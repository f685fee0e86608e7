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


def timed(fn, *args, reps=1, warmup=1, **kw):
    """Returns (seconds_per_call, last_result)."""
    r = None
    for _ in range(warmup):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps, r


def cost_analysis(fn, *args, **kw):
    """Static cost analysis of the jitted ``fn`` at these args."""
    lowered = jax.jit(fn).lower(*args, **kw)
    return lowered.compile().cost_analysis()
