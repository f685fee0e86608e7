"""Benchmark: ESS/sec per chip on the GP-classification posterior.

BASELINE primary metric (BASELINE.json:2) on config 2 (Pima 532 pts,
auxiliary PM slice sampling, S=64 importance samples per step).

Protocol:
- TPU side: adapt slice widths over WARM_WINDOWS windows (not timed), then
  run ``CHAINS`` vmapped chains for ``STEPS`` steps of the aux-slice kernel
  in WARM_STEPS-sized compiled dispatches; wall time via device_sync (host-transfer sync);
  ESS computed over the timed samples only (Geyer estimator per dimension,
  combined over chains; min over dimensions).
- Kernel variant: BENCH_STEP_OUT=0 (default) uses Neal's shrinkage-only
  slice (exact, ~1.5-5x cheaper per step on the worst vmap lane);
  BENCH_STEP_OUT=8 is the classic stepping-out variant.  The CPU baseline
  runs the IDENTICAL variant so per-step ESS transfers.
- Baseline side: the reference repo publishes no numbers and the mount is
  empty (BASELINE.md), so the CPU reference is the in-repo pure-NumPy
  oracle (tests/oracle/, same algorithm, same dataset, same S, same widths,
  + the native C++ Gram kernel when built — the reference's Cython-kernel
  footing) run for a short timed stretch.  Because both sides run the
  identical kernel, the per-step ESS measured on the long TPU run
  transfers; CPU ESS/sec = per-step-ESS x oracle steps/sec.

Dispatch windows are kept short (~15s): the tunneled device kills ~60s
dispatches (measured 2026-08-18).

Env knobs: BENCH_CHAINS, BENCH_STEPS, BENCH_WARM (window size),
BENCH_WARM_WINDOWS, BENCH_STEP_OUT, BENCH_PROPOSAL (prior|laplace),
BENCH_S, BENCH_N_ESS (ESS u-update repeats per step; 4 measured optimal),
BENCH_ORACLE_STEPS.

Prints ONE JSON line:
  {"metric": "ess_per_sec_per_chip", "value": ..., "unit": "ESS/s",
   "vs_baseline": ...}
"""

import json
import os
import sys
import time

import numpy as np

# ensure repo root importable when invoked as `python bench.py` elsewhere
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

# persistent compilation cache: the aux-slice scan is a large program and
# the tunneled backend compiles remotely; caching saves minutes per run
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# 128 chains saturate the chip (measured: 642 chain-steps/s at 128 vs
# 545 at 256 — ESS/s is throughput/tau, so fewer-but-faster wins)
CHAINS = int(os.environ.get("BENCH_CHAINS", 128))
STEPS = int(os.environ.get("BENCH_STEPS", 1000))
WARM_STEPS = int(os.environ.get("BENCH_WARM", 25))
WARM_WINDOWS = int(os.environ.get("BENCH_WARM_WINDOWS", 6))
ORACLE_STEPS = int(os.environ.get("BENCH_ORACLE_STEPS", 15))
STEP_OUT = int(os.environ.get("BENCH_STEP_OUT", 0))
PROPOSAL = os.environ.get("BENCH_PROPOSAL", "prior")
S = int(os.environ.get("BENCH_S", 64))
N_ESS = int(os.environ.get("BENCH_N_ESS", 4))
WIDTH_SCALE = float(os.environ.get("BENCH_WIDTH_SCALE", 2.5))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    from auxpm_tpu.core.state import init_chain_states
    from auxpm_tpu.models.datasets import load
    from auxpm_tpu.models.gp_classification import make_gp_classification
    from auxpm_tpu.samplers.adaptation import adapt_params
    from auxpm_tpu.samplers.chain import run_chains
    from auxpm_tpu.samplers.composite import make_aux_slice
    from auxpm_tpu.utils.diagnostics import effective_sample_size

    log(f"devices: {jax.devices()}")
    log(f"chains={CHAINS} steps={STEPS} S={S} step_out={STEP_OUT} "
        f"proposal={PROPOSAL} n_ess={N_ESS}")
    x, y = load("pima")
    target = make_gp_classification(x, y, n_importance=S, proposal=PROPOSAL)
    step = make_aux_slice(target, n_ess=N_ESS)

    states = init_chain_states(jax.random.key(0), target, CHAINS, jitter_scale=0.3)
    # widths as a (d,) array from the start: adaptation returns an array, and
    # a scalar->array params change would retrigger compilation mid-benchmark
    # generous initial widths: the shrink-only variant needs the interval to
    # cover the slice from the first window (posterior stds here are ~0.1-0.3)
    params = {
        "slice_theta": {
            "widths": jnp.full((target.d,), 2.0, jnp.float32),
            "max_step_out": STEP_OUT,
        },
        "ess_u": {},
    }

    # adaptation windows (not timed): slice widths settle to WIDTH_SCALE x
    # the posterior std — the probe count per step (the dominant cost: every
    # probe is a Gram+Cholesky) drops with converged widths; the first
    # windows also burn in the overdispersed inits so the timed stretch is
    # stationary (short-window ESS otherwise measures burn-in, not mixing).
    from auxpm_tpu.utils.profiling import device_sync

    t0 = time.time()
    for w in range(WARM_WINDOWS):
        states, recs, infos = run_chains(step, states, params, WARM_STEPS)
        device_sync(states.theta)
        params = adapt_params(params, recs, infos, width_scale=WIDTH_SCALE)
        params["slice_theta"]["max_step_out"] = STEP_OUT  # adapt_params keeps it
        np_probe = np.asarray(infos["slice_theta/n_probe"])
        log(
            f"warmup window {w}: cum {time.time()-t0:.1f}s; widths -> "
            f"{np.asarray(params['slice_theta']['widths'])}; probes "
            f"mean {np_probe.mean():.1f} max {np_probe.max():.0f}"
        )

    # timed run in WARM_STEPS-sized chunks (a single very long dispatch can
    # trip the tunneled device's watchdog; chunking also matches how the
    # windowed production runner dispatches) — same compiled executable.
    n_chunks = max(STEPS // WARM_STEPS, 1)
    thetas, infos_list = [], []
    t0 = time.time()
    for ci in range(n_chunks):
        states, recs, infos = run_chains(step, states, params, WARM_STEPS)
        thetas.append(recs["theta"])
        infos_list.append(infos)
        # device_sync, NOT block_until_ready: the latter returns early on
        # the tunneled axon backend (see utils/profiling.device_sync) and
        # would silently measure dispatch time instead of compute time.
        device_sync(recs["theta"])
        if ci % 8 == 0:
            log(f"chunk {ci}/{n_chunks}: cum {time.time()-t0:.1f}s")
    wall = time.time() - t0

    theta = np.concatenate([np.asarray(t) for t in thetas], axis=1)
    n_probe = np.concatenate(
        [np.asarray(i["slice_theta/n_probe"]) for i in infos_list], axis=1
    )
    steps_done = theta.shape[1]
    ess = effective_sample_size(theta)  # (d,) combined over chains
    ess_min = float(np.min(ess))
    ess_per_sec = ess_min / wall
    per_step_ess = ess_min / (CHAINS * steps_done)
    steps_per_sec_tpu = CHAINS * steps_done / wall
    log(
        f"TPU: {wall:.2f}s for {CHAINS}x{steps_done} steps; ESS {np.round(ess,1)}; "
        f"{ess_per_sec:.2f} ESS/s; {steps_per_sec_tpu:.0f} chain-steps/s; "
        f"probes/step mean {n_probe.mean():.1f} max {n_probe.max():.0f}"
    )

    # ---- CPU oracle baseline (identical kernel variant) ----
    from tests.oracle.np_gp import NumpyGPTarget
    from tests.oracle.oracle import (
        NumpyDraws,
        OracleState,
        ess_update_u,
        slice_update_theta,
    )

    oracle = NumpyGPTarget(x, y, n_importance=S)
    log(f"oracle native gram: {oracle.use_native}")
    rng = np.random.default_rng(0)
    widths = np.asarray(params["slice_theta"]["widths"], np.float64)
    st = OracleState(np.zeros(2), rng.standard_normal(oracle.u_shape), 0.0)
    st.log_lik_hat = oracle.log_lik_est(st.theta, st.u)
    draws = NumpyDraws(rng)
    # warm (not timed): 2 steps.  The oracle runs the IDENTICAL kernel:
    # N_ESS elliptical-slice u-updates then the slice theta-update.
    for _ in range(2):
        for _ in range(N_ESS):
            st, _ = ess_update_u(st, oracle, draws)
        st, _ = slice_update_theta(st, oracle, widths, draws,
                                   max_step_out=STEP_OUT)
    t0 = time.time()
    for _ in range(ORACLE_STEPS):
        for _ in range(N_ESS):
            st, _ = ess_update_u(st, oracle, draws)
        st, _ = slice_update_theta(st, oracle, widths, draws,
                                   max_step_out=STEP_OUT)
    wall_cpu = time.time() - t0
    steps_per_sec_cpu = ORACLE_STEPS / wall_cpu
    ess_per_sec_cpu = per_step_ess * steps_per_sec_cpu
    log(
        f"CPU oracle: {wall_cpu:.2f}s for {ORACLE_STEPS} steps; "
        f"{steps_per_sec_cpu:.2f} steps/s -> {ess_per_sec_cpu:.2f} ESS/s"
    )

    vs = ess_per_sec / max(ess_per_sec_cpu, 1e-12)
    print(
        json.dumps(
            {
                "metric": "ess_per_sec_per_chip",
                "value": round(ess_per_sec, 2),
                "unit": "ESS/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
