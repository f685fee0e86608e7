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

Statistical rigor (VERDICT r1 item 7): the whole protocol repeats over
``BENCH_SEEDS`` (default 3) independent seeds — fresh overdispersed inits,
fresh warmup — and the headline is the across-seed mean with the spread
reported, so the Geyer-estimator variance at finite chain length is
quantified instead of hidden.  The JSON also carries MFU (XLA
cost_analysis FLOPs / wall against the v5e bf16 peak) so perf claims are
auditable.

Env knobs: BENCH_CHAINS, BENCH_STEPS (per seed), BENCH_SEEDS, BENCH_WARM
(window size), BENCH_WARM_WINDOWS, BENCH_STEP_OUT, BENCH_PROPOSAL
(prior|laplace), BENCH_S, BENCH_N_ESS (ESS u-update repeats per step; 4
measured optimal), BENCH_ORACLE_STEPS.

Prints ONE JSON line:
  {"metric": "ess_per_sec_per_chip", "value": ..., "unit": "ESS/s",
   "vs_baseline": ..., "seeds": ..., "value_std": ...,
   "model_tflops_per_sec": ..., "mfu_vs_bf16_peak": ...,
   "protocol": "geyer-min-dim", "steps": ..., "chains": ...,
   "compile_wall": ..., "partial": false}

Timeout robustness: the aggregate is rebuilt after EVERY completed seed and
a SIGTERM/SIGINT handler (+ atexit) prints the latest aggregate with
"partial": true if the driver kills the run before all seeds finish — a
timed-out run still yields a parseable artifact (VERDICT r4 item 1a).
"""

import atexit
import json
import os
import signal
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
WHITEN = os.environ.get("BENCH_WHITEN", "float32")  # float32 | bfloat16
# 1 measured optimal (r4 sweep, BASELINE.md): the Cholesky-free extra
# log_sigma slice update buys ~+9% ESS/s at 0->1; 2 and 4 give it back
# (2.75 / 3.00 / 2.80 / 2.40 at 0/1/2/4, single-seed, 2026-08-20)
SIGMA_EXTRA = int(os.environ.get("BENCH_SIGMA_EXTRA", 1))
# carried chol_r cache (r5): the ESS prepare and the sigma factory reuse
# the factor the accepted ell-probe computed instead of refactorising —
# bitwise-identical trajectory (tests/test_cache.py), ~2 fewer O(n^3)
# factorisations per step.  BENCH_CACHE=0 disables for A/B.
CACHE = os.environ.get("BENCH_CACHE", "1") != "0"
# shrink cap for the Cholesky-paying ell coordinate (see
# samplers/slice_theta.py max_shrink_chol): under vmap the loop depth is
# the WORST lane's shrink count; a small cap bounds it exactly (cap-hit =
# exact no-op move).  Measured (r5, sigma sweep engaged): cap 3 ->
# 6.36 +- 0.14 ESS/s over 3 seeds (2800 chain-steps/s; min-dim ESS did not
# degrade vs cap 6: 282.9 vs 272.9 same-seed); cap 4 -> 3.98; cap 6 ->
# 4.04 (1-seed legs).  Adopted default: 3.  32 = off.
MAX_SHRINK_CHOL = int(os.environ.get("BENCH_MAX_SHRINK_CHOL", 3))
WIDTH_SCALE = float(os.environ.get("BENCH_WIDTH_SCALE", 2.5))
SEEDS = int(os.environ.get("BENCH_SEEDS", 3))
V5E_BF16_PEAK = 197e12  # per-chip bf16 peak; MFU denominator (f32 work
                        # on the 6-pass MXU path can at most reach ~1/8)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Timeout robustness (VERDICT r4 item 1a): BENCH_r04.json was rc=124 /
# parsed=null because the JSON printed only at the very end — a driver
# timeout after 2/3 seeds finished yielded NOTHING machine-readable.  Now an
# aggregate over the seeds completed SO FAR is (re)built after every seed
# (including the CPU-oracle side, so vs_baseline is present from seed 0 on)
# and a SIGTERM/SIGINT handler + atexit hook emit it on stdout if the
# process is killed before the normal final print.  The emitted line carries
# "partial": true and "seeds" = the completed count, so a truncated run is
# still an honest, parseable artifact.
# ---------------------------------------------------------------------------
_LATEST = {"out": None, "printed": False}


def _emit_latest():
    out = _LATEST["out"]
    if out is not None and not _LATEST["printed"]:
        _LATEST["printed"] = True
        print(json.dumps(out), flush=True)


def _term_handler(signum, frame):  # pragma: no cover - exercised by driver
    log(f"bench: caught signal {signum}; emitting partial aggregate")
    _emit_latest()
    # plain exit so the driver records rc=0 alongside the parseable line
    os._exit(0)


signal.signal(signal.SIGTERM, _term_handler)
signal.signal(signal.SIGINT, _term_handler)
atexit.register(_emit_latest)


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
        f"proposal={PROPOSAL} n_ess={N_ESS} whiten={WHITEN}")
    x, y = load("pima")
    target = make_gp_classification(
        x, y, n_importance=S, proposal=PROPOSAL, whiten_dtype=WHITEN
    )
    step = make_aux_slice(target, n_ess=N_ESS, n_sigma_extra=SIGMA_EXTRA)

    from auxpm_tpu.utils.profiling import device_sync

    def run_one_seed(seed):
        """Warmup (adaptation, untimed) + timed stretch for one seed."""
        states = init_chain_states(
            jax.random.key(seed), target, CHAINS, jitter_scale=0.3,
            with_cache=CACHE,
        )
        # widths as a (d,) array from the start: adaptation returns an
        # array, and a scalar->array params change would retrigger
        # compilation mid-benchmark.  Generous initial widths: the
        # shrink-only variant needs the interval to cover the slice from
        # the first window (posterior stds here are ~0.1-0.3).
        params = {
            "slice_theta": {
                "widths": jnp.full((target.d,), 2.0, jnp.float32),
                "max_step_out": STEP_OUT,
                "max_shrink_chol": MAX_SHRINK_CHOL,
            },
            "ess_u": {},
        }

        # adaptation windows (not timed): slice widths settle to
        # WIDTH_SCALE x the posterior std — the probe count per step (the
        # dominant cost: every probe is a Gram+Cholesky) drops with
        # converged widths; the first windows also burn in the
        # overdispersed inits so the timed stretch is stationary.
        t0 = time.time()
        for w in range(WARM_WINDOWS):
            states, recs, infos = run_chains(step, states, params, WARM_STEPS)
            device_sync(states.theta)
            if w == 0 and seed == 0:
                # first window of seed 0 pays the whole compile (tunneled
                # backend; subsequent windows/seeds reuse the executable) —
                # recorded so the cold-start cost is tracked per round
                compile_wall["value"] = time.time() - t0
                log(f"[seed 0] first window (compile) {compile_wall['value']:.1f}s")
            params = adapt_params(params, recs, infos, width_scale=WIDTH_SCALE)
            params["slice_theta"]["max_step_out"] = STEP_OUT
        np_probe = np.asarray(infos["slice_theta/n_probe"])
        log(
            f"[seed {seed}] warmup {time.time()-t0:.1f}s; widths "
            f"{np.asarray(params['slice_theta']['widths'])}; probes "
            f"mean {np_probe.mean():.1f} max {np_probe.max():.0f}"
        )
        probe_stats["slice"].append(float(np_probe.mean()))
        probe_stats["chol"].append(
            float(np.asarray(infos["slice_theta/n_probe_chol"]).mean())
        )
        probe_stats["ess"].append(
            float(np.asarray(infos["ess_u/n_shrink"]).mean())
        )

        # timed run in WARM_STEPS-sized chunks (a single very long dispatch
        # can trip the tunneled device's watchdog) — same compiled
        # executable.  device_sync, NOT block_until_ready: the latter
        # returns early on the tunneled axon backend (see
        # utils/profiling.device_sync) and would silently measure dispatch
        # time instead of compute time.
        n_chunks = max(STEPS // WARM_STEPS, 1)
        thetas = []
        t0 = time.time()
        for ci in range(n_chunks):
            states, recs, infos = run_chains(step, states, params, WARM_STEPS)
            thetas.append(recs["theta"])
            device_sync(recs["theta"])
        wall = time.time() - t0

        theta = np.concatenate([np.asarray(t) for t in thetas], axis=1)
        steps_done = theta.shape[1]
        ess = effective_sample_size(theta)  # (d,) combined over chains
        ess_min = float(np.min(ess))
        log(
            f"[seed {seed}] {wall:.2f}s for {CHAINS}x{steps_done} steps; "
            f"ESS {np.round(ess, 1)}; {ess_min / wall:.2f} ESS/s; "
            f"{CHAINS * steps_done / wall:.0f} chain-steps/s"
        )
        return ess_min, wall, steps_done, np.asarray(
            params["slice_theta"]["widths"], np.float64
        )

    def measure_oracle(widths):
        """CPU oracle baseline (identical kernel variant), 3 timed repeats.

        Widths: adapted widths from the TPU protocol, averaged across the
        COMPLETED seeds (advisor findings r2+r3: hard-coded widths silently
        mistune the oracle; a single seed's widths let one unlucky warmup
        mistune all oracle repeats, understating the vs_baseline error bar).
        3 independent repeats (VERDICT r2 item 9): the short stretch swings
        ~+-15% on BLAS noise, so vs_baseline carries an error bar.
        """
        from tests.oracle.np_gp import NumpyGPTarget
        from tests.oracle.oracle import (
            NumpyDraws,
            OracleState,
            ess_update_u,
            slice_update_theta,
        )

        oracle = NumpyGPTarget(x, y, n_importance=S)
        log(f"oracle native gram: {oracle.use_native}")
        cpu_rates = []
        for rep in range(3):
            rng = np.random.default_rng(rep)
            st = OracleState(
                np.zeros(2), rng.standard_normal(oracle.u_shape), 0.0
            )
            st.log_lik_hat = oracle.log_lik_est(st.theta, st.u)
            draws = NumpyDraws(rng)
            # warm (not timed): 2 steps.  The oracle runs the IDENTICAL
            # kernel: N_ESS elliptical-slice u-updates then the slice
            # theta-update.
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
            cpu_rates.append(ORACLE_STEPS / wall_cpu)
        cpu_rates = np.asarray(cpu_rates)
        log(
            f"CPU oracle: {cpu_rates.mean():.2f} +- "
            f"{cpu_rates.std(ddof=1):.2f} steps/s over 3 reps "
            f"(widths {widths.round(3)})"
        )
        return float(cpu_rates.mean()), float(cpu_rates.std(ddof=1))

    def build_aggregate(per_seed, oracle_rate, partial):
        """Aggregate JSON over the seeds completed so far."""
        n_done = len(per_seed)
        ess_rates = np.asarray([e / w for e, w, _, _ in per_seed])
        ess_per_sec = float(ess_rates.mean())
        ess_std = float(ess_rates.std(ddof=1)) if n_done > 1 else 0.0
        wall = sum(w for _, w, _, _ in per_seed)
        total_chain_steps = CHAINS * sum(sd for _, _, sd, _ in per_seed)
        per_step_ess = sum(e for e, _, _, _ in per_seed) / total_chain_steps
        steps_per_sec_tpu = total_chain_steps / wall
        log(
            f"TPU aggregate: {ess_per_sec:.2f} +- {ess_std:.2f} ESS/s over "
            f"{n_done} seeds; {steps_per_sec_tpu:.0f} chain-steps/s"
        )

        # MFU from an analytic per-step FLOP model at the MEASURED mean
        # probe counts.  (XLA's cost_analysis counts while_loop bodies once,
        # so its static figure is a meaningless lower bound for this
        # workload.)  Per chain-step: the Cholesky count is p_chol (each
        # ell-coordinate probe; the MEASURED mean of
        # slice_theta/n_probe_chol) plus the per-sweep extras — with the
        # carried-factor cache ONE more (the once-per-sweep cache refresh
        # at the post-ell theta; the ESS prepare and sigma probes reuse
        # it), without it TWO (ESS prepare + sigma-factory chol_r) — at
        # n^3/3 + the Gram build at ~4 n^2, and every
        # estimator probe — N_ESS ESS probes of (1 + shrinks) plus all
        # slice probes — pays the 2 S n^2 whiten matmul.  This counts useful
        # model FLOPs actually computed, not the masked-lane waste, so it is
        # the honest MFU numerator.
        n_pad = target.u_shape[1]
        p_slice = float(np.mean(probe_stats["slice"]))
        p_chol = float(np.mean(probe_stats["chol"]))
        p_ess = float(np.mean(probe_stats["ess"]))
        chol_flops = n_pad**3 / 3 + 4.0 * n_pad**2
        est_flops = 2.0 * S * n_pad**2
        n_extra_chol = 1.0 if CACHE else 2.0
        flops_per_chain_step = (n_extra_chol + p_chol) * chol_flops + (
            N_ESS * (1.0 + p_ess) + p_slice
        ) * est_flops
        model_tflops = flops_per_chain_step * steps_per_sec_tpu / 1e12
        mfu = model_tflops * 1e12 / V5E_BF16_PEAK
        log(
            f"MFU: {model_tflops:.3f} model TFLOP/s (analytic, p_slice="
            f"{p_slice:.1f}, p_chol={p_chol:.1f}, p_ess={p_ess:.1f}) = "
            f"{100 * mfu:.2f}% of bf16 peak (f32 path: ceiling ~12.5%)"
        )

        steps_per_sec_cpu, cpu_rate_std = oracle_rate
        ess_per_sec_cpu = per_step_ess * steps_per_sec_cpu
        vs = ess_per_sec / max(ess_per_sec_cpu, 1e-12)
        # error bar on vs_baseline: relative errors add in quadrature
        rel = np.sqrt(
            (ess_std / max(ess_per_sec, 1e-12)) ** 2
            + (cpu_rate_std / max(steps_per_sec_cpu, 1e-12)) ** 2
        )
        out = {
            "metric": "ess_per_sec_per_chip",
            "value": round(ess_per_sec, 2),
            "unit": "ESS/s",
            "vs_baseline": round(vs, 2),
            "vs_baseline_std": round(vs * rel, 2),
            "seeds": n_done,
            "value_std": round(ess_std, 3),
            "oracle_steps_per_sec": round(steps_per_sec_cpu, 2),
            "oracle_steps_per_sec_std": round(cpu_rate_std, 3),
            "model_tflops_per_sec": round(model_tflops, 3),
            "mfu_vs_bf16_peak": round(mfu, 4),
            "whiten_dtype": WHITEN,
            # protocol pins (VERDICT r4 weak #4: ESS/s is stretch-length
            # sensitive — tau ~420 means short stretches inflate min-dim
            # ESS; measured 3.83 at 400 steps vs 3.00 at 1000, same config)
            "protocol": "geyer-min-dim",
            "steps": STEPS,
            "chains": CHAINS,
            "chol_cache": CACHE,
            "max_shrink_chol": MAX_SHRINK_CHOL,
            "warm_windows": WARM_WINDOWS,
            "compile_wall": round(compile_wall["value"], 1),
            "partial": partial,
        }
        return out

    probe_stats = {"slice": [], "ess": [], "chol": []}
    compile_wall = {"value": float("nan")}
    per_seed = []
    oracle_rate = None
    for si in range(SEEDS):
        per_seed.append(run_one_seed(si))
        if oracle_rate is None or si == SEEDS - 1:
            # oracle after the FIRST seed (so a truncated run still carries
            # vs_baseline) and again at the end with the cross-seed widths
            widths = np.mean([ps[3] for ps in per_seed], axis=0)
            oracle_rate = measure_oracle(widths)
        _LATEST["out"] = build_aggregate(
            per_seed, oracle_rate, partial=si < SEEDS - 1
        )
    _emit_latest()


if __name__ == "__main__":
    main()
