"""A/B micro-benchmark: the r5 slice-theta levers, one at a time.

Measures ms per FULL aux-slice step (ESS + slice-theta) at the bench shape
(Pima n=640 padded, S=64, 128 vmapped chains, n_ess=4, n_sigma_extra=1)
for the ladder:

  (a) r4 baseline: no carried factor, per-probe sigma dispatches, no cap
  (b) + carried chol_r cache (bitwise-identical trajectory)
  (c) + whole-sigma-slice Pallas sweep (law-identical, ~1 ulp trajectory)
  (d) + max_shrink_chol cap (exact, slightly different kernel)

plus a one-step parity check of (a) vs (b) on device — the cache must be
bitwise-neutral there too.

Usage: python scripts/theta_bench.py    (needs the TPU chip)
Env: AB_STEPS (default 40), BENCH_CHAINS, BENCH_S, BENCH_N_ESS, AB_CAP.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.datasets import load
from auxpm_tpu.models.gp_classification import make_gp_classification
from auxpm_tpu.samplers.composite import make_aux_slice
from auxpm_tpu.utils.profiling import device_sync

CHAINS = int(os.environ.get("BENCH_CHAINS", 128))
S = int(os.environ.get("BENCH_S", 64))
N_ESS = int(os.environ.get("BENCH_N_ESS", 4))
SIGMA_EXTRA = int(os.environ.get("BENCH_SIGMA_EXTRA", 1))
STEPS = int(os.environ.get("AB_STEPS", 40))
CAP = int(os.environ.get("AB_CAP", 4))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_step(step_fn, states, params, label, steps=STEPS):
    @jax.jit
    def many(ss):
        def body(s, _):
            s2, info = jax.vmap(lambda c: step_fn(c, params))(s)
            return s2, info["slice_theta/n_probe"]

        return jax.lax.scan(body, ss, None, length=steps)

    t0 = time.time()
    out, _ = many(states)
    device_sync(out.theta)
    log(f"{label}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    out, npb = many(states)
    device_sync(out.theta)
    dt = time.time() - t0
    log(f"{label}: {1e3 * dt / steps:.2f} ms/step "
        f"(mean slice probes {float(jnp.mean(npb)):.2f})")
    return dt / steps


def main():
    log(f"devices: {jax.devices()}")
    x, y = load("pima")
    target = make_gp_classification(x, y, n_importance=S)
    step = make_aux_slice(target, n_ess=N_ESS, n_sigma_extra=SIGMA_EXTRA)

    params = {
        "slice_theta": {"widths": jnp.asarray([0.24, 0.52], jnp.float32),
                        "max_step_out": 0},
        "ess_u": {},
    }
    params_cap = {
        "slice_theta": {**params["slice_theta"], "max_shrink_chol": CAP},
        "ess_u": {},
    }

    s_nc = init_chain_states(jax.random.key(0), target, CHAINS,
                             jitter_scale=0.3)
    s_c = init_chain_states(jax.random.key(0), target, CHAINS,
                            jitter_scale=0.3, with_cache=True)

    # one-step parity (a) vs (b): cache must be bitwise-neutral.
    # AUXPM_SIGMA_SWEEP=0 so BOTH paths use the per-probe sigma loop
    # (the sweep kernel is the (c) lever, measured separately below).
    os.environ["AUXPM_SIGMA_SWEEP"] = "0"
    step_nosweep = make_aux_slice(target, n_ess=N_ESS,
                                  n_sigma_extra=SIGMA_EXTRA)
    o1, _ = jax.jit(jax.vmap(lambda c: step_nosweep(c, params)))(s_nc)
    o2, _ = jax.jit(jax.vmap(lambda c: step_nosweep(c, params)))(s_c)
    dth = float(jnp.max(jnp.abs(o1.theta - o2.theta)))
    dll = float(jnp.max(jnp.abs(o1.log_lik_hat - o2.log_lik_hat)))
    log(f"cache parity (sigma sweep off): max|dth|={dth:.3e} "
        f"max|dll|={dll:.3e}")

    ms_a = time_step(step_nosweep, s_nc, params, "(a) r4 baseline      ")
    ms_b = time_step(step_nosweep, s_c, params, "(b) + chol_r cache   ")
    os.environ["AUXPM_SIGMA_SWEEP"] = "1"
    step_sweep = make_aux_slice(target, n_ess=N_ESS,
                                n_sigma_extra=SIGMA_EXTRA)
    ms_c = time_step(step_sweep, s_c, params, "(c) + sigma sweep    ")
    ms_d = time_step(step_sweep, s_c, params_cap, f"(d) + chol cap {CAP}    ")

    print(
        f'{{"baseline_ms": {1e3 * ms_a:.2f}, "cache_ms": {1e3 * ms_b:.2f}, '
        f'"sigma_sweep_ms": {1e3 * ms_c:.2f}, "cap_ms": {1e3 * ms_d:.2f}, '
        f'"cache_speedup": {ms_a / ms_b:.3f}, '
        f'"total_speedup": {ms_a / ms_d:.3f}, '
        f'"parity_dth": {dth:.3e}, "parity_dll": {dll:.3e}}}'
    )


if __name__ == "__main__":
    main()
