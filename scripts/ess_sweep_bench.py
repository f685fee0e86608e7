"""A/B micro-benchmark: fused whole-ESS-sweep kernel vs per-probe path.

Round-4 item 1 measurement harness (VERDICT r3 "kill the probe-dispatch
overhead").  On the real chip this measures, at the bench shape (Pima
n=640 padded, S=64, 128 vmapped chains, n_repeats=4):

  (a) ms per ESS-only step: per-probe fused rotated estimator (the r3
      production path) vs ONE whole-sweep Pallas dispatch with C resident
      in VMEM (ops/ess_sweep.py),
  (b) one-step numerical parity between the two paths on device, and
  (c) ms per FULL aux-slice step (ESS + slice-theta) both ways — the
      number that moves the headline ESS/s.

Usage: python scripts/ess_sweep_bench.py   (needs the TPU chip)
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

import dataclasses

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.datasets import load
from auxpm_tpu.models.gp_classification import make_gp_classification
from auxpm_tpu.samplers.composite import make_aux_slice
from auxpm_tpu.samplers.ess_u import make_ess_u
from auxpm_tpu.utils.profiling import device_sync

CHAINS = int(os.environ.get("BENCH_CHAINS", 128))
S = int(os.environ.get("BENCH_S", 64))
N_ESS = int(os.environ.get("BENCH_N_ESS", 4))
STEPS = int(os.environ.get("AB_STEPS", 60))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_step(step_fn, states, params, label, steps=STEPS):
    @jax.jit
    def many(ss):
        def body(s, _):
            s2, info = jax.vmap(lambda c: step_fn(c, params))(s)
            return s2, info["n_shrink"] if "n_shrink" in info else 0.0

        return jax.lax.scan(body, ss, None, length=steps)

    # compile + warm
    out, _ = many(states)
    device_sync(out.theta)
    t0 = time.time()
    out, ns = many(states)
    device_sync(out.theta)
    dt = time.time() - t0
    log(f"{label}: {1e3 * dt / steps:.3f} ms/step "
        f"({steps} steps, {CHAINS} chains)")
    return dt / steps, out


def main():
    log(f"devices: {jax.devices()}")
    x, y = load("pima")
    target = make_gp_classification(x, y, n_importance=S)
    assert target.ess_sweep_factory is not None
    t_loop = dataclasses.replace(target, ess_sweep_factory=None)

    states = init_chain_states(jax.random.key(0), target, CHAINS,
                               jitter_scale=0.3)

    # --- (b) one-step parity on device -----------------------------------
    step_sw = make_ess_u(target, n_repeats=N_ESS)
    step_lp = make_ess_u(t_loop, n_repeats=N_ESS)
    assert step_sw.uses_sweep and not step_lp.uses_sweep
    s1, i1 = jax.jit(jax.vmap(lambda c: step_sw(c, {})))(states)
    s2, i2 = jax.jit(jax.vmap(lambda c: step_lp(c, {})))(states)
    du = float(jnp.max(jnp.abs(s1.u - s2.u)))
    dll = float(jnp.max(jnp.abs(s1.log_lik_hat - s2.log_lik_hat)))
    dns = float(jnp.max(jnp.abs(i1["n_shrink"] - i2["n_shrink"])))
    log(f"one-step parity: max|du|={du:.3e} max|dll|={dll:.3e} "
        f"max|dns|={dns}")

    # --- (a) ESS-only step ------------------------------------------------
    ms_sw, _ = time_step(step_sw, states, {}, "ess-only  sweep")
    ms_lp, _ = time_step(step_lp, states, {}, "ess-only  per-probe")

    # --- (c) full aux-slice step ------------------------------------------
    params = {
        "slice_theta": {"widths": jnp.full((target.d,), 0.7, jnp.float32),
                        "max_step_out": 0},
        "ess_u": {},
    }
    full_sw = make_aux_slice(target, n_ess=N_ESS)
    full_lp = make_aux_slice(t_loop, n_ess=N_ESS)
    ms_fsw, _ = time_step(full_sw, states, params, "aux-slice sweep")
    ms_flp, _ = time_step(full_lp, states, params, "aux-slice per-probe")

    print(
        f'{{"ess_only_sweep_ms": {1e3 * ms_sw:.3f}, '
        f'"ess_only_probe_ms": {1e3 * ms_lp:.3f}, '
        f'"aux_slice_sweep_ms": {1e3 * ms_fsw:.3f}, '
        f'"aux_slice_probe_ms": {1e3 * ms_flp:.3f}, '
        f'"ess_speedup": {ms_lp / ms_sw:.3f}, '
        f'"step_speedup": {ms_flp / ms_fsw:.3f}, '
        f'"max_du": {du:.3e}, "max_dll": {dll:.3e}}}'
    )


if __name__ == "__main__":
    main()
