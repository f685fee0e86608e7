"""Kernel-variant tau sweep on the bench config (Pima, S=64, 128 chains).

Measures, per kernel variant: chain-steps/s (honest device_sync timing),
tau per dimension (Geyer via effective_sample_size), and ESS/s — the
quantity the official bench optimises.  Used to pick the default bench
kernel (VERDICT round-1 item 3: attack tau~450 with joint / rd moves).

Env: TAU_VARIANTS (comma list), TAU_STEPS, TAU_CHAINS, TAU_WARM_WINDOWS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.datasets import load
from auxpm_tpu.models.gp_classification import make_gp_classification
from auxpm_tpu.samplers import composite
from auxpm_tpu.samplers.adaptation import adapt_params
from auxpm_tpu.samplers.chain import run_chains
from auxpm_tpu.utils.diagnostics import effective_sample_size
from auxpm_tpu.utils.profiling import device_sync

CHAINS = int(os.environ.get("TAU_CHAINS", 128))
STEPS = int(os.environ.get("TAU_STEPS", 800))
CHUNK = 25
WARM_WINDOWS = int(os.environ.get("TAU_WARM_WINDOWS", 6))
VARIANTS = os.environ.get(
    "TAU_VARIANTS", "aux_slice,aux_slice_pcrd,aux_slice_joint"
).split(",")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_step(name, target):
    if name.startswith("aux_slice"):
        return composite.SAMPLERS[name](target, n_ess=4)
    return composite.SAMPLERS[name](target)


def initial_params(target, name):
    p = {
        "ess_u": {},
        "slice_theta": {
            "widths": jnp.full((target.d,), 2.0, jnp.float32),
            "max_step_out": 0,
        },
    }
    if name == "aux_slice_pcrd":
        p["slice_theta_rd"] = {
            "widths": jnp.full((target.d,), 2.0, jnp.float32),
            "max_step_out": 0,
        }
    if name == "aux_slice_joint":
        p["joint_slice"] = {"width": 2.0, "max_step_out": 0}
    return p


def post_adapt(params, name):
    # mirror adapted per-coordinate widths into groups adapt_params skips
    w = params.get("slice_theta", {}).get("widths")
    if w is not None and name == "aux_slice_pcrd":
        params["slice_theta_rd"] = {"widths": w, "max_step_out": 0}
    params["slice_theta"]["max_step_out"] = 0
    if "joint_slice" in params:
        params["joint_slice"]["max_step_out"] = 0
        params["joint_slice"].setdefault("width", 2.0)
    params.pop("joint_slice", None) if name != "aux_slice_joint" else None
    return {k: v for k, v in params.items()
            if k in ("ess_u", "slice_theta")
            or (k == "slice_theta_rd" and name == "aux_slice_pcrd")
            or (k == "joint_slice" and name == "aux_slice_joint")}


def run_variant(name, x, y):
    target = make_gp_classification(x, y, n_importance=64)
    step = make_step(name, target)
    states = init_chain_states(jax.random.key(0), target, CHAINS, jitter_scale=0.3)
    params = initial_params(target, name)

    t0 = time.time()
    for w in range(WARM_WINDOWS):
        states, recs, infos = run_chains(step, states, params, CHUNK)
        device_sync(states.theta)
        params = post_adapt(adapt_params(params, recs, infos, width_scale=2.5), name)
    log(f"[{name}] warmup {time.time()-t0:.1f}s  widths "
        f"{np.asarray(params['slice_theta']['widths'])} "
        f"joint_w {params.get('joint_slice', {}).get('width')}")

    thetas = []
    t0 = time.time()
    for _ in range(STEPS // CHUNK):
        states, recs, infos = run_chains(step, states, params, CHUNK)
        thetas.append(recs["theta"])
        device_sync(recs["theta"])
    wall = time.time() - t0
    theta = np.concatenate([np.asarray(t) for t in thetas], axis=1)
    ess = effective_sample_size(theta)
    n_tot = theta.shape[0] * theta.shape[1]
    tau = n_tot / ess
    sps = n_tot / wall
    essps = float(np.min(ess)) / wall
    print(
        f"{name:18s} steps/s {sps:7.0f}  tau {np.round(tau,0)}  "
        f"ESS {np.round(ess,1)}  ESS/s {essps:5.2f}",
        flush=True,
    )
    return essps


def main():
    log(f"devices: {jax.devices()}")
    x, y = load("pima")
    for name in VARIANTS:
        try:
            run_variant(name, x, y)
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
