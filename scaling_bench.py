"""Chain-scaling efficiency harness — BASELINE Target 2.

Weak-scaling measurement for the secondary BASELINE metric ("chain-scaling
efficiency 1 -> N hosts", BASELINE.json:2; Target 2: >=80% samples/s
efficiency, BASELINE.json:5): run the sharded aux-slice chain runner on a
1-device mesh and on an N-device mesh with the SAME number of chains per
device, and report

    efficiency = (steps/s on N devices) / (N * steps/s on 1 device)

Chains never communicate except the windowed psum adaptation reductions
(parallel/sharded_chain.py), so the expected efficiency is ~1.0; the
harness exists to MEASURE it on real hardware.  On this dev environment
only one TPU chip is reachable, so the default run uses the virtual
CPU-device mesh (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count),
which exercises the full code path; wall-clock efficiency numbers are only
meaningful on a real pod slice, where the same script runs unchanged under
``jax.distributed.initialize`` (pass --multihost).

Prints ONE JSON line:
  {"metric": "chain_scaling_efficiency", "value": ..., "unit": "ratio",
   "vs_baseline": value/0.8}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def measure(mesh, chains, steps, warm, target, params):
    import jax

    from auxpm_tpu.core.state import init_chain_states
    from auxpm_tpu.utils.profiling import device_sync
    from auxpm_tpu.parallel.sharded_chain import run_chains_sharded, shard_states
    from auxpm_tpu.samplers.composite import make_aux_slice

    step = make_aux_slice(target)
    states = init_chain_states(jax.random.key(0), target, chains, jitter_scale=0.3)
    states = shard_states(states, mesh)
    # warm (compile + settle)
    states, _, _ = run_chains_sharded(step, states, params, warm, mesh)
    device_sync(states.theta)
    t0 = time.time()
    states, recs, _ = run_chains_sharded(step, states, params, steps, mesh)
    device_sync(recs["theta"])
    wall = time.time() - t0
    return chains * steps / wall


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--chains-per-device", type=int, default=32)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--warm", type=int, default=10)
    p.add_argument("--subsample", type=int, default=128,
                   help="GP dataset subsample (keep CPU-mesh runs fast)")
    p.add_argument("--n-importance", type=int, default=16)
    p.add_argument("--cpu-mesh", type=int, default=0,
                   help="force an N-virtual-device CPU mesh (dev default: 8)")
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--real-devices", action="store_true",
                   help="use whatever jax.devices() gives (e.g. a pod slice)")
    p.add_argument("--out", default=None, help="JSON artifact path")
    args = p.parse_args(argv)

    if args.multihost:
        from auxpm_tpu.parallel.mesh import distributed_init

        distributed_init(require=True)
        import jax
    elif args.real_devices:
        import jax
    else:
        # virtual CPU mesh: must force the platform BEFORE any backend
        # initialisation (this environment's sitecustomize pre-selects the
        # axon TPU plugin — see tests/conftest.py)
        n_cpu = args.cpu_mesh or 8
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_cpu}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from auxpm_tpu.models.datasets import load
    from auxpm_tpu.models.gp_classification import make_gp_classification
    from auxpm_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", file=sys.stderr)

    x, y = load("pima", subsample=args.subsample)
    target = make_gp_classification(x, y, n_importance=args.n_importance)
    params = {
        "slice_theta": {
            "widths": jnp.full((target.d,), 0.5, jnp.float32),
            "max_step_out": 0,
        }
    }

    mesh1 = make_mesh(n_chains_shards=1, devices=jax.devices()[:1])
    tput1 = measure(mesh1, args.chains_per_device, args.steps, args.warm,
                    target, params)
    meshN = make_mesh(n_chains_shards=n_dev)
    tputN = measure(meshN, args.chains_per_device * n_dev, args.steps,
                    args.warm, target, params)
    eff = tputN / (n_dev * tput1)
    print(
        f"1 dev: {tput1:.1f} chain-steps/s; {n_dev} dev: {tputN:.1f}; "
        f"efficiency {eff:.3f}",
        file=sys.stderr,
    )
    out = {
        "metric": "chain_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_devices": n_dev,
        "platform": jax.devices()[0].platform,
        "tput_1dev": round(tput1, 1),
        "tput_ndev": round(tputN, 1),
        "vs_baseline": round(eff / 0.8, 2),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
