"""Typed run configuration + registered presets for the BASELINE configs.

The reference hardcodes constants in notebooks (SURVEY.md §5 "Config / flag
system"); here every experiment is a ``RunConfig`` dataclass with one
registered preset per BASELINE.json config 1-5, overridable from the CLI
(``python -m auxpm_tpu.run --preset pima_aux_slice --chains 4096``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class RunConfig:
    preset: str = "toy_pm_mh"
    # target
    target: str = "gaussian_toy"  # gaussian_toy | gp
    dataset: str = "pima"  # gp only: pima | breast_cancer | abalone
    n_importance: int = 16
    likelihood: str = "logistic"
    # Importance proposal: "prior" (the perf path) | "laplace".
    # laplace is a CORRECTNESS/variance capability, OUT OF THE PERF ENVELOPE
    # (VERDICT r2 item 8, resolved by measurement 2026-08-19): its prepare()
    # is 11.5x the prior prepare at newton_iters=6, and even a PERFECT
    # warm start (iters=1) leaves it at 6.1x — the Sigma_q formation (two
    # O(n^3) triangular solve batches + 2 extra Choleskys, models/laplace.py)
    # dominates, not the Newton loop, so carrying a warm mode across probes
    # cannot close the gap.  It also disables the Cholesky-free log_sigma
    # coordinate path.  Use it when estimator variance at small S matters
    # more than wall-clock (it reaches lower variance at S=8 than prior at
    # S=64); benchmark numbers are always quoted on the prior path.
    proposal: str = "prior"
    whiten_dtype: str = "float32"  # whiten GEMM precision: float32 | bfloat16
    ard: bool = False
    subsample: Optional[int] = None
    noise_frac: float = 0.3  # toy only
    # sampler
    sampler: str = "pm_mh"  # key into samplers.composite.SAMPLERS, or "smc"
    chains: int = 4
    steps: int = 1000
    thin: int = 1
    warmup_windows: int = 3
    window_steps: int = 100
    step_size: float = 0.5
    widths: float = 1.0
    max_step_out: int = 8  # slice stepping-out cap; 0 = shrinkage-only
    n_ess: int = 1  # ESS u-update repeats per step (aux_slice*; bench: 4)
    n_sigma_extra: int = 0  # extra Cholesky-free log_sigma slice updates
                            # per sweep (structure-aware targets)
    chol_cache: bool = True  # carry chol_r in state.extras (bitwise-neutral
                             # fast path, models/base.py cache contract);
                             # targets without cache_init ignore it
    max_shrink_chol: int = 32  # shrink cap for Cholesky-paying slice coords
                               # (samplers/slice_theta.py); 32 = off
    nuts_step_size: float = 0.3
    # SMC
    particles: int = 4096
    smc_rejuvenation: str = "aux_slice"  # aux_slice | aux_nuts | aux_hmc
    smc_n_mcmc: int = 2
    smc_ess_frac: float = 0.5
    # carry_u=False (sharded only) = the 1M-particle mode: u stays implicit
    # in its generating PRNG key; resampling moves O(N d) bytes; u refreshed
    # by smc_n_u_mh independence-MH proposals per stage; theta rejuvenated by
    # the theta-only counterpart of smc_rejuvenation (aux_nuts -> nuts).
    smc_carry_u: bool = True
    smc_n_u_mh: int = 2
    smc_rejuv_batch: int = 256
    smc_rejuv_dispatches: int = 1  # split stage rejuvenation into K dispatches
    smc_u_blocks: int = 1  # blocked u-refresh: keys per u row-block (carry_u=False)
    smc_checkpoint_dir: str = ""  # per-stage checkpoint/resume directory
    # parallel
    sharded: bool = False
    particle_shards: int = 1
    multihost: bool = False  # jax.distributed.initialize() before bring-up
    profile_dir: Optional[str] = None  # jax.profiler trace of the main run
    # misc
    seed: int = 0
    jitter_scale: float = 0.3
    metrics_path: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0  # windows; 0 = off
    out: Optional[str] = None
    plots: Optional[str] = None  # prefix for trace/density/autocorr figures

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# One preset per BASELINE.json configs[0..4] (BASELINE.md table), plus the
# third config's second dataset as its own preset.
PRESETS = {
    # config 1: "2D Gaussian target, PM-MH with 16 importance samples, 4
    # chains (CPU-runnable PR1 ref)"
    "toy_pm_mh": RunConfig(
        preset="toy_pm_mh",
        target="gaussian_toy",
        n_importance=16,
        sampler="pm_mh",
        chains=4,
        steps=5000,
        step_size=0.6,
    ),
    # config 2: "GP classification on Pima (532 pts), auxiliary PM slice
    # sampling, 64 importance samples per step"
    "pima_aux_slice": RunConfig(
        preset="pima_aux_slice",
        target="gp",
        dataset="pima",
        n_importance=64,
        sampler="aux_slice",
        chains=128,
        steps=1000,
        widths=1.0,
    ),
    # config 3: "GP classification Breast-Cancer + Abalone, whitened
    # elliptical-slice auxiliary updates, hyperparameter sampling"
    "breast_cancer_aux": RunConfig(
        preset="breast_cancer_aux",
        target="gp",
        dataset="breast_cancer",
        n_importance=64,
        sampler="aux_slice",
        chains=64,
        steps=1000,
    ),
    "abalone_aux": RunConfig(
        preset="abalone_aux",
        target="gp",
        dataset="abalone",
        n_importance=64,
        sampler="aux_slice",
        chains=32,
        steps=500,
        subsample=1024,  # full 4177-pt abalone: set --subsample 0
    ),
    # config 2 variant: ARD kernel (per-dimension lengthscales, theta is
    # (d+1)-dim); the TPU Gram path routes through the Pallas ARD tile
    # kernel (ops/gram.se_gram_ard_pallas)
    "pima_ard_aux": RunConfig(
        preset="pima_ard_aux",
        target="gp",
        dataset="pima",
        n_importance=64,
        sampler="aux_slice",
        chains=64,
        steps=1000,
        ard=True,
    ),
    # config 4: "4096 vectorized chains on GP posterior, chains sharded
    # across hosts, global step-size/bracket adaptation via psum"
    "gp_4096_sharded": RunConfig(
        preset="gp_4096_sharded",
        target="gp",
        dataset="pima",
        n_importance=64,
        sampler="aux_slice",
        chains=4096,
        steps=500,
        sharded=True,
    ),
    # config 5: "SMC with 1M particles sharded over a v4 pod slice:
    # distributed resampling + NUTS rejuvenation on GP hyperparameters"
    # (particle count is per-run: 1M needs the pod; default fits one chip).
    # carry_u=False is what makes 1M real: resampling transports O(N d)
    # bytes instead of O(N S n) — see samplers/smc_sharded.py.
    "smc_gp_nuts": RunConfig(
        preset="smc_gp_nuts",
        target="gp",
        dataset="pima",
        n_importance=32,
        sampler="smc",
        smc_rejuvenation="aux_nuts",
        particles=4096,
        sharded=True,
        smc_carry_u=False,
    ),
    "smc_toy": RunConfig(
        preset="smc_toy",
        target="gaussian_toy",
        n_importance=16,
        sampler="smc",
        smc_rejuvenation="aux_slice",
        particles=2048,
    ),
}


def build_target(cfg: RunConfig):
    if cfg.target == "gaussian_toy":
        from auxpm_tpu.models.gaussian_toy import make_gaussian_toy

        return make_gaussian_toy(
            n_importance=cfg.n_importance, noise_frac=cfg.noise_frac
        )
    if cfg.target == "gp":
        from auxpm_tpu.models.datasets import load
        from auxpm_tpu.models.gp_classification import make_gp_classification

        x, y = load(cfg.dataset, subsample=cfg.subsample or None, seed=cfg.seed)
        return make_gp_classification(
            x,
            y,
            n_importance=cfg.n_importance,
            likelihood=cfg.likelihood,
            proposal=cfg.proposal,
            ard=cfg.ard,
            whiten_dtype=cfg.whiten_dtype,
        )
    raise ValueError(f"unknown target {cfg.target}")


def initial_params(cfg: RunConfig, target):
    """Initial sampler params for EVERY registered composite — each group
    gets its knobs from the config (max_step_out / widths / step sizes), so
    nothing has to be hand-set outside the config system (VERDICT r1
    weakness 5)."""
    import jax.numpy as jnp

    # NOTE: n_sigma_extra is a STATIC factory arg (samplers/composite
    # make_aux_slice*), not a params entry — params are traced under jit.
    widths = jnp.full((target.d,), cfg.widths, jnp.float32)
    slice_g = {"widths": widths, "max_step_out": cfg.max_step_out,
               "max_shrink_chol": cfg.max_shrink_chol}
    if cfg.sampler == "pm_mh":
        return {"step_size": cfg.step_size}
    params = {}
    if cfg.sampler in ("aux_slice", "aux_slice_rd", "aux_slice_pcrd",
                       "aux_slice_joint"):
        params["slice_theta"] = dict(slice_g)
        params["ess_u"] = {}
    if cfg.sampler == "aux_slice_pcrd":
        params["slice_theta_rd"] = dict(slice_g)
    if cfg.sampler in ("aux_slice_joint", "joint_slice"):
        params["joint_slice"] = {
            "width": cfg.widths, "max_step_out": cfg.max_step_out,
        }
    if cfg.sampler == "joint_mh":
        params["joint_mh"] = {"step_size": cfg.step_size}
    if cfg.sampler == "aux_mh":
        params["mh_theta"] = {"step_size": cfg.step_size}
    if cfg.sampler == "aux_hmc":
        params["hmc"] = {"step_size": cfg.nuts_step_size}
    if cfg.sampler == "aux_nuts":
        params["nuts"] = {"step_size": cfg.nuts_step_size}
    return params
