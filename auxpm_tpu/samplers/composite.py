"""Preset composite transitions — the paper's auxiliary PM samplers.

"Auxiliary pseudo-marginal slice sampling" (BASELINE.json:5) is the
composition (ESS on u | theta) then (slice on theta | u); per-iteration
composition per SURVEY.md §3.1/§3.3.  Variants exposed:

- ``aux_slice``:        ESS(u) ∘ per-coordinate slice(theta)   [the method]
- ``aux_slice_rd``:     ESS(u) ∘ random-direction slice(theta)
- ``aux_mh``:           ESS(u) ∘ random-walk MH(theta)
- ``pm_mh``:            plain pseudo-marginal MH baseline
"""

from __future__ import annotations

from auxpm_tpu.core.transition import compose
from auxpm_tpu.samplers.ess_u import make_ess_u
from auxpm_tpu.samplers.mh_theta import make_mh_theta
from auxpm_tpu.samplers.pm_mh import make_pm_mh
from auxpm_tpu.samplers.slice_theta import make_slice_theta, make_slice_theta_rd


def make_aux_slice(target, particle_axis=None, n_ess=1, n_sigma_extra=0):
    """The paper's method: ESS(u) then per-coordinate slice(theta).

    ``n_ess`` repeats the elliptical-slice u-update per iteration.  The
    u-updates are Cholesky-free (theta fixed -> prepare() amortised), so
    extra repeats cost only O(S n²) estimator probes while directly
    attacking the log L̂ autocorrelation that throttles theta mixing —
    the cheap knob for the estimator-noise-limited regime.
    ``n_sigma_extra`` (static) repeats the Cholesky-free log_sigma slice
    update per sweep (samplers/slice_theta.make_slice_theta).
    """
    return compose(
        [
            ("ess_u", make_ess_u(target, particle_axis, n_repeats=n_ess)),
            ("slice_theta", make_slice_theta(target, n_sigma_extra)),
        ]
    )


def make_aux_slice_rd(target, particle_axis=None, n_ess=1):
    return compose(
        [
            ("ess_u", make_ess_u(target, particle_axis, n_repeats=n_ess)),
            ("slice_theta", make_slice_theta_rd(target)),
        ]
    )


def make_aux_mh(target, particle_axis=None):
    return compose(
        [
            ("ess_u", make_ess_u(target, particle_axis)),
            ("mh_theta", make_mh_theta(target)),
        ]
    )


def make_joint_slice_kernel(target, particle_axis=None):
    """Pure joint (theta, u) slice updates (samplers/joint_slice.py) — the
    paper's joint-update family on its own."""
    from auxpm_tpu.samplers.joint_slice import make_joint_slice

    return compose([("joint_slice", make_joint_slice(target, particle_axis))])


def make_joint_mh_kernel(target, particle_axis=None):
    """Joint RW-MH on theta + pCN rotation on u (correlated pseudo-marginal
    MH; rho=pi/2 recovers classic PM-MH)."""
    from auxpm_tpu.samplers.joint_slice import make_joint_mh

    return compose([("joint_mh", make_joint_mh(target, particle_axis))])


def make_aux_slice_joint(target, particle_axis=None, n_ess=1,
                         n_sigma_extra=0):
    """aux_slice with a joint (theta, u) random-direction move appended —
    attacks cross-coordinate posterior correlation AND the theta–log L-hat
    coupling in one extra probe sequence per step."""
    from auxpm_tpu.samplers.joint_slice import make_joint_slice

    return compose(
        [
            ("ess_u", make_ess_u(target, particle_axis, n_repeats=n_ess)),
            ("slice_theta", make_slice_theta(target, n_sigma_extra)),
            ("joint_slice", make_joint_slice(target, particle_axis)),
        ]
    )


def make_aux_slice_pcrd(target, particle_axis=None, n_ess=1,
                        n_sigma_extra=0):
    """aux_slice with a random-direction theta slice appended after the
    per-coordinate sweep — attacks the (log_ell, log_sigma) posterior
    correlation that axis-aligned moves cross in small diagonal steps.
    The rd group reads ``params["slice_theta_rd"]["widths"]`` (callers
    usually mirror the adapted per-coordinate widths; the rd kernel takes
    their mean as its scalar bracket)."""
    return compose(
        [
            ("ess_u", make_ess_u(target, particle_axis, n_repeats=n_ess)),
            ("slice_theta", make_slice_theta(target, n_sigma_extra)),
            ("slice_theta_rd", make_slice_theta_rd(target)),
        ]
    )


def make_aux_hmc(target, particle_axis=None):
    from auxpm_tpu.samplers.hmc import make_hmc

    return compose(
        [("ess_u", make_ess_u(target, particle_axis)), ("hmc", make_hmc(target))]
    )


def make_aux_nuts(target, particle_axis=None):
    from auxpm_tpu.samplers.nuts import make_nuts

    return compose(
        [("ess_u", make_ess_u(target, particle_axis)), ("nuts", make_nuts(target))]
    )


def _make_theta_only(kind):
    """theta | u kernels with NO u-update — the rejuvenation contract of the
    carry_u=False sharded SMC mode (samplers/smc_sharded.py), where u is
    represented implicitly by its generating PRNG key and only an
    independence-MH refresh (inside the SMC stage) may change it."""

    def factory(target, particle_axis=None):
        del particle_axis  # theta probes pay the full estimator path anyway
        if kind == "slice_theta":
            t = make_slice_theta(target)
        elif kind == "mh_theta":
            t = make_mh_theta(target)
        elif kind == "nuts":
            from auxpm_tpu.samplers.nuts import make_nuts

            t = make_nuts(target)
        elif kind == "hmc":
            from auxpm_tpu.samplers.hmc import make_hmc

            t = make_hmc(target)
        else:
            raise ValueError(f"unknown theta-only kernel {kind!r}")
        return compose([(kind, t)])

    return factory


# Rejuvenation factories that hold u fixed (for smc_sharded carry_u=False).
THETA_ONLY = {
    k: _make_theta_only(k) for k in ("slice_theta", "mh_theta", "nuts", "hmc")
}

SAMPLERS = {
    "pm_mh": make_pm_mh,
    "aux_slice": make_aux_slice,
    "aux_slice_rd": make_aux_slice_rd,
    "aux_slice_pcrd": make_aux_slice_pcrd,
    "aux_slice_joint": make_aux_slice_joint,
    "aux_mh": make_aux_mh,
    "aux_hmc": make_aux_hmc,
    "aux_nuts": make_aux_nuts,
    "joint_slice": make_joint_slice_kernel,
    "joint_mh": make_joint_mh_kernel,
}
