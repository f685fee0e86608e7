"""Fused estimator path (ops/fused_estimator.py) — CPU-side contracts.

The Pallas kernel itself needs a TPU (exercised by bench.py and the
on-device drive); what is testable on CPU and must hold everywhere:

- the jnp reference path equals the unfused logsumexp(log_weights_u)
  estimator bit-for-bit (same ops),
- the ESS update produces IDENTICAL chains whether the rotated-probe hook
  ``log_lik_est_rot`` is present or not (same PRNG keys, same bracket
  sequence — only the fusion differs),
- gradients flow through the custom_vjp wrapper.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.datasets import load
from auxpm_tpu.models.gp_classification import make_gp_classification
from auxpm_tpu.ops.logsumexp import logsumexp
from auxpm_tpu.samplers.ess_u import make_ess_u


def _target():
    x, y = load("pima", subsample=64)
    return make_gp_classification(x, y, n_importance=8, pad_to_tiles=True)


def test_fused_fallback_equals_unfused():
    t = _target()
    theta = jnp.asarray([0.1, 0.2], jnp.float32)
    u = jax.random.normal(jax.random.key(0), t.u_shape, jnp.float32)
    prep = t.prepare(theta)
    fused = float(t.log_lik_est_u(prep, u))
    unfused = float(
        logsumexp(t.log_weights_u(prep, u), axis=0) - np.log(t.u_shape[0])
    )
    assert abs(fused - unfused) < 1e-5

    # rotated probe equals rotate-then-estimate
    v = jax.random.normal(jax.random.key(1), t.u_shape, jnp.float32)
    a = jnp.float32(0.6)
    rot = float(t.log_lik_est_rot(prep, u, v, a))
    manual = float(t.log_lik_est_u(prep, u * jnp.cos(a) + v * jnp.sin(a)))
    assert abs(rot - manual) < 1e-5


def test_ess_update_identical_with_and_without_rot_hook():
    """The ESS update must produce IDENTICAL chains across all three
    estimator-call shapes: the fused whole-sweep path (ess_sweep_factory —
    default), the per-probe rotated hook, and the plain rotate-then-estimate
    path (same PRNG keys, same bracket sequence — only the fusion differs)."""
    t = _target()
    t_rot = dataclasses.replace(t, ess_sweep_factory=None)
    t_plain = dataclasses.replace(
        t, ess_sweep_factory=None, log_lik_est_rot=None
    )
    states = init_chain_states(jax.random.key(2), t, 4, jitter_scale=0.2)

    step_sweep = make_ess_u(t)
    step_rot = make_ess_u(t_rot)
    assert step_sweep.uses_sweep and not step_rot.uses_sweep
    s1, i1 = jax.vmap(lambda s: step_sweep(s, {}))(states)
    s2, i2 = jax.vmap(lambda s: step_rot(s, {}))(states)
    s3, i3 = jax.vmap(lambda s: make_ess_u(t_plain)(s, {}))(states)
    # the two per-probe variants are the SAME code path modulo fusion of
    # the rotation into the estimator: bitwise
    np.testing.assert_array_equal(np.asarray(s2.u), np.asarray(s3.u))
    for sb, ib in ((s2, i2), (s3, i3)):
        # sweep vs per-probe: ~1-ulp tolerance (cos/sin lowering contexts)
        np.testing.assert_allclose(np.asarray(s1.u), np.asarray(sb.u),
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(s1.log_lik_hat), np.asarray(sb.log_lik_hat), rtol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(jax.random.key_data(s1.key)), np.asarray(jax.random.key_data(sb.key)))
        np.testing.assert_array_equal(
            np.asarray(i1["n_shrink"]), np.asarray(ib["n_shrink"])
        )
        np.testing.assert_array_equal(
            np.asarray(i1["moved"]), np.asarray(ib["moved"])
        )


def test_gradients_flow_through_estimator():
    t = _target()
    u = jax.random.normal(jax.random.key(3), t.u_shape, jnp.float32)
    g = jax.grad(lambda th: t.log_lik_est(th, u))(
        jnp.asarray([0.0, 0.1], jnp.float32)
    )
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_log_ndtr_matches_scipy_wide_range():
    """The in-kernel probit (log-form erfc polynomial, likelihoods.log_ndtr)
    must match scipy's f64 log_ndtr to ~1e-5 absolute over the whole range
    the sampler can visit — including far tails where plain f32 erfc
    underflows (VERDICT r1 item 9 done-criterion)."""
    from scipy.special import log_ndtr as scipy_log_ndtr

    from auxpm_tpu.models.likelihoods import log_ndtr

    z = np.concatenate([
        np.linspace(-30.0, 30.0, 4001),
        np.linspace(-8.5, -7.5, 101),  # the old tail-switch region
    ])
    got = np.asarray(log_ndtr(jnp.asarray(z, jnp.float32)), np.float64)
    want = scipy_log_ndtr(z)
    # absolute tolerance in log-space == relative accuracy of Phi; the
    # approximation is 1.2e-7 relative, f32 evaluation adds rounding.
    # In the far tail |log Phi| ~ z^2/2 is large, so scale the tolerance.
    tol = 1e-5 * np.maximum(1.0, np.abs(want))
    assert np.all(np.abs(got - want) < tol), np.max(np.abs(got - want) / tol)


def test_fused_probit_kernel_interpret_matches_ref():
    """Probit fused kernel (interpret mode) == jnp reference path."""
    from auxpm_tpu.ops import fused_estimator as fe

    rng = np.random.default_rng(5)
    s, n = 16, 256
    u = jnp.asarray(rng.standard_normal((s, n)), jnp.float32)
    chol = jnp.asarray(
        np.tril(rng.standard_normal((n, n)) * 0.1) + np.eye(n), jnp.float32
    )
    y = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
    mask = jnp.ones((n,), jnp.float32)

    want = fe._ref_estimate(chol, u, y, mask, "probit", n_blocks=8)

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(
        fe._fused_kernel, likelihood="probit",
        log_s=float(np.log(float(s))), n_blocks=8,
    )
    got = pl.pallas_call(
        kern,
        grid=(n // 128,),
        in_specs=[
            pl.BlockSpec((s, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, n), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s, 128), jnp.float32)],
        interpret=True,
    )(u, chol, y[None, :], mask[None, :])[0, 0]
    np.testing.assert_allclose(float(got), float(want), rtol=2e-6, atol=2e-5)


def test_blocked_lse_lw_neg_inf_guard():
    """_blocked_lse_lw must mirror block_partials' -inf guard: an all--inf
    block yields 0 contribution, not NaN (advisor finding r2); and in the
    finite case the guard must not change the result bitwise."""
    from auxpm_tpu.ops import fused_estimator as fe
    from auxpm_tpu.ops.logsumexp import blocked_logsumexp

    rng = np.random.default_rng(7)
    lw_fin = jnp.asarray(rng.standard_normal((16, 1)) * 30.0, jnp.float32)
    for nb in (1, 4, 8):
        got = float(fe._blocked_lse_lw(lw_fin, nb))
        want = float(blocked_logsumexp(lw_fin[:, 0], nb))
        assert got == want, (nb, got, want)  # bitwise in the finite case

    # one all--inf block (e.g. a fully-masked weight block)
    lw = np.array(lw_fin)
    lw[0:2, 0] = -np.inf  # first block of nb=8 (block size 2)
    lw = jnp.asarray(lw)
    got = float(fe._blocked_lse_lw(lw, 8))
    want = float(blocked_logsumexp(lw[:, 0], 8))
    assert np.isfinite(got)
    assert got == want

    # ALL entries -inf: log(0) = -inf, never NaN
    all_inf = jnp.full((16, 1), -jnp.inf, jnp.float32)
    for nb in (1, 8):
        assert float(fe._blocked_lse_lw(all_inf, nb)) == -np.inf


def test_bf16_whiten_accuracy_and_kernel_parity():
    """whiten_dtype="bfloat16" (VERDICT r2 item 4): the bf16-input /
    f32-accumulate estimator must stay within the estimator's own noise
    floor of the f32 definition, and the Pallas kernel (interpret mode)
    must agree with the jnp bf16 path."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from auxpm_tpu.ops import fused_estimator as fe

    x, y = load("pima", subsample=64)
    t32 = make_gp_classification(x, y, n_importance=16)
    t16 = make_gp_classification(x, y, n_importance=16,
                                 whiten_dtype="bfloat16")
    theta = jnp.asarray([0.1, 0.2], jnp.float32)
    u = jax.random.normal(jax.random.key(0), t32.u_shape, jnp.float32)
    v32 = float(t32.log_lik_est(theta, u))
    v16 = float(t16.log_lik_est(theta, u))
    # bf16 rounding moves log L-hat by ~1e-2 nats here; the S=16 IS noise
    # (std over u draws) is >0.1 nats — the perturbation is sub-noise.
    assert abs(v16 - v32) < 0.1, (v16, v32)
    assert v16 != v32  # it IS a different (coarser) estimator

    # interpret-mode Pallas bf16 kernel == jnp bf16 reference
    s, n = 16, 256
    rng = np.random.default_rng(9)
    uu = jnp.asarray(rng.standard_normal((s, n)), jnp.float32)
    chol = jnp.asarray(
        np.tril(rng.standard_normal((n, n)) * 0.1) + np.eye(n), jnp.float32
    )
    yv = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
    mask = jnp.ones((n,), jnp.float32)
    want = float(fe._ref_estimate(chol, uu, yv, mask, "logistic", n_blocks=8,
                                  whiten_dtype=jnp.bfloat16))
    kern = functools.partial(
        fe._fused_kernel, likelihood="logistic",
        log_s=float(np.log(float(s))), n_blocks=8,
        whiten_dtype=jnp.bfloat16,
    )
    got = pl.pallas_call(
        kern,
        grid=(n // 128,),
        in_specs=[
            pl.BlockSpec((s, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, n), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s, 128), jnp.float32)],
        interpret=True,
    )(uu, chol, yv[None, :], mask[None, :])[0, 0]
    np.testing.assert_allclose(float(got), want, rtol=1e-6, atol=1e-5)

    # gradients still flow through the custom_vjp (bf16 backward = jnp bf16)
    est = fe.make_fused_estimator(yv, mask, "logistic", force=False,
                                  n_blocks=8, whiten_dtype="bfloat16")
    g = jax.grad(lambda c: est(c, uu))(chol)
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_whiten_density_perturbation_bounded():
    """The bf16 whiten targets the perturbed posterior ∝ p(theta) L̂16(theta)
    where log L̂16 - log L̂32 is bounded.  A sup bound on |Δ log L̂| over the
    posterior region bounds the log-density perturbation directly — the
    statistically sound version of "posterior moments unchanged" (a short
    two-chain moment comparison is dominated by chain decorrelation noise,
    tau >> window, and cannot resolve a ~1e-2-nat bias).  The full-protocol
    moment check runs at bench time on TPU (BASELINE.md)."""
    x, y = load("pima", subsample=64)
    t32 = make_gp_classification(x, y, n_importance=16)
    t16 = make_gp_classification(x, y, n_importance=16,
                                 whiten_dtype="bfloat16")
    key = jax.random.key(3)
    deltas = []
    for i in range(20):
        k_t, k_u, key = jax.random.split(jax.random.fold_in(key, i), 3)
        theta = 0.5 * jax.random.normal(k_t, (2,), jnp.float32)
        u = jax.random.normal(k_u, t32.u_shape, jnp.float32)
        deltas.append(
            float(t16.log_lik_est(theta, u)) - float(t32.log_lik_est(theta, u))
        )
    deltas = np.asarray(deltas)
    # sup |Δ log density| << 1 nat => posterior essentially unchanged;
    # measured ~1e-2 on this problem.  S=16 IS noise is ~0.1-1 nats.
    assert np.max(np.abs(deltas)) < 0.1, deltas
    assert np.any(deltas != 0.0)  # a genuinely different estimator


def test_wide_col_block_interpret_matches_ref():
    """_col_block widens the kernel's column blocks (n=640 -> one 640-wide
    grid step at S<=64); the interpret-mode result must match the jnp
    reference for every wrapper, and forcing 128 must give the same numbers
    (the reduction is over the acc buffer, independent of blocking)."""
    import os

    from auxpm_tpu.ops import fused_estimator as fe

    assert fe._col_block(64, 640, n_u=2) == 640
    assert fe._col_block(64, 128) == 128
    # VMEM guard: huge n falls back to narrower blocks
    assert fe._col_block(64, 128 * 64, n_u=2) < 128 * 64

    rng = np.random.default_rng(11)
    s, n = 16, 640
    u = jnp.asarray(rng.standard_normal((s, n)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((s, n)), jnp.float32)
    chol = jnp.asarray(
        np.tril(rng.standard_normal((n, n)) * 0.05) + np.eye(n), jnp.float32
    )
    y = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
    mask = jnp.ones((n,), jnp.float32)
    a = jnp.float32(0.7)

    want = float(fe._ref_estimate(chol, u, y, mask, "logistic", n_blocks=8))
    want_rot = float(fe._ref_estimate(
        chol, u * jnp.cos(a) + v * jnp.sin(a), y, mask, "logistic", n_blocks=8
    ))
    want_w = np.asarray(fe._ref_weights(chol, u, y, mask, "logistic"))

    for forced in ("0", "128"):
        os.environ["AUXPM_FUSED_COL_BLOCK"] = forced
        try:
            got = float(fe._pallas_estimate(
                chol, u, y, mask, "logistic", n_blocks=8, interpret=True
            ))
            np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)
            got_rot = float(fe._pallas_estimate_rot(
                chol, u, v, a, y, mask, "logistic", n_blocks=8, interpret=True
            ))
            np.testing.assert_allclose(got_rot, want_rot, rtol=2e-6, atol=2e-5)
            got_w = np.asarray(fe._pallas_weights(
                chol, u, y, mask, "logistic", interpret=True
            ))
            np.testing.assert_allclose(got_w, want_w, rtol=2e-6, atol=2e-5)
            got_rw = np.asarray(fe._pallas_rot_weights(
                chol, u, v, a, y, mask, "logistic", interpret=True
            ))
            np.testing.assert_allclose(
                got_rw,
                np.asarray(fe._ref_weights(
                    chol, u * jnp.cos(a) + v * jnp.sin(a), y, mask, "logistic"
                )),
                rtol=2e-6, atol=2e-5,
            )
        finally:
            os.environ.pop("AUXPM_FUSED_COL_BLOCK", None)
