"""Real-data correctness: posterior-moment cross-check on Breast-Cancer.

VERDICT r1 item 5: the BASELINE correctness bar ("posterior moments match
the reference within MC error on its experiments") must be discharged on
REAL data, not just the synthetic Pima stand-in.  The Wisconsin diagnostic
set ships with scikit-learn (datasets.py provenance note), so this test is
end-to-end real: two structurally different samplers — the paper's
auxiliary slice kernel and the gradient-based aux-NUTS baseline with
dual-averaging warmup — target the same GP-classification pseudo-marginal
posterior over (log_ell, log_sigma) and must agree on posterior means
within combined Monte-Carlo error.

Both kernels are exact for the SAME posterior regardless of S (pseudo-
marginal unbiasedness), so disagreement beyond MC error would expose a
transition-kernel bug rather than estimator noise.
"""

import numpy as np

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.datasets import load
from auxpm_tpu.models.gp_classification import make_gp_classification
from auxpm_tpu.samplers.adaptation import adapt_params, warmup
from auxpm_tpu.samplers.chain import run_chains
from auxpm_tpu.samplers.composite import make_aux_nuts, make_aux_slice
from auxpm_tpu.utils.diagnostics import effective_sample_size


def _moments(theta):
    """Pooled posterior mean and its MC standard error per dimension."""
    ess = np.maximum(effective_sample_size(theta), 4.0)
    flat = np.asarray(theta).reshape(-1, theta.shape[-1])
    return flat.mean(0), flat.std(0) / np.sqrt(ess)


def test_breast_cancer_moment_cross_check():
    x, y = load("breast_cancer", subsample=128, seed=0)
    assert x.shape == (128, 30)
    target = make_gp_classification(x, y, n_importance=32)

    # --- sampler A: the paper's auxiliary slice kernel
    step_a = make_aux_slice(target, n_ess=2)
    states = init_chain_states(jax.random.key(0), target, 24, jitter_scale=0.3)
    params = {
        "ess_u": {},
        "slice_theta": {
            "widths": jnp.full((target.d,), 1.5, jnp.float32),
            "max_step_out": 0,
        },
    }
    for _ in range(3):  # width adaptation + burn-in (untimed protocol)
        states, recs, infos = run_chains(step_a, states, params, 25)
        params = adapt_params(params, recs, infos, width_scale=2.5)
        params["slice_theta"]["max_step_out"] = 0
    _, recs_a, _ = run_chains(step_a, states, params, 300)
    mean_a, se_a = _moments(recs_a["theta"])

    # --- sampler B: gradient-based aux-NUTS with dual-averaging warmup
    step_b = make_aux_nuts(target)
    states_b = init_chain_states(jax.random.key(1), target, 12, jitter_scale=0.3)
    params_b = {"nuts": {"step_size": 0.5}}
    states_b, params_b, _ = warmup(
        lambda t, s, p, n: run_chains(t, s, p, n),
        states_b, params_b, 3, 20, step=step_b,
    )
    _, recs_b, infos_b = run_chains(step_b, states_b, params_b, 150)
    # occasional divergences are rejections (exactness preserved); only a
    # systematic rate would signal a mistuned/incorrect kernel
    div_rate = float(np.asarray(infos_b["nuts/diverged"]).mean())
    assert div_rate < 0.02, div_rate
    mean_b, se_b = _moments(recs_b["theta"])

    se = np.sqrt(se_a**2 + se_b**2)
    assert np.all(np.abs(mean_a - mean_b) < 6.0 * se), (
        mean_a, mean_b, se_a, se_b
    )
    # sanity: the posterior actually moved off the prior mean somewhere
    assert np.any(np.abs(mean_a) > 0.05)
