"""Multi-process jax.distributed bring-up test (VERDICT r3 item 4).

Target 2 (BASELINE.json:5) is 1 host -> N>=2 hosts; real pods are
unreachable here, but the part most likely to break on one — process
bring-up, the cross-process mesh, shard_map execution and psum ACROSS the
process boundary — is testable today: spawn 2 local processes with 4
virtual CPU devices each (tests/mp_worker.py), run distributed_init
(require=True) + one sharded aux-slice window + psum'd adaptation-style
reductions, and assert the replicated global statistics match the
single-process 8-device run of the identical computation.

Chains are bitwise-identical across shardings by construction (DP chains
never communicate; trajectories are pure functions of the initial state),
so any mismatch beyond psum reduction-order noise is a cross-process
sharding bug.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp

from auxpm_tpu.core.state import init_chain_states
from auxpm_tpu.models.gaussian_toy import make_gaussian_toy
from auxpm_tpu.samplers.chain import run_chains
from auxpm_tpu.samplers.composite import make_aux_slice

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_matches_single_process(tmp_path):
    nproc = 2
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs, outs = [], []
    for pid in range(nproc):
        out = tmp_path / f"stats_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port),
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    results = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, f"worker failed:\nstdout:{so}\nstderr:{se}"

    stats = [json.loads(out.read_text()) for out in outs]
    for st in stats:
        assert st["process_count"] == nproc
        assert st["device_count"] == 8

    # psum results must be REPLICATED: every process sees identical values
    np.testing.assert_array_equal(stats[0]["theta_sum"],
                                  stats[1]["theta_sum"])
    assert stats[0]["ll_sum"] == stats[1]["ll_sum"]
    assert stats[0]["n_probe_sum"] == stats[1]["n_probe_sum"]

    # identical computation, single process (this pytest process has 8
    # virtual devices): per-chain trajectories are bitwise equal, so the
    # global sums agree up to f32 reduction-order noise.
    target = make_gaussian_toy(n_importance=16)
    states = init_chain_states(jax.random.key(0), target, 16,
                               jitter_scale=0.3)
    step = make_aux_slice(target)
    _, recs, infos = run_chains(step, states,
                                {"slice_theta": {"widths": 2.0}}, 20)
    want_sum = np.asarray(jnp.sum(recs["theta"], axis=(0, 1)))
    want_sq = np.asarray(jnp.sum(recs["theta"] ** 2, axis=(0, 1)))
    want_ll = float(jnp.sum(recs["log_lik_hat"]))
    want_np = float(jnp.sum(infos["slice_theta/n_probe"]))

    got = stats[0]
    np.testing.assert_allclose(got["theta_sum"], want_sum,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got["theta_sq_sum"], want_sq,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got["ll_sum"], want_ll, rtol=1e-5, atol=1e-3)
    assert got["n_probe_sum"] == want_np  # integer-valued: exact
