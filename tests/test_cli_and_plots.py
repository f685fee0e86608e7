"""CLI driver + analysis-figure smoke tests.

The reference's L4/L5 layers are notebooks producing traces/densities
(SURVEY.md §1, §3.5); here the CLI (`python -m auxpm_tpu.run`) and
`utils/plots.py` replace them — these tests run both end-to-end on the toy
preset and check the emitted JSON summary and figure files.
"""

import json
import os

import numpy as np

from auxpm_tpu.run import main as run_main


def test_cli_toy_preset_end_to_end(tmp_path, capsys):
    metrics = tmp_path / "metrics.jsonl"
    plots = tmp_path / "fig"
    rc = run_main(
        [
            "--preset", "toy_pm_mh",
            "--chains", "8",
            "--steps", "200",
            "--window-steps", "50",
            "--warmup-windows", "1",
            "--metrics-path", str(metrics),
            "--plots", str(plots),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["phase"] == "summary"
    assert len(summary["posterior_mean"]) == 2
    assert summary["ess_per_sec"] > 0
    assert all(np.isfinite(summary["posterior_mean"]))
    # JSONL metrics written for warmup + sample windows + summary
    lines = [json.loads(l) for l in metrics.read_text().splitlines()]
    phases = {l["phase"] for l in lines}
    assert {"warmup", "sample", "summary"} <= phases
    # figures on disk
    for suffix in ("trace", "density", "autocorr"):
        p = f"{plots}_{suffix}.png"
        assert os.path.exists(p) and os.path.getsize(p) > 1000, p


def test_cli_list_presets(capsys):
    assert run_main(["--list-presets"]) == 0
    out = capsys.readouterr().out
    for preset in ("toy_pm_mh", "pima_aux_slice", "smc_gp_nuts"):
        assert preset in out
