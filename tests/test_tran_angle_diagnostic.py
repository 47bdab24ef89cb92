"""Smoke test for the translation-angle-by-baseline diagnostic
(experiments/tran_angle_diagnostic.py) — the analysis behind the
BENCHMARKS.md "Translation-angle decomposition" table.

Gated like tests/test_trajectory_ate.py: runs only when
DEMON_TRAINED_ENGINE points at an exported engine checkpoint
(experiments/export_trained_engine.py), since a random-weight engine
would make the angle statistics meaningless.
"""

import json
import os
import subprocess
import sys

import pytest

ARTIFACT = os.environ.get("DEMON_TRAINED_ENGINE")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not (ARTIFACT and os.path.isdir(ARTIFACT)),
    reason="set DEMON_TRAINED_ENGINE to an exported trained engine "
           "checkpoint (experiments/export_trained_engine.py)")


def test_single_bin_smoke(tmp_path):
    out = tmp_path / "bins.json"
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "experiments", "tran_angle_diagnostic.py"),
         "--engine", ARTIFACT, "--bins", "0.30:0.45", "--platform", "cpu",
         "--scenes-per-bin", "8", "--batch", "8", "--out", str(out)],
        check=True, cwd=REPO, timeout=1800)
    data = json.loads(out.read_text())
    assert len(data["bins"]) == 1
    row = data["bins"][0]
    assert row["n_pairs"] == 8
    assert len(row["tran_angle_per_iter"]) == 4
    # trained engine on the best-conditioned in-distribution bin: all
    # iterations should beat chance (90 deg for a random direction);
    # the round-3 full run measured 20.7 -> 27.1 deg here
    for v in row["tran_angle_per_iter"]:
        assert 0.0 < v < 80.0
    for v in row["rot_err_per_iter"]:
        assert 0.0 < v < 30.0
