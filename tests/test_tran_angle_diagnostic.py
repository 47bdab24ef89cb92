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


def test_bootstrap_tran_angle_per_bin_bounds(tmp_path):
    """Regression gate for the round-4 accuracy win: baseline-biased
    sampling brought the bootstrap translation angle into the paper's
    band on in-distribution bins (measured 25.5/23.6/22.4 deg at
    0.16-0.30/0.30-0.45/0.45-0.70, tran_angle_bins_r4.json). Bounds sit
    ~1.5x above the round-4 measurements (sampling noise at 16
    scenes/bin stays inside; a real training regression does not).
    Override with DEMON_TRAN_BIN_MAX (comma-separated degrees)."""
    bins = ["0.16:0.30", "0.30:0.45", "0.45:0.70"]
    bounds = [float(v) for v in os.environ.get(
        "DEMON_TRAN_BIN_MAX", "38,36,34").split(",")]
    out = tmp_path / "bins_gate.json"
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "experiments", "tran_angle_diagnostic.py"),
         "--engine", ARTIFACT, "--bins", ",".join(bins),
         "--platform", "cpu", "--scenes-per-bin", "16", "--batch", "8",
         "--out", str(out)],
        check=True, cwd=REPO, timeout=3600)
    data = json.loads(out.read_text())
    assert len(data["bins"]) == len(bins)
    got = {f"{row['baseline_lo']}:{row['baseline_hi']}":
           row["tran_angle_per_iter"][0] for row in data["bins"]}
    print("bootstrap tran angle per bin:", got)
    for spec, bound in zip(bins, bounds):
        lo, hi = (float(x) for x in spec.split(":"))
        key = f"{lo}:{hi}"
        assert got[key] < bound, (
            f"bin {key}: bootstrap tran angle {got[key]:.1f} deg exceeds "
            f"the regression bound {bound} (round-4 measured ~1.5x less)")
