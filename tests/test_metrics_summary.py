"""metrics_summary CLI: JSONL -> per-evolution loss summaries."""

import json
import os

from demon_tpu.utils.metrics_summary import read_jsonl, sparkline, summarize


def test_summarize(tmp_path):
    d = tmp_path / "train" / "0_flow1"
    os.makedirs(d)
    with open(d / "metrics.jsonl", "w") as f:
        for i, loss in enumerate([10.0, 5.0, 2.0, 1.0]):
            f.write(json.dumps({"step": (i + 1) * 50, "total_loss": loss,
                                "samples_per_s": 100.0}) + "\n")
        f.write("{torn line")  # killed-run tail must not break parsing
    rows = summarize(str(tmp_path / "train"))
    assert len(rows) == 1
    r = rows[0]
    assert r["evolution"] == "0_flow1"
    assert r["steps"] == (50, 200)
    assert r["first"] == 10.0 and r["last"] == 1.0 and r["min"] == 1.0
    assert r["samples_per_s"] == 100.0
    assert len(r["sparkline"]) == 4


def test_sparkline_shapes():
    assert sparkline([]) == ""
    assert len(sparkline(list(range(200)), width=48)) == 48
    assert sparkline([1.0, 1.0]) == "▁▁"  # flat series, no div-by-zero


def test_read_jsonl_skips_blank(tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text('{"step": 1}\n\n{"step": 2}\n')
    assert [r["step"] for r in read_jsonl(str(p))] == [1, 2]


def test_held_out_table():
    from demon_tpu.utils.metrics_summary import held_out_table

    results = {
        "init": {"flow_epe": 110.0, "rot_err_deg": 80.0},
        "3_dm2": {"flow_epe": 10.0, "rot_err_deg": 3.0,
                  "final_loss": 44.0},
        "wall_hours": 2.9,  # non-dict entries are skipped
    }
    lines = held_out_table(results)
    assert lines[0].startswith("held-out eval")
    assert any("init" in l and "110.0" in l for l in lines)
    assert any("3_dm2" in l and "3.0" in l for l in lines)
    assert held_out_table({"wall_hours": 1.0}) == []
    assert held_out_table({}) == []
