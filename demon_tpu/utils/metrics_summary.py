"""Summarize training metrics JSONL files — the quick-look counterpart of
the reference's TensorBoard scalars (training.py:553-558 writes
tf.summary; our driver writes metrics.jsonl per evolution).

Usage:
    python -m demon_tpu.utils.metrics_summary TRAIN_DIR [--key total_loss]

Prints, per evolution: step range, first/min/last value of the key, a
unicode sparkline of its trajectory, and the mean samples/s.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

_BARS = "▁▂▃▄▅▆▇█"


def read_jsonl(path: str) -> List[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # torn tail line from a killed run
    return rows


def sparkline(values: List[float], width: int = 48) -> str:
    vals = [v for v in values if v == v]  # drop NaN
    if not vals:
        return ""
    if len(vals) > width:  # bucket-average down to `width`
        n = len(vals)
        vals = [sum(vals[i * n // width : (i + 1) * n // width])
                / max(1, (i + 1) * n // width - i * n // width)
                for i in range(width)]
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or 1.0
    return "".join(_BARS[int((v - lo) / span * (len(_BARS) - 1))]
                   for v in vals)


def summarize(train_dir: str, key: str = "total_loss") -> List[Dict]:
    out = []
    for evo in sorted(os.listdir(train_dir)):
        path = os.path.join(train_dir, evo, "metrics.jsonl")
        if not os.path.isfile(path):
            continue
        rows = read_jsonl(path)
        vals = [r[key] for r in rows if key in r]
        if not vals:
            continue
        steps = [r["step"] for r in rows if key in r]
        rates = [r["samples_per_s"] for r in rows if "samples_per_s" in r]
        out.append({
            "evolution": evo,
            "steps": (steps[0], steps[-1]),
            "first": vals[0], "min": min(vals), "last": vals[-1],
            "sparkline": sparkline(vals),
            "samples_per_s": sum(rates) / len(rates) if rates else None,
        })
    return out


def held_out_table(results: Dict[str, dict]) -> List[str]:
    """Rows of the per-evolution held-out eval table from a
    convergence_results.json mapping (synthetic_convergence.py)."""
    stages = [(k, v) for k, v in results.items()
              if isinstance(v, dict) and not k.startswith("_")]
    if not stages:
        return []
    short = {"flow_epe": "flow_epe", "flow_epe_pct_diag": "epe%diag",
             "flow_epe_rel_gt": "epe/|gt|",
             "depth_l1_inverse": "d_l1inv",
             "depth_sc_inv": "d_scinv", "rot_err_deg": "rot_deg",
             "tran_angle_err_deg": "tran_deg",
             "depth_l1_inverse_refined": "d_l1inv_ref",
             "depth_l1_inverse_edge": "d_l1inv_edge",
             "depth_l1_inverse_refined_edge": "d_l1i_ref_e"}
    cols = [c for c in short if any(c in v for _, v in stages)]
    if not cols:
        return []
    name_w = max(len(k) for k, _ in stages)
    lines = ["held-out eval (convergence_results.json):",
             " " * name_w + "".join(f"  {short[c]:>12s}" for c in cols)]
    for k, v in stages:
        cells = "".join(
            f"  {v[c]:12.4f}" if isinstance(v.get(c), (int, float))
            else f"  {'-':>12s}" for c in cols)
        lines.append(f"{k:{name_w}s}{cells}")
        if isinstance(v.get("ema"), dict):
            cells = "".join(
                f"  {v['ema'][c]:12.4f}"
                if isinstance(v["ema"].get(c), (int, float))
                else f"  {'-':>12s}" for c in cols)
            lines.append(f"{k + ' (ema)':{name_w}s}{cells}"
                         if name_w >= len(k) + 6 else f"{k} (ema){cells}")
    # per-iteration trajectories (the paper's core claim: metrics improve
    # across network iterations) for the stages that recorded them
    for k, v in stages:
        pi = v.get("per_iteration")
        if not isinstance(pi, dict):
            continue
        lines.append(f"{k} per-iteration (bootstrap -> iter3):")
        for c in cols:
            vals = pi.get(c)
            if vals:
                arrow = " -> ".join(f"{x:.3f}" for x in vals)
                lines.append(f"  {short[c]:>12s}: {arrow}")
    return lines


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("train_dir")
    ap.add_argument("--key", default="total_loss")
    args = ap.parse_args()
    rows = summarize(args.train_dir, args.key)
    if not rows:
        # still fall through: a short run may have logged no display
        # lines while its held-out eval json exists
        print(f"no metrics.jsonl rows under {args.train_dir}")
    name_w = max((len(r["evolution"]) for r in rows), default=0)
    for r in rows:
        rate = (f"  {r['samples_per_s']:7.1f} samples/s"
                if r["samples_per_s"] is not None else "")
        print(f"{r['evolution']:{name_w}s}  steps {r['steps'][0]:>6}-"
              f"{r['steps'][1]:<6}  {args.key} {r['first']:10.4f} -> "
              f"{r['last']:10.4f} (min {r['min']:10.4f}){rate}")
        print(f"{'':{name_w}s}  {r['sparkline']}")
    # a convergence harness run keeps its held-out evals next to the
    # train dir — show them too
    results_path = os.path.join(os.path.dirname(
        os.path.abspath(args.train_dir)), "convergence_results.json")
    if os.path.isfile(results_path):
        with open(results_path) as f:
            results = json.load(f)
        print()
        for line in held_out_table(results):
            print(line)


if __name__ == "__main__":
    main()
