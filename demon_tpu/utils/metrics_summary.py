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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("train_dir")
    ap.add_argument("--key", default="total_loss")
    args = ap.parse_args()
    rows = summarize(args.train_dir, args.key)
    if not rows:
        print(f"no metrics.jsonl under {args.train_dir}")
        return
    name_w = max(len(r["evolution"]) for r in rows)
    for r in rows:
        rate = (f"  {r['samples_per_s']:7.1f} samples/s"
                if r["samples_per_s"] is not None else "")
        print(f"{r['evolution']:{name_w}s}  steps {r['steps'][0]:>6}-"
              f"{r['steps'][1]:<6}  {args.key} {r['first']:10.4f} -> "
              f"{r['last']:10.4f} (min {r['min']:10.4f}){rate}")
        print(f"{'':{name_w}s}  {r['sparkline']}")


if __name__ == "__main__":
    main()
