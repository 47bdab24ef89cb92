"""Device-trace analysis: bucket TPU kernel time by category.

Production profiling loop for this framework (the reference has no
profiling story beyond TF timelines): capture a trace with
`jax.profiler.trace(dir)` around the workload, then

    python -m demon_tpu.utils.trace_analysis /tmp/jaxprof [--runs N]

prints device-kernel time bucketed into convolution / gather / fusion
classes with the top kernels of each — the exact loop used to find the
round-2 targets (transpose-conv dilation waste, resize_nearest gathers,
prediction-head lane waste; see BENCHMARKS.md).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Dict, Tuple


def load_trace_events(trace_dir: str):
    """Find the newest *.trace.json.gz under a jax profiler output dir."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def classify(events, runs: int = 1) -> Tuple[float, Dict[str, float],
                                             Dict[str, collections.Counter]]:
    """Returns (total_ms_per_run, {category: ms_per_run}, top kernels)."""
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    cat = collections.defaultdict(float)
    top = collections.defaultdict(collections.Counter)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        n = e.get("name", "")
        if n.startswith("jit_") or n.startswith("while") or n.isdigit():
            # container events (whole-program spans, scan bodies, numbered
            # executable runs), not kernels — their children are counted
            continue
        args = e.get("args", {})
        ln = args.get("long_name", "")
        hc = args.get("hlo_category", "")
        d = e.get("dur", 0)
        total += d
        if "s32[" in ln and "fusion" in n and hc == "custom fusion":
            c = "gather"
        elif "conv" in hc:
            c = "convolution"
        elif "custom-call" in hc or n.startswith("pallas"):
            c = "pallas/custom"
        else:
            c = hc or "other"
        cat[c] += d
        top[c][n] += d
    scale = 1e3 * runs
    return (total / scale,
            {k: v / scale for k, v in cat.items()},
            top)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--runs", type=int, default=1,
                    help="workload repetitions inside the trace window")
    ap.add_argument("--top", type=int, default=5)
    args = ap.parse_args(argv)

    events = load_trace_events(args.trace_dir)
    total, cats, top = classify(events, args.runs)
    print(f"total device kernel time: {total:.2f} ms/run")
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {c:25s} {d:8.2f} ms/run  {100 * d / max(total, 1e-9):5.1f}%")
    for c in sorted(cats, key=lambda k: -cats[k])[:4]:
        print(f"--- top {c} ---")
        for n, d in top[c].most_common(args.top):
            print(f"  {d / 1e3 / args.runs:7.2f} ms/run  {n}")


if __name__ == "__main__":
    main()
