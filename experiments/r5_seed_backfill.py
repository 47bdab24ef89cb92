"""Backfill the round-5 bootstrap seed-check table (BENCHMARKS.md).

Reads convergence_results.json from one or more seed run dirs (the
full-length evo-0/1 bootstrap legs, `--stop-after-evo 1_dm1`) and
prints the bootstrap metrics: the iteration-0 entries of the 1_dm1
held-out eval — i.e. what the bootstrap nets alone produce before any
iterative refinement. Seed 0's reference values are the round-4 main
run (experiments/convergence_r4).

Usage:
  python experiments/r5_seed_backfill.py \
      experiments/convergence_r5_seed1 [more dirs...]
"""

import json
import os
import sys

REF = "experiments/convergence_r4"
METRICS = ("tran_angle_err_deg", "flow_epe", "rot_err_deg",
           "depth_l1_inverse")


def bootstrap_row(out_dir):
    path = os.path.join(out_dir, "convergence_results.json")
    with open(path) as f:
        results = json.load(f)
    evo = results.get("1_dm1")
    if evo is None:
        return None
    per = evo["per_iteration"]
    return {m: per[m][0] for m in METRICS}


def main():
    dirs = sys.argv[1:] or ["experiments/convergence_r5_seed1",
                            "experiments/convergence_r5_seed2"]
    rows = {"seed0 (r4 main)": bootstrap_row(REF)}
    for d in dirs:
        try:
            rows[os.path.basename(d.rstrip("/"))] = bootstrap_row(d)
        except FileNotFoundError:
            rows[os.path.basename(d.rstrip("/"))] = None
    header = "| bootstrap (after 1_dm1) | " + " | ".join(rows) + " |"
    print(header)
    print("|" + "---|" * (len(rows) + 1))
    for m in METRICS:
        cells = []
        for row in rows.values():
            cells.append(f"{row[m]:.2f}" if row else "pending")
        print(f"| {m} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
