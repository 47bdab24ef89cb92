#!/bin/bash
# Post-run pipeline for the round-5 full 6-evolution run at 6k-corpus
# scale (experiments/convergence_r5, r5_runbook.sh step 1). Serialized
# on the one chip; run from the repo root after the harness finishes.
set -euxo pipefail

OUT=experiments/convergence_r5
ENGINE=$OUT/engine_6k

# 1. export the trained engine (fp16 storage halves the git artifact;
#    loaders upcast — round-tripped in tests/test_converter.py)
python experiments/export_trained_engine.py $OUT/training $ENGINE \
    --dtype float16

# 2. held-out panel + trajectory ATE vs the shipped round-4 engine —
#    the stated engine-selection scalarization (BENCHMARKS.md
#    "Round-5 run" / VERDICT directive 2)
python experiments/engine_compare.py \
    r4=experiments/convergence_r4/engine_v2 r5_6k=$ENGINE \
    --test-h5 $OUT/synthetic_test.h5 \
    --out experiments/engine_compare_r5.json

# 3. per-bin translation-angle decomposition on the new engine (chip)
python experiments/tran_angle_diagnostic.py --engine $ENGINE \
    --out experiments/tran_angle_bins_r5.json

# 4. trajectory ATE with robust BA from the new weights (chip)
python examples/trajectory.py --synthetic 30 --variant v2 \
    --weights $ENGINE --ba 2>&1 | tail -5
