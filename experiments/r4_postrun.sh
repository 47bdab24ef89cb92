#!/bin/bash
# Post-run pipeline for the round-4 training run (serialized on the one
# chip): export the trained engine, run the per-bin translation-angle
# diagnostic, the trajectory-ATE pipeline, and the edge-metric post-hoc
# eval. Run from the repo root after experiments/convergence_r4 finishes.
set -euxo pipefail

OUT=experiments/convergence_r4
ENGINE=$OUT/engine_v2

# 1. export the 5_refine checkpoint as engine params
python experiments/export_trained_engine.py $OUT/training $ENGINE

# 2. per-bin translation-angle decomposition on the new engine (chip)
python experiments/tran_angle_diagnostic.py --engine $ENGINE \
    --out experiments/tran_angle_bins_r4.json

# 3. post-hoc eval with the full round-4 metric set (edge metrics,
#    normalized EPE) on the held-out test set
python experiments/posthoc_eval.py $OUT/training $OUT/synthetic_test.h5 \
    --evolution 5_refine --out $OUT/posthoc_5refine.json

# 4. trajectory ATE from the new weights (chip)
python examples/trajectory.py --synthetic 30 --variant v2 \
    --weights $ENGINE --ba 2>&1 | tail -5
