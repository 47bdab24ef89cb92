#!/bin/sh
# Round-5 chip runbook (sequential; one process on the TPU at a time).
# 1) full 6-evolution pipeline on the 6k corpus (data pre-staged,
#    write_dataset skips existing files)
python examples/synthetic_convergence.py --out experiments/convergence_r5 \
  --train-scenes 6000 --test-scenes 64 \
  --steps 6000,5000,2500,2500,12000,7500 --batch 16 --batch-iterative 8 \
  --baseline-bins '0.08:0.16:0.1,0.16:0.3:0.2,0.3:0.45:0.35,0.45:0.7:0.35' \
  --style layered --n-views 4 --seed 0 --steps-per-process 2000
# 2) evo-5 retrain against the round-4 4k evo-4 leg (engine B)
python experiments/evo4_fork.py --out experiments/convergence_r4 \
  --name training_evo5_4k --steps 7500 --chunk 2000 \
  --evolution 5_refine --from-evo 4_iterative --from-dir training_evo4short
# 3) seed checks: bootstrap-only legs on the FIXED 6k corpus (data
#    pre-staged; seed varies init+shuffle only)
for s in 1 2; do
python examples/synthetic_convergence.py \
  --out experiments/convergence_r5_seed$s \
  --train-scenes 6000 --test-scenes 64 \
  --steps 6000,5000,2500,2500,12000,7500 --batch 16 --batch-iterative 8 \
  --baseline-bins '0.08:0.16:0.1,0.16:0.3:0.2,0.3:0.45:0.35,0.45:0.7:0.35' \
  --style layered --n-views 4 --seed $s --steps-per-process 2000 \
  --stop-after-evo 1_dm1
done
