"""Fork evolution 4 from an existing 3_dm2 snapshot and train it for N
steps, then evaluate held-out — the length/data ablation tool.

Round-4 finding this exists to decompose: the 12k-step evo-4 leg on
baseline-biased data REGRESSED the held-out iteration chain (flow EPE
20.7 -> 28.3 across iterations vs 20.7 -> 18.5 at 3_dm2) while its
training loss kept falling. Forking the same snapshot at the round-3
step count (4k) with the same data isolates run length from the data
bias as the cause.

Usage:
    python experiments/evo4_fork.py --out experiments/convergence_r4 \
        --name training_evo4short --steps 4000 \
        [--base-lr 1.5e-4] [--replay recycled]
"""

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True,
                    help="harness out dir (datasets + cache + training/)")
    ap.add_argument("--name", required=True,
                    help="fork train-dir name under --out")
    ap.add_argument("--steps", type=int, required=True)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--batch-iterative", type=int, default=8)
    ap.add_argument("--eval-batch", type=int, default=16)
    ap.add_argument("--base-lr", type=float, default=None,
                    help="override evo-4 base LR (default: reference "
                         "1.5e-4)")
    ap.add_argument("--replay", default="recycled",
                    choices=("recycled", "fresh"))
    ap.add_argument("--from-dir", default="training",
                    help="train dir to fork the snapshot from")
    ap.add_argument("--evolution", default="4_iterative",
                    help="evolution to (re)train in the fork (e.g. "
                         "5_refine to retrain refinement against an "
                         "alternative evo-4 leg)")
    ap.add_argument("--from-evo", default="3_dm2",
                    help="evolution snapshot to fork (the warm-start "
                         "source; 4_iterative when retraining 5_refine)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="train in child processes of at most N steps "
                         "each (resuming from recovery snapshots) — the "
                         "tunneled dev host leaks ~20 MB RSS per step, "
                         "so long in-process legs OOM")
    ap.add_argument("--_until", type=int, default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.chunk and args._until is None:
        # parent: run the training in bounded child processes, then
        # re-exec once more with _until=steps for the final eval
        import subprocess

        done = 0
        while done < args.steps:
            target = min(args.steps, done + args.chunk)
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--out", args.out, "--name", args.name,
                   "--steps", str(args.steps), "--batch", str(args.batch),
                   "--batch-iterative", str(args.batch_iterative),
                   "--replay", args.replay, "--from-dir", args.from_dir,
                   "--evolution", args.evolution,
                   "--from-evo", args.from_evo,
                   "--_until", str(target)]
            if args.base_lr is not None:
                cmd += ["--base-lr", str(args.base_lr)]
            r = subprocess.run(cmd)
            if r.returncode != 0:
                raise SystemExit(
                    f"chunk -> {target} failed (exit {r.returncode})")
            done = target
        # fall through with _until unset: restore + eval in this process

    import dataclasses

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from synthetic_convergence import evaluate_params

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.train.driver import TrainingDriver
    from demon_tpu.train.trainer import EVOLUTIONS, TrainConfig

    # fork the warm-start snapshot
    src = os.path.join(args.out, args.from_dir, args.from_evo)
    dst_dir = os.path.join(args.out, args.name)
    dst = os.path.join(dst_dir, args.from_evo)
    if not os.path.exists(dst):
        os.makedirs(dst_dir, exist_ok=True)
        shutil.copytree(src, dst)

    # sources: the harness's sources.json sidecar is the ground truth for
    # the data mix — the ablation is only valid on the SAME weighted
    # sources the run trained on. The legacy fallback covers the one
    # run recorded before the sidecar existed (convergence_r4, weights
    # 0.10/0.20/0.35/0.35); anything else without a sidecar is an error.
    sidecar = os.path.join(args.out, "sources.json")
    if os.path.isfile(sidecar):
        with open(sidecar) as f:
            sources = json.load(f)
    else:
        bins = sorted(
            f for f in os.listdir(args.out)
            if f.startswith("synthetic_train") and f.endswith(".h5"))
        legacy = {"synthetic_train_bin0.h5": 0.10,
                  "synthetic_train_bin1.h5": 0.20,
                  "synthetic_train_bin2.h5": 0.35,
                  "synthetic_train_bin3.h5": 0.35}
        if set(bins) != set(legacy):
            raise SystemExit(
                f"{sidecar} missing and source layout {bins} does not "
                f"match the known pre-sidecar run — regenerate with the "
                f"current harness to record the data mix")
        sources = [{"path": os.path.join(args.out, b),
                    "weight": [{"t": 0, "v": legacy[b]}]}
                   for b in bins]

    steps_map = dict(zip(EVOLUTIONS, [6000, 5000, 2500, 2500,
                                      12000, 1500]))
    steps_map[args.evolution] = args.steps
    cfg = TrainConfig(batch_size=args.batch,
                      batch_size_iterative=args.batch_iterative,
                      replay_recycled=(args.replay == "recycled"),
                      max_iter=steps_map)
    if args.base_lr is not None:
        lr = dict(cfg.base_lr)
        lr["4_iterative"] = args.base_lr
        cfg = dataclasses.replace(cfg, base_lr=lr)

    driver = TrainingDriver(
        train_dir=dst_dir, sources=sources, config=cfg,
        display_interval=200, saver_interval=100_000,
        recovery_interval=1_000, check_numerics_interval=1_000,
        cache_dir=os.path.join(args.out, "cache"))
    final_loss = None
    if args._until is not None:
        # chunk child: train a bounded leg (resumes from the latest
        # recovery snapshot) and exit without evaluating
        driver.max_steps = args._until
        driver.run_evolution(args.evolution)
        return
    if args.chunk:
        # chunked parent: training already done in children — restore
        from demon_tpu.train.checkpoint import EvolutionCheckpointer

        ck = EvolutionCheckpointer(dst_dir, args.evolution)
        params = ck.restore_params(None)
        ck.close()
    else:
        driver.max_steps = args.steps
        out = driver.run_evolution(args.evolution)
        params = out["params"]
        final_loss = out["metrics"].get("total_loss")

    engine = DemonEngine(variant=cfg.variant, iterations=3)
    test_h5 = os.path.join(args.out, "synthetic_test.h5")
    res = evaluate_params(engine, params, test_h5,
                          batch_size=args.eval_batch)
    res["final_loss"] = final_loss
    res["steps"] = args.steps
    res["replay"] = args.replay
    res["base_lr"] = args.base_lr
    res["evolution"] = args.evolution
    path = os.path.join(dst_dir, f"eval_{args.evolution}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items()
                      if k != "per_iteration"}, indent=1))
    print("per-iteration:")
    for m, vals in res["per_iteration"].items():
        print(" ", m, [round(v, 3) for v in vals])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
