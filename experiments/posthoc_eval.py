"""Post-hoc held-out evaluation of a training-dir checkpoint with the
harness's CURRENT metric set.

The convergence harness evaluates with the code it was launched with; a
metric added mid-run (e.g. the edge-region depth L1-inv that measures
what refinement buys on depth discontinuities) can be backfilled for any
evolution's latest snapshot with this script — same reader, same engine
path, same evaluate_params as the harness.

Usage:
    python experiments/posthoc_eval.py TRAIN_DIR TEST_H5 \
        [--evolution 5_refine] [--variant v2] [--batch 16] \
        [--out results.json] [--platform cpu]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("train_dir",
                    help="training dir (harness layout) OR, with "
                         "--engine, an exported engine checkpoint "
                         "(experiments/export_trained_engine.py)")
    ap.add_argument("test_h5")
    ap.add_argument("--engine", action="store_true",
                    help="treat TRAIN_DIR as an exported engine "
                         "checkpoint instead of a training dir")
    ap.add_argument("--evolution", default="5_refine")
    ap.add_argument("--variant", default="v2", choices=("v1", "v2"))
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None, choices=("cpu",))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache_dir = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from synthetic_convergence import evaluate_params

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.train.checkpoint import EvolutionCheckpointer

    if args.engine:
        from demon_tpu.tools.converter import load_params

        ep = load_params(args.train_dir)
        trained = {
            "netFlow1": ep["bootstrap"]["params"]["netFlow1"],
            "netDM1": ep["bootstrap"]["params"]["netDM1"],
            "netFlow2": ep["iterative"]["params"]["netFlow2"],
            "netDM2": ep["iterative"]["params"]["netDM2"],
            "netRefine": ep["refinement"]["params"]["netRefine"],
        }
        step = -1
    else:
        ck = EvolutionCheckpointer(args.train_dir, args.evolution)
        step = ck.latest_step()
        if step is None:
            raise SystemExit(f"no checkpoint for {args.evolution} under "
                             f"{args.train_dir}")
        trained = ck.restore_params(None)
        ck.close()

    engine = DemonEngine(variant=args.variant, iterations=3)
    res = evaluate_params(engine, trained, args.test_h5,
                          batch_size=args.batch)
    res["evolution"] = args.evolution
    res["step"] = int(step)
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
