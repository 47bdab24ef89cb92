"""Export a trained evolution checkpoint as engine inference params.

Takes the latest snapshot of one evolution from a training dir (the
convergence harness's layout) and writes an orbax checkpoint in the
layout `examples/{example,trajectory}.py --weights` load — the bridge
from the training driver's artifact to the inference/serving stack
(the analog of the reference's released `demon_original` checkpoint,
weights/download_weights.sh).

Usage:
    python experiments/export_trained_engine.py TRAIN_DIR OUT_DIR \
        [--evolution 5_refine]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("train_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--evolution", default="5_refine")
    ap.add_argument("--dtype", default=None,
                    choices=("float32", "float16", "bfloat16"),
                    help="cast exported params (float16 halves the "
                         "artifact; loaders upcast to fp32 — advisor "
                         "round-4: stop doubling the git pack per round)")
    args = ap.parse_args()

    from demon_tpu.tools.converter import save_params
    from demon_tpu.train.checkpoint import EvolutionCheckpointer

    def engine_params_from_trainer(p):
        # trainer net names -> engine param groups
        # (examples/synthetic_convergence.py keeps the same mapping)
        return {
            "bootstrap": {"params": {"netFlow1": p["netFlow1"],
                                     "netDM1": p["netDM1"]}},
            "iterative": {"params": {"netFlow2": p["netFlow2"],
                                     "netDM2": p["netDM2"]}},
            "refinement": {"params": {"netRefine": p["netRefine"]}},
        }

    ck = EvolutionCheckpointer(args.train_dir, args.evolution)
    step = ck.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoint for {args.evolution} "
                         f"under {args.train_dir}")
    trained = ck.restore_params(None)  # untyped restore: params subtree
    ck.close()
    params = engine_params_from_trainer(trained)
    if args.dtype:
        import jax
        import jax.numpy as jnp
        import numpy as np

        dt = jnp.dtype(args.dtype)
        params = jax.tree.map(
            lambda a: np.asarray(a).astype(dt)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
            params)
    save_params(params, args.out_dir)
    print(f"exported {args.evolution}@{step} -> {args.out_dir}"
          + (f" ({args.dtype})" if args.dtype else ""))


if __name__ == "__main__":
    main()
