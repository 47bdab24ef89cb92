"""Engine panel comparison: held-out per-iteration metrics + trajectory
ATE (pose graph and +BA) for a list of exported engines — the evidence
behind the shipped-engine choice (VERDICT round-4 directive 2: evaluate
every trained branch end-to-end before choosing; ATE is the natural
scalarization since it consumes flow, motion AND depth).

Usage:
    python experiments/engine_compare.py --platform cpu \
        --test-h5 experiments/convergence_r4/synthetic_test.h5 \
        NAME=PATH [NAME=PATH ...]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("engines", nargs="+", metavar="NAME=PATH")
    ap.add_argument("--test-h5",
                    default="experiments/convergence_r4/synthetic_test.h5")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--platform", default=None, choices=("cpu",))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from PIL import Image

    from synthetic_convergence import evaluate_params

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.sfm.chaining import chain_sequence
    from demon_tpu.sfm.trajectory import (absolute_trajectory_error,
                                          camera_centers)
    from demon_tpu.tools.converter import load_params
    from demon_tpu.tools.synthetic import write_trajectory_frames

    frames_dir = f"/tmp/demon_traj_ate_seed{args.seed}"
    write_trajectory_frames(frames_dir, n_frames=args.frames,
                            seed=args.seed)
    paths = sorted(glob.glob(os.path.join(frames_dir, "*.png")))
    H, W = 192, 256
    images = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((W, H),
                                                       Image.BILINEAR),
                   np.float32) / 255.0 - 0.5 for p in paths])
    gt = np.loadtxt(os.path.join(frames_dir, "poses.txt")).reshape(-1, 3, 4)
    C_gt = camera_centers(gt[:, :, :3], gt[:, :, 3])

    engine = DemonEngine(variant="v2", iterations=3)
    results = {}
    for spec in args.engines:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"engine spec {spec!r} must be NAME=PATH")
        print(f"== {name}: {path}", flush=True)
        params = load_params(path)
        # exported engines use the engine param layout; evaluate_params
        # expects the trainer's flat net map — invert the export mapping
        trainer_like = {
            "netFlow1": params["bootstrap"]["params"]["netFlow1"],
            "netDM1": params["bootstrap"]["params"]["netDM1"],
            "netFlow2": params["iterative"]["params"]["netFlow2"],
            "netDM2": params["iterative"]["params"]["netDM2"],
            "netRefine": params["refinement"]["params"]["netRefine"],
        }
        panel = evaluate_params(engine, trainer_like, args.test_h5,
                                batch_size=args.batch)
        res_pg = chain_sequence(engine, params, images, run_ba=False)
        ate_pg = float(absolute_trajectory_error(
            camera_centers(res_pg["R"], res_pg["t"]), C_gt,
            with_scale=True))
        res_ba = chain_sequence(engine, params, images, run_ba=True)
        ate_ba = float(absolute_trajectory_error(
            camera_centers(res_ba["R"], res_ba["t"]), C_gt,
            with_scale=True))
        row = {"path": path, "panel": panel,
               "ate_pose_graph": round(ate_pg, 4),
               "ate_ba": round(ate_ba, 4),
               "ba_res_before": res_ba.get("ba_res_before"),
               "ba_res_after": res_ba.get("ba_res_after")}
        results[name] = row
        pi = panel["per_iteration"]
        print(json.dumps({
            "name": name,
            "flow_epe_iter": [round(v, 2) for v in pi["flow_epe"]],
            "tran_iter": [round(v, 2)
                          for v in pi["tran_angle_err_deg"]],
            "rot_iter": [round(v, 2) for v in pi["rot_err_deg"]],
            "depth_iter": [round(v, 4) for v in pi["depth_l1_inverse"]],
            "depth_refined3": round(
                pi["depth_l1_inverse_refined"][-1], 4),
            "ate_pg": round(ate_pg, 4), "ate_ba": round(ate_ba, 4),
        }), flush=True)

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "engine_compare.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
