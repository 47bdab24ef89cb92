"""BA trajectory diagnostic: why does +BA move ATE, and which robustness
knobs pay? Runs the pairwise engine ONCE on the synthetic 30-frame
trajectory, then scans BA configurations (robust delta x gate x conf x
track length x iterations) over the cached predictions, reporting ATE and
per-observation residual stats for each.

The round-4 finding this exists to close (VERDICT round 4, weak #3): +BA
degraded the pose-graph trajectory (0.483 vs 0.467) and no diagnosis
existed. Instrumentation: sfm/ba.py reprojection_residuals.

Usage:
    python experiments/ba_diagnostic.py \
        --engine experiments/convergence_r4/engine_v2 [--frames 30]
        [--platform cpu]
"""

import argparse
import itertools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--engine", default="experiments/convergence_r4/engine_v2")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None, choices=("cpu",))
    ap.add_argument("--out", default=None)
    ap.add_argument("--grid", default="broad", choices=("broad", "focused"),
                    help="broad: robust x gate x conf x L x iters; "
                         "focused: the winning region of the broad scan "
                         "(robust 0.005-0.02, no gate, L=3, 8 iters) x "
                         "motion-edge weight")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from PIL import Image

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.models import DEMON_INTRINSICS
    from demon_tpu.sfm.ba import bundle_adjust_sparse, reprojection_residuals
    from demon_tpu.sfm.chaining import (build_ba_problem,
                                        predict_sequence_pairs,
                                        propagate_scales)
    from demon_tpu.sfm.pose_graph import (PoseGraphEdge,
                                          chain_relative_poses,
                                          optimize_pose_graph)
    from demon_tpu.sfm.trajectory import (absolute_trajectory_error,
                                          camera_centers)
    from demon_tpu.data.host_geometry import angleaxis_to_rotation_matrix
    from demon_tpu.tools.converter import load_params
    from demon_tpu.tools.synthetic import write_trajectory_frames

    import glob

    frames_dir = f"/tmp/demon_traj_ate_seed{args.seed}"
    write_trajectory_frames(frames_dir, n_frames=args.frames, seed=args.seed)
    paths = sorted(glob.glob(os.path.join(frames_dir, "*.png")))
    H, W = 192, 256
    images = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((W, H),
                                                       Image.BILINEAR),
                   np.float32) / 255.0 - 0.5 for p in paths])
    gt = np.loadtxt(os.path.join(frames_dir, "poses.txt")).reshape(-1, 3, 4)
    C_gt = camera_centers(gt[:, :, :3], gt[:, :, 3])

    params = load_params(args.engine)
    engine = DemonEngine(variant="v2", iterations=3)
    print("running pairwise inference...", flush=True)
    preds = predict_sequence_pairs(engine, params, images)
    intr = np.asarray(DEMON_INTRINSICS)
    scales = propagate_scales(preds["inv_depth2"], preds["rotation"],
                              preds["translation"], intr)
    R_rel = np.stack([angleaxis_to_rotation_matrix(aa)
                      for aa in preds["rotation"]])
    t_rel = preds["translation"] * scales[:, None]
    R_init, t_init = chain_relative_poses(
        jnp.asarray(R_rel, jnp.float32), jnp.asarray(t_rel, jnp.float32))
    n = images.shape[0]
    edges = PoseGraphEdge(
        i=jnp.arange(n - 1, dtype=jnp.int32),
        j=jnp.arange(1, n, dtype=jnp.int32),
        R_ij=jnp.asarray(R_rel, jnp.float32),
        t_ij=jnp.asarray(t_rel, jnp.float32),
        weight=jnp.ones(n - 1, jnp.float32))
    R_pg, t_pg, _ = optimize_pose_graph(R_init, t_init, edges,
                                        iterations=10)
    R_pg = np.asarray(R_pg, np.float64)
    t_pg = np.asarray(t_pg, np.float64)

    def ate(R, t):
        return float(absolute_trajectory_error(
            camera_centers(R, t), C_gt, with_scale=True))

    base_ate = ate(R_pg, t_pg)
    print(f"pose-graph ATE {base_ate:.4f}", flush=True)

    results = {"pose_graph_ate": base_ate, "configs": []}
    if args.grid == "broad":
        grid = [(rb, g, c, L, it, 0.0) for rb, g, c, L, it in
                itertools.product(
                    [None, 0.01, 0.02, 0.05],       # robust_delta
                    [None, 0.05, 0.1],              # gate_residual
                    [False, True],                  # conf_weighted
                    [3, 5],                         # track_length
                    [4, 8])]                        # ba_iterations
    else:
        grid = [(rb, None, c, 3, 8, mw) for rb, c, mw in
                itertools.product(
                    [0.005, 0.01, 0.02],
                    [False, True],
                    [0.0, 1.0, 3.0, 10.0, 30.0])]   # motion-edge weight
    from demon_tpu.sfm.pose_graph import PoseGraphEdge as _PGE  # noqa: F401

    for robust, gate, conf, L, iters, motion_w in grid:
        points, problem = build_ba_problem(
            preds, R_pg.astype(np.float32), t_pg.astype(np.float32),
            scales, intr, points_per_frame=64, track_length=L,
            conf_weighted=conf, gate_residual=gate)
        R0 = jnp.asarray(R_pg, jnp.float32)
        t0 = jnp.asarray(t_pg, jnp.float32)
        X0 = jnp.asarray(points)
        res0 = np.asarray(reprojection_residuals(R0, t0, X0, problem))
        live = np.asarray(problem.weight) > 0
        motion = None
        if motion_w > 0:
            motion = edges._replace(
                weight=jnp.full(n - 1, motion_w, jnp.float32))
        R_ba, t_ba, X_ba, costs = jax.jit(
            lambda R, t, X, problem=problem, iters=iters, robust=robust,
            motion=motion:
            bundle_adjust_sparse(R, t, X, problem, iterations=iters,
                                 robust_delta=robust,
                                 motion_edges=motion))(R0, t0, X0)
        res1 = np.asarray(reprojection_residuals(R_ba, t_ba, X_ba, problem))
        row = {
            "robust_delta": robust, "gate": gate, "conf": conf,
            "track_length": L, "iterations": iters,
            "motion_weight": motion_w,
            "ate": ate(np.asarray(R_ba, np.float64),
                       np.asarray(t_ba, np.float64)),
            "live_frac": float(live.mean()),
            "res_before_med": float(np.median(res0[live])) if live.any()
            else None,
            "res_after_med": float(np.median(res1[live])) if live.any()
            else None,
            "res_after_p90": float(np.percentile(res1[live], 90))
            if live.any() else None,
        }
        results["configs"].append(row)
        print(json.dumps(row), flush=True)

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ba_diagnostic.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
