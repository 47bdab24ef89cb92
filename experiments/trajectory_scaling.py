"""Trajectory scale-up: ATE + pose-graph/BA solve wall-time at 30/100/300
frames (VERDICT round-4 directive 9; BASELINE.json config 4 north-star:
keyframes/map blocks partitioned across the mesh).

Per length N: render a synthetic trajectory, run batched pairwise engine
inference, chain + pose-graph, then time the BA solves — dense Schur and
matrix-free block-Jacobi PCG single-device, plus the shard_map variant
(points sharded over every visible device, camera system psum-reduced
over ICI) — and report sim3 ATE for each path.

Usage:
    python experiments/trajectory_scaling.py \
        --engine experiments/convergence_r4/engine_v2 \
        [--lengths 30,100,300] [--platform cpu] [--shard]
On the dev host, CPU + --shard uses the 8-device virtual mesh
(tests/conftest.py pattern); the TPU path times the single-chip solves.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--engine", default="experiments/convergence_r4/engine_v2")
    ap.add_argument("--lengths", default="30,100,300")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None, choices=("cpu",))
    ap.add_argument("--shard", action="store_true",
                    help="also time BA with the point axis sharded over "
                         "all visible devices (8 virtual CPU devices "
                         "when --platform cpu + "
                         "xla_force_host_platform_device_count)")
    ap.add_argument("--points-per-frame", type=int, default=64)
    ap.add_argument("--robust", default="0.01",
                    help="robust_delta: a float, or 'auto'/'auto:K' "
                         "(per-iteration Huber scale = K x median live "
                         "residual)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    try:
        robust = float(args.robust)
    except ValueError:
        robust = args.robust

    if args.platform:
        import jax

        if args.shard:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", args.platform)
    import glob

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from demon_tpu.data.host_geometry import angleaxis_to_rotation_matrix
    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.models import DEMON_INTRINSICS
    from demon_tpu.sfm.ba import BAProblem, bundle_adjust_sparse
    from demon_tpu.sfm.chaining import (build_ba_problem,
                                        predict_sequence_pairs,
                                        propagate_scales)
    from demon_tpu.sfm.pose_graph import (PoseGraphEdge,
                                          chain_relative_poses,
                                          optimize_pose_graph)
    from demon_tpu.sfm.trajectory import (absolute_trajectory_error,
                                          camera_centers)
    from demon_tpu.tools.converter import load_params
    from demon_tpu.tools.synthetic import write_trajectory_frames

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    params = load_params(args.engine)
    engine = DemonEngine(variant="v2", iterations=3)
    intr = np.asarray(DEMON_INTRINSICS)
    H, W = 192, 256

    rows = []
    for n in (int(x) for x in args.lengths.split(",")):
        frames_dir = f"/tmp/demon_traj_scale_{args.seed}_{n}"
        write_trajectory_frames(frames_dir, n_frames=n, seed=args.seed)
        paths = sorted(glob.glob(os.path.join(frames_dir, "*.png")))
        images = np.stack([
            np.asarray(Image.open(p).convert("RGB").resize(
                (W, H), Image.BILINEAR), np.float32) / 255.0 - 0.5
            for p in paths])
        gt = np.loadtxt(os.path.join(frames_dir, "poses.txt")
                        ).reshape(-1, 3, 4)
        C_gt = camera_centers(gt[:, :, :3], gt[:, :, 3])

        # chunk pairwise inference to bound activation memory at 300
        # frames (one compiled program per distinct chunk size: the full
        # chunk plus at most one tail size per length)
        t0 = time.perf_counter()
        chunk = 32
        parts = []
        for s in range(0, n - 1, chunk):
            e = min(n, s + chunk + 1)
            parts.append(predict_sequence_pairs(engine, params,
                                                images[s:e]))
        preds = {k: np.concatenate([p[k] for p in parts])
                 for k in parts[0]}
        infer_s = time.perf_counter() - t0

        scales = propagate_scales(preds["inv_depth2"], preds["rotation"],
                                  preds["translation"], intr)
        R_rel = np.stack([angleaxis_to_rotation_matrix(aa)
                          for aa in preds["rotation"]])
        t_rel = preds["translation"] * scales[:, None]
        R_init, t_init = chain_relative_poses(
            jnp.asarray(R_rel, jnp.float32), jnp.asarray(t_rel, jnp.float32))
        edges = PoseGraphEdge(
            i=jnp.arange(n - 1, dtype=jnp.int32),
            j=jnp.arange(1, n, dtype=jnp.int32),
            R_ij=jnp.asarray(R_rel, jnp.float32),
            t_ij=jnp.asarray(t_rel, jnp.float32),
            weight=jnp.ones(n - 1, jnp.float32))

        pg = jax.jit(lambda R, t: optimize_pose_graph(R, t, edges,
                                                      iterations=10))
        R_pg, t_pg, _ = pg(R_init, t_init)   # compile
        jax.block_until_ready(t_pg)
        t0 = time.perf_counter()
        R_pg, t_pg, _ = pg(R_init, t_init)
        pg_cost = float(jnp.sum(t_pg))       # fetch fence (axon quirk)
        pg_s = time.perf_counter() - t0
        R_pg = np.asarray(R_pg, np.float64)
        t_pg = np.asarray(t_pg, np.float64)
        ate_pg = float(absolute_trajectory_error(
            camera_centers(R_pg, t_pg), C_gt, with_scale=True))

        points, problem = build_ba_problem(
            preds, R_pg.astype(np.float32), t_pg.astype(np.float32),
            scales, intr, points_per_frame=args.points_per_frame,
            track_length=3)
        R0 = jnp.asarray(R_pg, jnp.float32)
        t0j = jnp.asarray(t_pg, jnp.float32)
        X0 = jnp.asarray(points)
        row = {"frames": n, "points": int(points.shape[0]),
               "infer_s": round(infer_s, 3),
               "pose_graph_s": round(pg_s, 4), "ate_pg": round(ate_pg, 4)}

        for solver in ("dense", "cg"):
            if solver == "dense" and n > 400:
                continue  # [6N,6N] factorization: wrong tool past ~400
            ba = jax.jit(lambda R, t, X, solver=solver:
                         bundle_adjust_sparse(
                             R, t, X, problem, iterations=8,
                             solver=solver, cg_iters=180,
                             robust_delta=robust))
            R_ba, t_ba, X_ba, _ = ba(R0, t0j, X0)  # compile
            jax.block_until_ready(t_ba)
            t0 = time.perf_counter()
            R_ba, t_ba, X_ba, costs = ba(R0, t0j, X0)
            float(jnp.sum(costs))
            ba_s = time.perf_counter() - t0
            ate_ba = float(absolute_trajectory_error(
                camera_centers(np.asarray(R_ba, np.float64),
                               np.asarray(t_ba, np.float64)),
                C_gt, with_scale=True))
            row[f"ba_{solver}_s"] = round(ba_s, 4)
            row[f"ate_ba_{solver}"] = round(ate_ba, 4)

        if args.shard:
            from jax import shard_map
            from jax.sharding import Mesh, PartitionSpec as P

            devs = jax.devices()
            ndev = len(devs)
            mesh = Mesh(np.array(devs), ("pts",))
            m = points.shape[0]
            pad = (-m) % ndev
            cam_p = np.pad(np.asarray(problem.cam_idx), ((0, pad), (0, 0)))
            uv_p = np.pad(np.asarray(problem.uv), ((0, pad), (0, 0), (0, 0)))
            w_p = np.pad(np.asarray(problem.weight), ((0, pad), (0, 0)))
            X_p = np.pad(points, ((0, pad), (0, 0)),
                         constant_values=1.0)  # benign off-axis points

            @jax.jit
            def sharded(R, t, X, cam_idx, uv, w):
                fn = shard_map(
                    lambda R, t, X, c, u, ww: bundle_adjust_sparse(
                        R, t, X, BAProblem(c, u, ww, problem.intrinsics),
                        iterations=8, solver="cg", cg_iters=180,
                        robust_delta=robust, axis_name="pts"),
                    mesh=mesh,
                    in_specs=(P(), P(), P("pts"), P("pts"), P("pts"),
                              P("pts")),
                    out_specs=(P(), P(), P("pts"), P()))
                return fn(R, t, X, cam_idx, uv, w)

            argsj = (R0, t0j, jnp.asarray(X_p), jnp.asarray(cam_p),
                     jnp.asarray(uv_p), jnp.asarray(w_p))
            R_ba, t_ba, X_ba, _ = sharded(*argsj)  # compile
            jax.block_until_ready(t_ba)
            t0 = time.perf_counter()
            R_ba, t_ba, X_ba, costs = sharded(*argsj)
            float(jnp.sum(costs))
            ba_s = time.perf_counter() - t0
            ate_sh = float(absolute_trajectory_error(
                camera_centers(np.asarray(R_ba, np.float64),
                               np.asarray(t_ba, np.float64)),
                C_gt, with_scale=True))
            row["ba_sharded_s"] = round(ba_s, 4)
            row["ate_ba_sharded"] = round(ate_sh, 4)
            row["devices"] = ndev

        rows.append(row)
        print(json.dumps(row), flush=True)

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "trajectory_scaling.json")
    with open(out, "w") as f:
        json.dump({"engine": args.engine, "rows": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
