"""Chain a directory of sequential frames into a camera trajectory:
batched pairwise DeMoN inference -> scale propagation -> pose graph.

Usage: python examples/trajectory.py --frames dir_of_images/ \
    [--weights CKPT] [--export-ply PREFIX] [--gt poses.txt]

--gt expects an Nx12 text file of world-to-cam [R|t] rows for ATE.

No assets needed: `--synthetic N` renders an N-frame ray-cast scene
trajectory (tools/synthetic.py) into --frames (default /tmp) with its
ground-truth poses and evaluates ATE against them.
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--export-ply", default=None)
    ap.add_argument("--gt", default=None)
    ap.add_argument("--synthetic", type=int, default=None, metavar="N",
                    help="render an N-frame synthetic trajectory with GT "
                         "poses into --frames (tools/synthetic.py) and "
                         "report ATE against it")
    ap.add_argument("--seed", type=int, default=0,
                    help="scene seed for --synthetic")
    ap.add_argument("--variant", default="v1", choices=["v1", "v2"],
                    help="v1 for the released/converted weights, v2 for "
                         "checkpoints from the training driver")
    ap.add_argument("--ba-track-length", type=int, default=3,
                    help="flow-chained BA track length (cameras per point)")
    ap.add_argument("--ba", action="store_true",
                    help="run bundle adjustment after the pose graph")
    ap.add_argument("--ba-robust-delta", type=float, default=0.01,
                    help="IRLS Huber scale (normalized coords); 0 = plain "
                         "least squares")
    ap.add_argument("--ba-motion-weight", type=float, default=0.0,
                    help="fold the pairwise motion measurements into the "
                         "BA normal equations with this edge weight "
                         "(joint reprojection+motion backend)")
    ap.add_argument("--ba-iterations", type=int, default=8)
    args = ap.parse_args()

    if args.synthetic:
        from demon_tpu.tools.synthetic import write_trajectory_frames

        args.frames = args.frames or f"/tmp/demon_traj_{args.seed}"
        print(f"rendering {args.synthetic}-frame synthetic trajectory "
              f"into {args.frames} ...", flush=True)
        write_trajectory_frames(args.frames, n_frames=args.synthetic,
                                seed=args.seed)
        args.gt = args.gt or os.path.join(args.frames, "poses.txt")
    elif not args.frames:
        ap.error("--frames is required (or use --synthetic N)")

    import jax
    from PIL import Image

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.sfm.chaining import chain_sequence
    from demon_tpu.sfm.trajectory import absolute_trajectory_error, camera_centers

    paths = sorted(
        p for ext in ("*.png", "*.jpg", "*.jpeg")
        for p in glob.glob(os.path.join(args.frames, ext)))
    if len(paths) < 2:
        raise SystemExit(f"need >= 2 frames in {args.frames}")
    H, W = DemonEngine.HEIGHT, DemonEngine.WIDTH
    images = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((W, H),
                                                       Image.BILINEAR),
                   np.float32) / 255.0 - 0.5
        for p in paths])
    print(f"{len(paths)} frames")

    engine = DemonEngine(variant=args.variant, iterations=3)
    if args.weights:
        from demon_tpu.tools.converter import load_params

        params = load_params(args.weights)
    else:
        print("WARNING: no --weights given, running with random init")
        params = engine.init(jax.random.key(0))

    result = chain_sequence(engine, params, images, run_ba=args.ba,
                            ba_track_length=args.ba_track_length,
                            ba_iterations=args.ba_iterations,
                            ba_robust_delta=(args.ba_robust_delta or None),
                            ba_motion_weight=args.ba_motion_weight)
    if args.ba:
        print("BA residuals before/after:", result["ba_res_before"],
              result["ba_res_after"])
    C = camera_centers(result["R"], result["t"])
    print("trajectory length:",
          float(np.linalg.norm(np.diff(C, axis=0), axis=1).sum()))
    print("pose-graph cost:", result["pose_graph_costs"][-1])

    if args.gt:
        gt = np.loadtxt(args.gt).reshape(-1, 3, 4)
        C_gt = camera_centers(gt[:, :, :3], gt[:, :, 3])
        ate = absolute_trajectory_error(C, C_gt, with_scale=True)
        print(f"ATE (sim3-aligned): {ate:.4f}")

    if args.export_ply:
        from demon_tpu.vis import camera_mesh, write_ply

        verts_all, tris_all = [], []
        for k in range(len(C)):
            v, t = camera_mesh(result["R"][k], result["t"][k], scale=0.1)
            tris_all.append(t + len(verts_all) * 11)
            verts_all.append(v)
        write_ply(args.export_ply + "trajectory.ply",
                  np.concatenate(verts_all), faces=np.concatenate(tris_all))
        print(f"wrote {args.export_ply}trajectory.ply")


if __name__ == "__main__":
    main()
