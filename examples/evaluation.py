"""Full test-set evaluation — port of the reference examples/evaluation.py.

For each dataset (mvs, scenes11, rgbd, sun3d, nyu2):
1. create_ground_truth_file: deterministic reader pass at 640x480
   (unnormalized) + GT flow rendered on device.
2. create_prediction_file: deterministic reader pass at 192x256; one
   jitted program computes all 4 network iterations AND their refinements
   per sample (vs the reference's 8 session.run calls per sample).
3. evaluate -> labeled 5-D array -> JSON; paper metrics printed at
   depth '3_refined' and motion '3'.

Requires the released test datasets (datasets/download_testdata.sh in the
reference repo) — pass their directory with --dataset-dir.
"""

import argparse
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATASETS = ("mvs", "scenes11", "rgbd", "sun3d", "nyu2")


def _make_reader(params, workers=0):
    """Deterministic test reader; workers > 0 parallelizes decode across
    processes with the same exact one-pass coverage and batch order
    (data/mp_reader.py batch-block sharding)."""
    if workers > 0:
        from demon_tpu.data import MultiProcessReader

        return MultiProcessReader(params, workers=workers)
    from demon_tpu.data import MultiViH5DataReader

    return MultiViH5DataReader(params)


def _reader_params(path, height, width, norm):
    return {
        "batch_size": 1,
        "test_phase": True,
        "builder_threads": 1,
        "inverse_depth": True,
        "motion_format": "ANGLEAXIS6",
        "norm_trans_scale_depth": norm,
        "scaled_height": height,
        "scaled_width": width,
        "scene_pool_size": 5,
        "augment_rot180": 0,
        "augment_mirror_x": 0,
        "top_output": ("IMAGE_PAIR", "MOTION", "DEPTH", "INTRINSICS"),
        "source": [{"path": path}],
    }


def create_ground_truth_file(dataset, dataset_dir, out_dir=".",
                             reader_workers=0):
    """(reference evaluation.py:31-118)"""
    import jax.numpy as jnp

    from demon_tpu import ops

    gt_file = os.path.join(out_dir, f"{dataset}_ground_truth.h5")
    if os.path.isfile(gt_file):
        return gt_file
    print(f"creating {gt_file}")

    src = os.path.join(dataset_dir, f"{dataset}_test.h5")
    with _make_reader(_reader_params(src, 480, 640, norm=False),
                      reader_workers) as reader, \
            h5py.File(gt_file, "w") as f:
        for i, batch in enumerate(reader):
            depth = jnp.asarray(batch["DEPTH"])
            intr = jnp.asarray(batch["INTRINSICS"])
            rotation = jnp.asarray(batch["MOTION"][:, :3])
            translation = jnp.asarray(batch["MOTION"][:, 3:])
            flow = ops.depth_to_flow(intr, depth, rotation, translation,
                                     inverse_depth=True, normalize_flow=True)
            g = f.require_group(str(i))
            # NCHW on disk for interop with reference-produced files
            g["image_pair"] = np.transpose(batch["IMAGE_PAIR"][0], (2, 0, 1))
            g["depth"] = np.transpose(batch["DEPTH"][0], (2, 0, 1))
            g["motion"] = batch["MOTION"][0]
            g["flow"] = np.transpose(np.asarray(flow)[0], (2, 0, 1))
            g["intrinsics"] = batch["INTRINSICS"][0]
            g.attrs["sample_id"] = np.bytes_(batch["SAMPLE_IDS"][0].strip())
    return gt_file


def create_prediction_file(dataset, dataset_dir, params, out_dir=".",
                           variant="v1", reader_workers=0):
    """(reference evaluation.py:122-261)"""
    from demon_tpu import ops
    from demon_tpu.engine.inference import DemonEngine

    pr_file = os.path.join(out_dir, f"{dataset}_prediction.h5")
    if os.path.isfile(pr_file):
        return pr_file
    print(f"creating {pr_file}")

    engine = DemonEngine(variant=variant, iterations=3)
    src = os.path.join(dataset_dir, f"{dataset}_test.h5")
    with _make_reader(_reader_params(src, 192, 256, norm=True),
                      reader_workers) as reader, \
            h5py.File(pr_file, "w") as f:
        for i, batch in enumerate(reader):
            image_pair = batch["IMAGE_PAIR"]
            image2 = image_pair[..., 3:]
            image2_2 = np.asarray(ops.recursive_median_downsample(
                np.asarray(image2), 2)[-1])
            intr = batch["INTRINSICS"]
            out = engine.predict_eval(params, image_pair, image2_2, intr)

            g = f.require_group(f"snapshot_1/{i}")
            g.attrs["sample_id"] = np.bytes_(batch["SAMPLE_IDS"][0].strip())
            g["intrinsics"] = intr
            for it in range(4):
                g[f"predicted_flow/{it}"] = np.transpose(
                    np.asarray(out["flow2"])[it, 0], (2, 0, 1))
                g[f"predicted_depth/{it}"] = \
                    np.asarray(out["depth2"])[it, 0, :, :, 0]
                g[f"predicted_motion/{it}"] = np.concatenate([
                    np.asarray(out["rotation"])[it, 0],
                    np.asarray(out["translation"])[it, 0]])
                g[f"predicted_depth/{it}_refined"] = \
                    np.asarray(out["depth_refined"])[it, 0, :, :, 0]
    return pr_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--datasets", nargs="*", default=list(DATASETS))
    ap.add_argument("--variant", default="v1", choices=["v1", "v2"],
                    help="v1 = released-weights architecture; v2 = the "
                         "trainable architecture (evaluate checkpoints "
                         "from the training driver)")
    ap.add_argument("--reader-workers", type=int, default=0,
                    help="decode the test sets with N reader processes "
                         "(exact one-pass coverage and batch order are "
                         "preserved — data/mp_reader.py batch-block "
                         "sharding); 0 = single threaded reader")
    args = ap.parse_args()

    import jax

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.eval import evaluate, read_labeled_array_json, \
        write_labeled_array_json

    engine = DemonEngine(variant=args.variant, iterations=3)
    if args.weights:
        from demon_tpu.tools.converter import load_params

        params = load_params(args.weights)
    else:
        print("WARNING: no --weights given, evaluating a random init")
        params = engine.init(jax.random.key(0))

    for dataset in args.datasets:
        gt_file = create_ground_truth_file(
            dataset, args.dataset_dir, args.out_dir,
            reader_workers=args.reader_workers)
        pr_file = create_prediction_file(
            dataset, args.dataset_dir, params, args.out_dir,
            variant=args.variant, reader_workers=args.reader_workers)
        print("computing errors for", dataset)
        res = evaluate(pr_file, gt_file, depthmask=False,
                       eigen_crop_gt_and_pred=True)
        write_labeled_array_json(
            res, os.path.join(args.out_dir, f"{dataset}_eval_crop_allpix.json"))
        if dataset != "nyu2":
            res = evaluate(pr_file, gt_file, depthmask=True)
            write_labeled_array_json(
                res, os.path.join(args.out_dir, f"{dataset}_eval.json"))

    # print the paper metrics (reference evaluation.py:312-321)
    for dataset in args.datasets:
        print("======================================")
        print("dataset:", dataset)
        depth_errors = ["depth_l1_inverse", "depth_scale_invariant",
                        "depth_abs_relative"]
        motion_errors = ["rot_err", "tran_angle_err"]
        if dataset != "nyu2":
            res = read_labeled_array_json(
                os.path.join(args.out_dir, f"{dataset}_eval.json"))
            snap = res.coords["snapshot"][0]
            for e in depth_errors:
                v = res.sel(snapshot=snap, iteration="3_refined",
                            errors=e).data[:, 0]
                print(f"  depth {e}: {np.nanmean(v):.6f}")
            for e in motion_errors:
                v = res.sel(snapshot=snap, iteration="3", errors=e).data[:, 0]
                print(f"  motion {e}: {np.nanmean(v):.6f}")
        res = read_labeled_array_json(
            os.path.join(args.out_dir, f"{dataset}_eval_crop_allpix.json"))
        snap = res.coords["snapshot"][0]
        v = res.sel(snapshot=snap, iteration="3_refined",
                    errors="depth_scale_invariant").data[:, 0]
        print(f"  depth cropped+all pixels scale_invariant: {np.nanmean(v):.6f}")


if __name__ == "__main__":
    main()
