"""Why is translation angle the weak metric? Bin it by baseline.

Translation direction is the classic two-view degeneracy: as the
baseline/depth ratio -> 0 the epipolar geometry degenerates and the
direction of t becomes unobservable (the reference's data recipe
counters this by filtering SUN3D pairs for sufficient baseline,
datasets/generate_sun3d_train_datasets.py knn/baseline thresholds).
Our layered-run held-out tran_angle_err of 32.5 deg (BENCHMARKS.md
round-3 run) is a single average over baselines drawn U(0.08, 0.45)
against depths 1.0-7.0 — this script decomposes it.

For each baseline bin it renders held-out layered scenes whose pair
baseline is confined to the bin (same generator, held-out seeds), runs
the trained engine (the layered-run 5_refine export) through the full
bootstrap + 3-iteration chain, and reports per-iteration translation
angle / rotation error per bin.

Usage (chip or CPU):
    python experiments/tran_angle_diagnostic.py \
        [--engine experiments/convergence_layered/engine_v2] \
        [--scenes-per-bin 24] [--out experiments/tran_angle_bins.json]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BINS = ((0.04, 0.08), (0.08, 0.16), (0.16, 0.30), (0.30, 0.45),
        (0.45, 0.70))


def _bin_seed(lo: float, hi: float) -> int:
    """Deterministic scene seed for a bin, derived from its BOUNDS (not
    its position in a possibly-subset --bins list), so a subset rerun
    evaluates the same scenes as the same bin in the full run. Canonical
    BINS keep the full run's historical seeds 9000+index."""
    for i, b in enumerate(BINS):
        if b == (lo, hi):
            return 9000 + i
    # non-canonical bins: hash the exact bounds so distinct bins can't
    # collide (the old round(lo*100)*100 + round(hi*100) arithmetic
    # mapped e.g. 0.05:0.10 and 0.04:1.10 to the same seed and truncated
    # bounds finer than 0.01)
    import hashlib

    digest = hashlib.sha1(f"{lo!r}:{hi!r}".encode()).digest()
    return 10_000 + int.from_bytes(digest[:4], "big") % 1_000_000


def _parse_bins(spec: str):
    bins = []
    for b in spec.split(","):
        parts = b.split(":")
        if len(parts) != 2:
            raise argparse.ArgumentTypeError(
                f"--bins entry {b!r} must be lo:hi")
        try:
            lo, hi = float(parts[0]), float(parts[1])
        except ValueError:
            raise argparse.ArgumentTypeError(
                f"--bins entry {b!r}: bounds must be floats")
        if not lo < hi:
            raise argparse.ArgumentTypeError(
                f"--bins entry {b!r}: need lo < hi")
        bins.append((lo, hi))
    return tuple(bins)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--engine",
                    default=os.path.join(os.path.dirname(__file__),
                                         "convergence_r4", "engine_v2"),
                    help="exported engine checkpoint (default: the "
                         "round-4 biased-sampling artifact; the round-3 "
                         "table tran_angle_bins.json came from "
                         "convergence_layered/engine_v2)")
    # test phase requires scenes % batch == 0 (1 pair/scene at n_views=2)
    ap.add_argument("--scenes-per-bin", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-rotation", type=float, default=0.08)
    ap.add_argument("--out",
                    default=os.path.join(os.path.dirname(__file__),
                                         "tran_angle_bins.json"))
    ap.add_argument("--bins", default=None, type=_parse_bins,
                    help="override bins: comma-separated lo:hi pairs, "
                         "e.g. '0.16:0.30,0.30:0.45' (scene seeds derive "
                         "from the bounds, so subset reruns reproduce the "
                         "full run's numbers)")
    # the JAX_PLATFORMS env var is pre-claimed by sitecustomize on the
    # dev host — forcing CPU needs jax.config.update before any jax use
    ap.add_argument("--platform", default=None,
                    choices=("cpu",),
                    help="force a jax platform (tests use cpu)")
    args = ap.parse_args()

    bins = args.bins if args.bins else BINS

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from demon_tpu.data import MultiViH5DataReader
    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.eval import metrics as M
    from demon_tpu.ops import resize_area
    from demon_tpu.tools.converter import load_params
    from demon_tpu.tools.synthetic import write_dataset

    engine = DemonEngine(variant="v2", iterations=3)
    params = load_params(args.engine)
    n_iters = engine.iterations + 1

    tmp_ctx = tempfile.TemporaryDirectory(prefix="tran_bins_")
    tmpdir = tmp_ctx.name
    results = []
    for bi, (lo, hi) in enumerate(bins):
        h5 = write_dataset(
            os.path.join(tmpdir, f"bin{bi}.h5"), args.scenes_per_bin,
            # held out: train seed 0, test seed 777; derived from the bin
            # BOUNDS so --bins subsets reproduce the full run
            seed=_bin_seed(lo, hi),
            max_rotation=args.max_rotation, baseline_range=(lo, hi),
            style="layered", n_views=2)
        reader_params = {
            "batch_size": args.batch,
            "test_phase": True,
            "builder_threads": 1,
            "inverse_depth": True,
            "motion_format": "ANGLEAXIS6",
            "norm_trans_scale_depth": True,
            "scaled_height": 192,
            "scaled_width": 256,
            "scene_pool_size": 4,
            "augment_rot180": 0,
            "augment_mirror_x": 0,
            "top_output": ("IMAGE_PAIR", "MOTION", "INTRINSICS"),
            "source": [{"path": h5, "weight": [{"t": 0, "v": 1.0}]}],
        }
        tran = [[] for _ in range(n_iters)]
        rot = [[] for _ in range(n_iters)]
        with MultiViH5DataReader(reader_params) as reader:
            for batch in reader:
                ip = jnp.asarray(batch["IMAGE_PAIR"])
                i22 = resize_area(ip[..., 3:], 48, 64)
                intr = jnp.asarray(batch["INTRINSICS"])
                out = engine.predict_eval(params, ip, i22, intr)
                r = np.asarray(out["rotation"], np.float32)
                t = np.asarray(out["translation"], np.float32)
                for i in range(ip.shape[0]):
                    for it in range(n_iters):
                        re_, _, ta = M.compute_motion_errors(
                            np.concatenate([r[it, i], t[it, i]]),
                            batch["MOTION"][i], True)
                        rot[it].append(re_)
                        tran[it].append(ta)
        # at n_views=2 the deterministic test phase serves exactly one
        # pair per scene — a short read would silently skew the stats
        if len(tran[0]) != args.scenes_per_bin:
            raise RuntimeError(
                f"bin [{lo},{hi}): reader produced {len(tran[0])} pairs, "
                f"expected {args.scenes_per_bin}")
        n_nan = int(sum(np.isnan(tran[it]).sum() for it in range(n_iters)))
        if n_nan:
            print(f"  WARNING bin [{lo},{hi}): {n_nan} NaN translation "
                  f"angles dropped from the averages", flush=True)
        row = {
            "baseline_lo": lo, "baseline_hi": hi,
            "n_pairs": len(tran[0]),
            "n_nan_tran": n_nan,
            "tran_angle_per_iter": [float(np.nanmean(tran[it]))
                                    for it in range(n_iters)],
            "tran_angle_median_final": float(np.nanmedian(tran[-1])),
            "rot_err_per_iter": [float(np.nanmean(rot[it]))
                                 for it in range(n_iters)],
        }
        results.append(row)
        print(f"baseline [{lo:.2f},{hi:.2f}) n={row['n_pairs']}: "
              f"tran " + " -> ".join(
                  f"{v:.1f}" for v in row["tran_angle_per_iter"]) +
              f" deg (median final {row['tran_angle_median_final']:.1f}), "
              f"rot final {row['rot_err_per_iter'][-1]:.2f} deg",
              flush=True)

    with open(args.out, "w") as f:
        json.dump({"bins": results, "engine": args.engine,
                   "scenes_per_bin": args.scenes_per_bin}, f, indent=1)
    print(f"wrote {args.out}")
    tmp_ctx.cleanup()


if __name__ == "__main__":
    main()
