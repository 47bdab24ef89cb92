#!/usr/bin/env python3
"""Synthetic convergence run: train the evolution chain on generated
scenes and measure eval-metric improvement over initialization.

The reference's training artifact needs its multi-GB datasets
(training/README.md); in an egress-less environment this script anchors
the training stack instead: it generates geometrically consistent
synthetic pairs (tools/synthetic.py), runs a shortened evolution chain
with the production TrainingDriver, and evaluates flow-EPE / depth /
motion metrics (eval/metrics.py, the reference protocol's definitions,
examples/evaluation.py:312-321) on a held-out synthetic test set at
init and after each evolution.

Usage:
    python examples/synthetic_convergence.py --out /tmp/demon_conv \
        --train-scenes 600 --test-scenes 64 \
        --steps 3000,2000,1000,1000,1000,1000
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _enable_compilation_cache():
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def engine_params_from_trainer(p):
    return {
        "bootstrap": {"params": {"netFlow1": p["netFlow1"],
                                 "netDM1": p["netDM1"]}},
        "iterative": {"params": {"netFlow2": p["netFlow2"],
                                 "netDM2": p["netDM2"]}},
        "refinement": {"params": {"netRefine": p["netRefine"]}},
    }


def evaluate_params(engine, trainer_params, test_h5, batch_size=16):
    """Run the fused pipeline on the deterministic test reader and compute
    the reference-protocol metrics (flow EPE px, depth L1-inv/sc-inv/
    abs-rel, rotation deg, translation angle deg).

    Metrics are computed at EVERY network iteration (bootstrap + 3
    iterative, each with its own refined depth — engine.predict_eval, the
    reference protocol's iteration axis, examples/evaluation.py:226-257).
    The returned dict carries the final-iteration values at the top level
    (backward compatible) plus a "per_iteration" sub-dict {metric:
    [iter0..iter3]} — the paper's core claim is that these improve with
    iteration."""
    import jax.numpy as jnp

    from demon_tpu.data import MultiViH5DataReader
    from demon_tpu.eval import metrics as M
    from demon_tpu.ops import resize_area, resize_nearest

    params = engine_params_from_trainer(trainer_params)
    reader_params = {
        "batch_size": batch_size,
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
        "top_output": ("IMAGE_PAIR", "MOTION", "FLOW", "DEPTH",
                       "INTRINSICS"),
        "source": [{"path": test_h5, "weight": [{"t": 0, "v": 1.0}]}],
    }
    n_iters = engine.iterations + 1
    rows = [[] for _ in range(n_iters)]
    with MultiViH5DataReader(reader_params) as reader:
        for batch in reader:
            ip = jnp.asarray(batch["IMAGE_PAIR"])
            # image2 at level 2, same area-downsampling the trainer uses
            i22 = resize_area(ip[..., 3:], 48, 64)
            intr = jnp.asarray(batch["INTRINSICS"])
            out = engine.predict_eval(params, ip, i22, intr)
            H, W = 192, 256
            flow_pred = np.asarray(resize_nearest(
                out["flow2"].astype(jnp.float32).reshape((-1,) + out["flow2"].shape[2:]),
                H, W)).reshape((n_iters, -1, H, W, 2))
            flow_pred = flow_pred * np.array([W, H], np.float32)  # px
            depth_pred = np.asarray(resize_nearest(
                out["depth2"].astype(jnp.float32).reshape((-1,) + out["depth2"].shape[2:]),
                H, W)).reshape((n_iters, -1, H, W))
            depth_refined = np.asarray(
                out["depth_refined"].astype(jnp.float32))[..., 0]
            rot = np.asarray(out["rotation"], np.float32)
            tra = np.asarray(out["translation"], np.float32)

            for i in range(ip.shape[0]):
                gt_flow = batch["FLOW"][i]
                gt_depth_inv = batch["DEPTH"][i][..., 0]  # inverse depth
                motion_gt = batch["MOTION"][i]
                gt_ok = np.isfinite(gt_depth_inv) & (gt_depth_inv > 0)

                def depth_metrics(pred_inv, mask=None):
                    ok = gt_ok & np.isfinite(pred_inv) & (pred_inv > 1e-6)
                    if mask is not None:
                        ok = ok & mask
                    if not ok.any():
                        return float("nan"), float("nan"), 0.0
                    dp, gt = 1.0 / pred_inv[ok], 1.0 / gt_depth_inv[ok]
                    return (M.l1_inverse(dp, gt), M.scale_invariant(dp, gt),
                            float(ok.mean()))

                # edge-region mask: the top-decile |grad| pixels of the GT
                # inverse depth (dilated 1 px) — where refinement's full-
                # resolution detail must beat the nearest-upsampled 48x64
                # coarse depth (reference report point evaluation.py:312;
                # VERDICT round-3 weak #2 asks for exactly this metric)
                gd = np.where(gt_ok, gt_depth_inv, np.nan)
                gy, gx = np.gradient(gd)
                gmag = np.hypot(gy, gx)
                finite_g = gmag[np.isfinite(gmag)]
                if finite_g.size:
                    thr = np.percentile(finite_g, 90.0)
                    edge = np.isfinite(gmag) & (gmag >= thr)
                    from scipy.ndimage import binary_dilation

                    edge = binary_dilation(edge, iterations=1)
                else:
                    edge = np.zeros_like(gt_ok)

                # normalization anchors for the raw-pixel EPE (VERDICT
                # round-3 weak #5): the image diagonal (320 px at
                # 192x256) and this sample's mean GT flow magnitude —
                # EPE in px is uninterpretable across synthetic datasets
                diag = float(np.hypot(H, W))
                gt_mag = float(np.nanmean(
                    np.linalg.norm(gt_flow, axis=-1)))
                for it in range(n_iters):
                    epe = M.compute_flow_epe(
                        np.transpose(flow_pred[it, i], (2, 0, 1)),
                        np.transpose(gt_flow, (2, 0, 1)))
                    l1i, sci, frac = depth_metrics(depth_pred[it, i])
                    l1i_r, _, _ = depth_metrics(depth_refined[it, i])
                    l1i_e, _, _ = depth_metrics(depth_pred[it, i], edge)
                    l1i_re, _, _ = depth_metrics(depth_refined[it, i], edge)
                    rot_err, tran_err, tran_ang = M.compute_motion_errors(
                        np.concatenate([rot[it, i], tra[it, i]]),
                        motion_gt, True)
                    rows[it].append({
                        "flow_epe": epe,
                        "flow_epe_pct_diag": 100.0 * epe / diag,
                        # mean over samples of per-sample EPE / mean-|gt|
                        # (a mean of ratios, not a ratio of means);
                        # sub-pixel-motion samples are excluded — the
                        # ratio diverges as |gt| -> 0
                        "flow_epe_rel_gt": epe / gt_mag if gt_mag >= 1.0
                        else float("nan"),
                        "depth_l1_inverse": l1i,
                        "depth_sc_inv": sci,
                        "depth_valid_frac": frac,
                        "depth_l1_inverse_refined": l1i_r,
                        "depth_l1_inverse_edge": l1i_e,
                        "depth_l1_inverse_refined_edge": l1i_re,
                        "rot_err_deg": rot_err,
                        "tran_angle_err_deg": tran_ang,
                    })
    per_iter = {
        k: [float(np.nanmean([r[k] for r in rows[it]]))
            for it in range(n_iters)]
        for k in rows[0][0]
    }
    result = {k: v[-1] for k, v in per_iter.items()}
    result["per_iteration"] = per_iter
    return result


def _parse_baseline_bins(spec: str):
    """Parse 'lo:hi:weight,...' into [(lo, hi, weight)] with validation."""
    bins = []
    for b in spec.split(","):
        parts = b.split(":")
        if len(parts) != 3:
            raise SystemExit(
                f"--baseline-bins entry {b!r} must be lo:hi:weight")
        lo, hi, wt = (float(x) for x in parts)
        if not (0.0 < lo < hi) or wt < 0.0:
            raise SystemExit(
                f"--baseline-bins entry {b!r}: need 0 < lo < hi and "
                f"weight >= 0")
        bins.append((lo, hi, wt))
    if not any(wt > 0 for _, _, wt in bins):
        raise SystemExit("--baseline-bins: all weights are zero")
    return bins


def _train_chunked(args, evo: str, cap: int) -> None:
    """Run `cap` steps of `evo` in child processes of at most
    --steps-per-process steps each (each resumes from the latest
    snapshot), so the per-transfer host-memory leak of the tunneled dev
    platform stays bounded per process."""
    import subprocess

    done = 0
    attempts = 0
    while done < cap:
        target = min(cap, done + args.steps_per_process)
        cmd = [sys.executable, os.path.abspath(__file__),
               "--out", args.out,
               "--train-scenes", str(args.train_scenes),
               "--test-scenes", str(args.test_scenes),
               "--steps", args.steps,
               "--batch", str(args.batch),
               "--batch-iterative", str(args.batch_iterative),
               "--compute-dtype", args.compute_dtype,
               "--baseline", args.baseline,
               "--max-rotation", str(args.max_rotation),
               "--style", args.style,
               "--n-views", str(args.n_views),
               "--ema", str(args.ema),
               "--replay", args.replay,
               "--train-dir-name", args.train_dir_name,
               "--_train-evo", evo,
               "--_train-until", str(target)]
        if not args.scale_schedule:
            cmd.append("--no-scale-schedule")
        if args.baseline_bins:
            cmd += ["--baseline-bins", args.baseline_bins]
        if args.platform:
            cmd += ["--platform", args.platform]
        cmd += ["--seed", str(args.seed)]
        r = subprocess.run(cmd)
        if r.returncode != 0:
            # the tunneled dev platform throws transient RPC errors
            # (remote_compile connection drops); progress is preserved in
            # recovery snapshots, so retrying the same target is safe
            attempts += 1
            if attempts >= 3:
                raise RuntimeError(
                    f"training chunk {evo} -> step {target} failed "
                    f"(exit {r.returncode}) after {attempts} attempts")
            print(f"chunk {evo} -> {target} failed (exit {r.returncode}); "
                  f"retry {attempts}/3 in 60 s", flush=True)
            time.sleep(60)
            continue
        attempts = 0
        done = target


def _last_logged_loss(metrics_path: str):
    last = None
    try:
        with open(metrics_path) as f:
            for line in f:
                if line.strip():
                    last = line
    except OSError:
        return None
    return json.loads(last).get("total_loss") if last else None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--train-scenes", type=int, default=600)
    ap.add_argument("--test-scenes", type=int, default=64)
    ap.add_argument("--steps", default="3000,2000,1000,1000,1000,1000",
                    help="per-evolution step caps (6 comma-separated)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--batch-iterative", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0,
                    help="master seed: train-scene generation, parameter "
                         "init and reader shuffling all derive from it "
                         "(the held-out test set stays at its fixed seed "
                         "so metrics are comparable across seeds)")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="bfloat16 = mixed-precision training (bf16 conv "
                         "stacks, fp32 master weights/losses)")
    ap.add_argument("--baseline", default="0.05,0.25",
                    help="scene baseline range min,max — larger baselines "
                         "condition translation direction better "
                         "(tools/synthetic.py)")
    ap.add_argument("--baseline-bins", default=None,
                    help="baseline-biased pair sampling: comma-separated "
                         "lo:hi:weight bins (e.g. "
                         "'0.08:0.16:0.1,0.16:0.3:0.2,0.3:0.45:0.35,"
                         "0.45:0.7:0.35'). Generates one train h5 per bin "
                         "(--train-scenes split evenly) fed as weighted "
                         "reader sources — the reference's per-baseline-"
                         "range dataset files + add_sources weighting "
                         "(generate_sun3d_train_datasets.py:131-150, "
                         "training.py:96-116). The held-out test set still "
                         "uses --baseline, so headline metrics stay "
                         "comparable across runs.")
    ap.add_argument("--max-rotation", type=float, default=0.08)
    ap.add_argument("--style", default="smooth",
                    choices=("smooth", "layered"),
                    help="scene generator: 'smooth' warped-noise pairs or "
                         "'layered' ray-cast 3D scenes with occlusion, "
                         "depth discontinuities and sharp texture")
    ap.add_argument("--n-views", type=int, default=2,
                    help="cameras per layered scene (pairs multiply via "
                         "viewpoint_pairs)")
    ap.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                    help="maintain a parameter EMA (TrainConfig.ema_decay) "
                         "and evaluate each evolution with the smoothed "
                         "weights (trainer.eval_params)")
    ap.add_argument("--replay", default="recycled",
                    choices=("recycled", "fresh"),
                    help="evolution-4 training mix: 'recycled' = the "
                         "reference's 1 fresh + 3 recycled prediction "
                         "batches; 'fresh' = 4x fresh rows with netDM1 "
                         "prev (ablation, TrainConfig.replay_recycled)")
    ap.add_argument("--scale-schedule", action="store_true", default=True,
                    help="scale TrainConfig.max_iter to the per-evolution "
                         "step caps so the reference LR curve (constant "
                         "1/3 then quadratic decay) and loss-weight ramps "
                         "play out within the run instead of pinning LR at "
                         "its peak for the whole shortened run")
    ap.add_argument("--no-scale-schedule", dest="scale_schedule",
                    action="store_false")
    ap.add_argument("--evo4-ablation", action="store_true",
                    help="after evolution 4, fork from the 3_dm2 snapshot "
                         "and re-train evolution 4 with --replay fresh in "
                         "<out>/training_ablation; record the held-out "
                         "metrics as results['4_iterative_freshmix']")
    ap.add_argument("--train-dir-name", default="training",
                    help=argparse.SUPPRESS)
    ap.add_argument("--steps-per-process", type=int, default=0,
                    help="run training in child processes of at most N "
                         "steps each (resuming from recovery snapshots). "
                         "Bounds the dev tunnel's per-transfer host-memory "
                         "leak (BENCHMARKS.md 'environment quirks'); "
                         "0 = train in-process (production hosts)")
    ap.add_argument("--platform", default=None, choices=("cpu",),
                    help="force a jax platform (smoke tests use cpu; the "
                         "JAX_PLATFORMS env var is pre-claimed by "
                         "sitecustomize on the dev host so only "
                         "jax.config.update works)")
    ap.add_argument("--_train-evo", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_train-until", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--eval-every-evo", action="store_true", default=True)
    ap.add_argument("--stop-after-evo", default=None, metavar="EVO",
                    help="finish after evaluating this evolution (e.g. "
                         "'1_dm1' for bootstrap-only seed checks — the "
                         "bootstrap nets are fully trained after "
                         "evolutions 0+1)")
    args = ap.parse_args()

    _enable_compilation_cache()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from demon_tpu.data.cache import build_scene_cache
    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.tools.synthetic import write_dataset
    from demon_tpu.train.driver import TrainingDriver
    from demon_tpu.train.trainer import EVOLUTIONS, TrainConfig

    os.makedirs(args.out, exist_ok=True)
    steps = [int(s) for s in args.steps.split(",")]
    assert len(steps) == len(EVOLUTIONS)

    print("generating datasets...", flush=True)
    baseline = tuple(float(b) for b in args.baseline.split(","))
    if args.baseline_bins:
        bins = _parse_baseline_bins(args.baseline_bins)
        per_bin = max(1, args.train_scenes // len(bins))
        sources = []
        for i, (lo, hi, wt) in enumerate(bins):
            p = write_dataset(
                os.path.join(args.out, f"synthetic_train_bin{i}.h5"),
                per_bin, seed=100 + 1000 * args.seed + i, verbose=True,
                max_rotation=args.max_rotation, baseline_range=(lo, hi),
                style=args.style, n_views=args.n_views)
            sources.append({"path": p, "weight": [{"t": 0, "v": wt}]})
    else:
        train_h5 = write_dataset(
            os.path.join(args.out, "synthetic_train.h5"),
            args.train_scenes, seed=args.seed, verbose=True,
            max_rotation=args.max_rotation,
            baseline_range=baseline,
            style=args.style, n_views=args.n_views)
        sources = [{"path": train_h5, "weight": [{"t": 0, "v": 1.0}]}]
    test_h5 = write_dataset(os.path.join(args.out, "synthetic_test.h5"),
                            args.test_scenes, seed=777,
                            max_rotation=args.max_rotation,
                            baseline_range=baseline,
                            style=args.style, n_views=args.n_views)
    cache_dir = os.path.join(args.out, "cache")
    for src in sources:
        build_scene_cache(src["path"], cache_dir, 192, 256, verbose=False)
    # sidecar: the exact weighted source list, so fork/ablation tools
    # (experiments/evo4_fork.py) train on the same data mix
    with open(os.path.join(args.out, "sources.json"), "w") as f:
        json.dump(sources, f, indent=1)
    print("datasets ready", flush=True)

    def make_cfg(replay: str) -> TrainConfig:
        cfg = TrainConfig(batch_size=args.batch,
                          batch_size_iterative=args.batch_iterative,
                          compute_dtype=args.compute_dtype,
                          ema_decay=args.ema,
                          replay_recycled=(replay == "recycled"))
        if args.scale_schedule:
            # play the reference schedule *shape* (constant LR for 1/3,
            # quadratic decay to 1e-6; sig-weight ramps; level-5 fade)
            # at the shortened run's actual scale — otherwise every
            # evolution trains at peak LR with no annealing
            cfg = dataclasses.replace(
                cfg, max_iter=dict(zip(EVOLUTIONS, steps)))
        return cfg

    def make_driver(cfg: TrainConfig, train_dir_name: str) -> TrainingDriver:
        return TrainingDriver(
            train_dir=os.path.join(args.out, train_dir_name),
            sources=sources,
            config=cfg,
            display_interval=50,
            saver_interval=100_000,
            recovery_interval=1_000,
            check_numerics_interval=500,
            cache_dir=cache_dir,
            seed=args.seed,
        )

    cfg = make_cfg(args.replay)
    engine = DemonEngine(variant=cfg.variant, iterations=3)
    driver = make_driver(cfg, args.train_dir_name)

    if args._train_evo is not None:
        # child-process mode: train one bounded chunk of one evolution
        # (resumes from the latest recovery snapshot) and exit
        driver.max_steps = args._train_until
        driver.run_evolution(args._train_evo)
        return

    # resume: a relaunch after a transient failure keeps completed evals
    # (training itself resumes from recovery snapshots independently).
    # A config fingerprint guards against silently mixing evaluations
    # from differently-configured runs in one out dir.
    # science keys must match to resume; execution-detail keys
    # (evo4_ablation, steps_per_process) are recorded for provenance but
    # not compared — toggling --evo4-ablation to backfill the fork into a
    # finished run is a supported workflow, and chunking is scientifically
    # neutral
    _science = ("train_scenes", "test_scenes", "steps", "batch",
                "batch_iterative", "seed", "compute_dtype", "baseline",
                "baseline_bins", "max_rotation", "style", "n_views", "ema",
                "replay", "scale_schedule")
    fingerprint = {k: getattr(args, k)
                   for k in _science + ("evo4_ablation",
                                        "steps_per_process")}
    results = {"_config": fingerprint}
    results_path = os.path.join(args.out, "convergence_results.json")
    if os.path.isfile(results_path):
        with open(results_path) as f:
            prior = json.load(f)
        # a results file with no _config predates the guard — refuse to
        # silently adopt it (it could be from any configuration)
        stored = prior.get("_config")
        if stored is None or any(stored.get(k, object()) != fingerprint[k]
                                 for k in _science):
            raise SystemExit(
                f"{results_path} was produced by a different (or "
                f"unrecorded) configuration:\n  stored: {stored}\n  "
                f"now:    {fingerprint}\nuse a fresh --out (or delete "
                f"the results file) instead of mixing runs")
        results.update(prior)
        results["_config"] = fingerprint
        done_evos = [k for k in results
                     if k not in ("init", "wall_hours")
                     and not k.startswith("_")]
        if done_evos:
            print(f"resuming: {done_evos} already evaluated", flush=True)
    t0 = time.time()
    eval_bs = min(args.batch, args.test_scenes)
    if "init" not in results:
        init_params = driver.trainer.init_params(jax.random.key(args.seed))
        print("evaluating at init...", flush=True)
        results["init"] = evaluate_params(engine, init_params, test_h5,
                                          batch_size=eval_bs)
        print(json.dumps(results["init"], indent=1), flush=True)

    def _save():
        with open(os.path.join(args.out, "convergence_results.json"),
                  "w") as f:
            json.dump(results, f, indent=1)

    def train_and_eval(drv, chunk_args, evo, cap):
        """Train one evolution (in-process or chunked) and evaluate the
        held-out metrics with the raw params (plus the EMA shadow when
        --ema is on, recorded under result['ema'])."""
        if args.steps_per_process:
            _train_chunked(chunk_args, evo, cap)
            from demon_tpu.train.checkpoint import EvolutionCheckpointer

            ck = EvolutionCheckpointer(drv.train_dir, evo)
            seed = drv.trainer.init_params(jax.random.key(args.seed))
            if args.ema:
                _, restored = ck.restore(
                    {"params": seed,
                     "opt_state": drv.trainer.init_opt_state(evo, seed)})
                raw = restored["params"]
                ema = drv.trainer.eval_params(restored["params"],
                                              restored["opt_state"])
            else:
                raw, ema = ck.restore_params(seed), None
            ck.close()
            final_loss = _last_logged_loss(
                os.path.join(drv.train_dir, evo, "metrics.jsonl"))
        else:
            drv.max_steps = cap
            out = drv.run_evolution(evo)
            raw = out["params"]
            ema = (drv.trainer.eval_params(out["params"], out["opt_state"])
                   if args.ema else None)
            final_loss = out["metrics"].get("total_loss")
        res = evaluate_params(engine, raw, test_h5, batch_size=eval_bs)
        if ema is not None:
            res["ema"] = evaluate_params(engine, ema, test_h5,
                                         batch_size=eval_bs)
        res["final_loss"] = final_loss
        return res, (ema if ema is not None else raw)

    for evo, cap in zip(EVOLUTIONS, steps):
        if evo in results and not (evo == "4_iterative"
                                   and args.evo4_ablation
                                   and "4_iterative_freshmix" not in results):
            print(f"=== evolution {evo}: already evaluated, skipping ===",
                  flush=True)
            if args.stop_after_evo == evo:
                print(f"--stop-after-evo {evo}: stopping", flush=True)
                break
            continue
        print(f"\n=== evolution {evo} ({cap} steps) ===", flush=True)
        results[evo], params = train_and_eval(driver, args, evo, cap)
        print(json.dumps(results[evo], indent=1), flush=True)
        _save()
        if args.stop_after_evo == evo:
            print(f"--stop-after-evo {evo}: stopping", flush=True)
            break

        if evo == "4_iterative" and args.evo4_ablation:
            # fork: re-train evolution 4 from the same 3_dm2 snapshot with
            # 4x-fresh rows instead of the recycled-prediction mix
            import shutil

            print("\n=== evolution 4_iterative (fresh-mix ablation, "
                  f"{cap} steps) ===", flush=True)
            abl_name = "training_ablation"
            abl_dir = os.path.join(args.out, abl_name)
            src = os.path.join(args.out, args.train_dir_name, "3_dm2")
            dst = os.path.join(abl_dir, "3_dm2")
            if not os.path.exists(dst):
                os.makedirs(abl_dir, exist_ok=True)
                shutil.copytree(src, dst)
            abl_args = argparse.Namespace(**vars(args))
            abl_args.replay = "fresh"
            abl_args.train_dir_name = abl_name
            abl_driver = make_driver(make_cfg("fresh"), abl_name)
            results["4_iterative_freshmix"], _ = train_and_eval(
                abl_driver, abl_args, evo, cap)
            print(json.dumps(results["4_iterative_freshmix"], indent=1),
                  flush=True)
            _save()

    # accumulate across resumed sessions instead of overwriting the real
    # training time with a near-zero fully-resumed pass
    results["wall_hours"] = (results.get("wall_hours", 0.0)
                             + (time.time() - t0) / 3600.0)
    with open(os.path.join(args.out, "convergence_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("\nDONE", json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
