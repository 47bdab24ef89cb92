"""Parallel synthetic-corpus generator: N baseline-binned h5 sources,
sharded so generation parallelizes across processes and the reader can
consume each bin as a ';'-joined multi-file source.

The reference's analog: six baseline-range SUN3D shards built by a
multiprocessing pool (generate_sun3d_train_datasets.py:82-155). Round-5
use: stage the 60k-scene corpus (10x corpus6k) that the off-policy-drift
result says the prediction-recycling evolution needs (VERDICT round 4,
next-round #8).

Usage:
    python experiments/generate_corpus.py --out experiments/corpus60k \
        --scenes-per-bin 15000 --shards-per-bin 8 --procs 3 [--cache]

Writes <out>/bin{i}_shard{j}.h5 and <out>/sources.json (per-bin weighted
sources with ';'-joined shard paths, reader-ready). Idempotent per shard
(tools/synthetic.write_dataset skips existing files).
"""

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the round-4/5 training mix (examples/synthetic_convergence.py
# --baseline-bins '0.08:0.16:0.1,0.16:0.3:0.2,0.3:0.45:0.35,0.45:0.7:0.35')
BINS = ((0.08, 0.16, 0.10), (0.16, 0.30, 0.20),
        (0.30, 0.45, 0.35), (0.45, 0.70, 0.35))


def _gen_shard(job):
    out, i, j, scenes, seed, lo, hi = job
    from demon_tpu.tools.synthetic import write_dataset

    path = os.path.join(out, f"bin{i}_shard{j}.h5")
    t0 = time.time()
    write_dataset(path, scenes, seed=seed, baseline_range=(lo, hi),
                  max_rotation=0.08, style="layered", n_views=4)
    return path, time.time() - t0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scenes-per-bin", type=int, default=15000)
    ap.add_argument("--shards-per-bin", type=int, default=8)
    ap.add_argument("--procs", type=int, default=3)
    ap.add_argument("--seed-base", type=int, default=50_000,
                    help="shard seeds = seed-base + bin*1000 + shard "
                         "(disjoint from the harness's 100+1000*seed+i "
                         "and corpus6k seeds)")
    ap.add_argument("--cache", action="store_true",
                    help="also build the pre-decoded reader cache per "
                         "shard (data/cache.py)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    jobs = []
    per_shard = args.scenes_per_bin // args.shards_per_bin
    for i, (lo, hi, _) in enumerate(BINS):
        for j in range(args.shards_per_bin):
            jobs.append((args.out, i, j, per_shard,
                         args.seed_base + i * 1000 + j, lo, hi))

    print(f"{len(jobs)} shards x {per_shard} scenes, {args.procs} procs",
          flush=True)
    t0 = time.time()
    with mp.get_context("spawn").Pool(args.procs) as pool:
        for k, (path, dt) in enumerate(pool.imap_unordered(_gen_shard,
                                                           jobs)):
            print(f"[{k + 1}/{len(jobs)}] {os.path.basename(path)} "
                  f"({dt:.0f}s, total {time.time() - t0:.0f}s)",
                  flush=True)

    sources = []
    for i, (lo, hi, w) in enumerate(BINS):
        paths = ";".join(
            os.path.join(args.out, f"bin{i}_shard{j}.h5")
            for j in range(args.shards_per_bin))
        sources.append({"path": paths, "weight": [{"t": 0, "v": w}]})
    with open(os.path.join(args.out, "sources.json"), "w") as f:
        json.dump(sources, f, indent=1)
    print(f"wrote {args.out}/sources.json", flush=True)

    if args.cache:
        from demon_tpu.data.cache import build_scene_cache

        cache_dir = os.path.join(args.out, "cache")
        for src in sources:
            build_scene_cache(src["path"], cache_dir, 192, 256,
                              verbose=False)
            print(f"cached {src['path'].split(';')[0]} ...", flush=True)
    print(f"DONE in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
