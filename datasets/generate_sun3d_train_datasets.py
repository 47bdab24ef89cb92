"""Generate the SUN3D training shards — port of the reference
datasets/generate_sun3d_train_datasets.py:34-162 (multiprocessing over
(baseline range x sequence), then per-baseline-range merge).

Usage:
    python datasets/generate_sun3d_train_datasets.py \
        --sun3d_path /data/sun3d --outputdir training_data
"""

import argparse
import itertools
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# 1cm-10cm ... 1.6m-inf (reference :131)
BASELINE_RANGES = [(0.01, 0.10), (0.10, 0.20), (0.20, 0.40), (0.40, 0.80),
                   (0.80, 1.60), (1.60, float("inf"))]


def create_train_file(outfile, sun3d_data_path, seq_name, baseline_range,
                      seq_sharpness_dict):
    """(reference :34-58)"""
    import h5py

    from demon_tpu.tools.sun3d import create_samples_from_sequence

    with h5py.File(outfile, "w") as f:
        return create_samples_from_sequence(
            f, sun3d_data_path, seq_name, baseline_range,
            seq_sharpness_dict[seq_name])


def merge_h5files(outfile, files):
    """Merge then delete the inputs (reference :61-77)."""
    import h5py

    with h5py.File(outfile, "w") as dst:
        for fpath in files:
            print("copy", fpath, "to", outfile)
            with h5py.File(fpath, "r") as src:
                for group_name in src:
                    src.copy(source=group_name, dest=dst)
    for fpath in files:
        os.remove(fpath)


def main():
    from multiprocessing import Pool

    from demon_tpu.tools.sun3d import compute_sharpness

    ap = argparse.ArgumentParser(
        description="Generates the sun3d training datasets.")
    ap.add_argument("--sun3d_path", type=str, required=True)
    ap.add_argument("--outputdir", type=str, default="training_data")
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--sequences", type=str,
                    default=os.path.join(os.path.dirname(__file__),
                                         "sun3d_train_sequences.txt"))
    args = ap.parse_args()

    os.makedirs(args.outputdir, exist_ok=True)
    with open(args.sequences, "r") as f:
        sequences = f.read().splitlines()

    sharp_cache = "sun3d_seq_sharpness_dict.pkl"
    if os.path.isfile(sharp_cache):
        with open(sharp_cache, "rb") as f:
            seq_sharpness_dict = pickle.load(f)
    else:
        print("Computing sharpness for all images. This could take a while.")
        with Pool(args.threads) as pool:
            scores = pool.starmap(
                compute_sharpness,
                [(args.sun3d_path, seq) for seq in sequences], chunksize=1)
        seq_sharpness_dict = dict(zip(sequences, scores))
        with open(sharp_cache, "wb") as f:
            pickle.dump(seq_sharpness_dict, f)

    with Pool(args.threads) as pool:
        range_files = {b: [] for b in BASELINE_RANGES}
        work = []
        for i, (base_range, seq_name) in enumerate(
                itertools.product(BASELINE_RANGES, sequences)):
            outfile = os.path.join(args.outputdir, f"{i}.h5")
            work.append((outfile, args.sun3d_path, seq_name, base_range,
                         seq_sharpness_dict))
            range_files[base_range].append(outfile)
        created = pool.starmap(create_train_file, work, chunksize=1)

    for base_range in BASELINE_RANGES:
        outfile = os.path.join(
            args.outputdir,
            "sun3d_train_{0}m_to_{1}m.h5".format(*base_range))
        merge_h5files(outfile, range_files[base_range])

    print("created", sum(created), "groups")
    return 0


if __name__ == "__main__":
    sys.exit(main())
