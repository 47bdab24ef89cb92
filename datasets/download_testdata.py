"""Download and MD5-verify the released DeMoN test datasets
(mvs, scenes11, rgbd, sun3d, nyu2) from the LMB Freiburg server.

Replaces the reference's download_testdata.sh; verification hashes match
the reference's testdata.md5 manifest.

The test data is provided for research purposes only and builds on SUN3D,
the TUM RGB-D benchmark (CC-BY 3.0), ShapeNet, COLMAP datasets and NYU
Depth v2 — cite the original sources when publishing results.
"""

import argparse
import hashlib
import os
import sys
import tarfile
import urllib.request

BASE_URL = "https://lmb.informatik.uni-freiburg.de/data/demon/testdata"
DATASETS = ("mvs", "scenes11", "rgbd", "sun3d", "nyu2")

# from the reference datasets/testdata.md5 manifest
MD5_H5 = {
    "mvs": "f42e0ffd1243274a2fcee1ea5137176c",
    "nyu2": "25f8f3749341b193ce507889bde122b7",
    "rgbd": "56393d4d56acb189c5b5e698dc8ec0ae",
    "scenes11": "cf9314cb4229967bb9978e7e900c1a50",
    "sun3d": "8d9d742497b6c3928bcab2f1ff14f32c",
}
MD5_TGZ = {
    "mvs": "7b427e0b45c7e8c5a74a3ce8c96de407",
    "nyu2": "6d67223a13a013dff2730612e950d191",
    "rgbd": "c94d735e99fa2c9e8f83d357db96f347",
    "scenes11": "d8d3df17400b7e763c8aaa0f3b81963d",
    "sun3d": "30ee9c8861c4439e04fec7405a4e0c8d",
}


def md5sum(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default=os.path.dirname(__file__) or ".")
    ap.add_argument("--datasets", nargs="*", default=list(DATASETS))
    ap.add_argument("--base-url", default=BASE_URL,
                    help="override the release server (file:// URLs work "
                         "— used by the ingestion drill, "
                         "tests/test_release_drill.py)")
    ap.add_argument("--md5-manifest", default=None,
                    help="JSON file {'h5': {ds: md5}, 'tgz': {ds: md5}} "
                         "overriding the pinned release hashes (drill only "
                         "— production downloads verify against the "
                         "reference's testdata.md5 manifest)")
    args = ap.parse_args()

    md5_h5, md5_tgz = MD5_H5, MD5_TGZ
    if args.md5_manifest:
        import json

        with open(args.md5_manifest) as f:
            manifest = json.load(f)
        md5_h5, md5_tgz = manifest["h5"], manifest["tgz"]

    for ds in args.datasets:
        h5_path = os.path.join(args.out_dir, f"{ds}_test.h5")
        if os.path.isfile(h5_path) and md5sum(h5_path) == md5_h5[ds]:
            print(f"{ds}_test.h5 present and verified")
            continue
        tgz_path = os.path.join(args.out_dir, f"{ds}_test.tgz")
        if not (os.path.isfile(tgz_path)
                and md5sum(tgz_path) == md5_tgz[ds]):
            url = f"{args.base_url}/{ds}_test.tgz"
            print(f"downloading {url}")
            urllib.request.urlretrieve(url, tgz_path)
            got = md5sum(tgz_path)
            if got != md5_tgz[ds]:
                print(f"ERROR: {tgz_path} md5 {got} != {md5_tgz[ds]}")
                return 1
        print(f"extracting {tgz_path}")
        with tarfile.open(tgz_path) as tar:
            tar.extractall(args.out_dir)
        if md5sum(h5_path) != md5_h5[ds]:
            print(f"ERROR: extracted {h5_path} failed verification")
            return 1
        print(f"{ds}_test.h5 ready")
    return 0


if __name__ == "__main__":
    sys.exit(main())
