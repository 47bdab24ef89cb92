"""Download and MD5-verify the released DeMoN training datasets
(sun3d, rgbd_bugfix, mvs, scenes11) — replaces the reference's
download_traindata.sh; hashes from datasets/traindata/traindata.md5.

The training data builds on SUN3D, the TUM RGB-D benchmark (CC-BY 3.0),
ShapeNet and MVE scenes — cite the original sources.
"""

import argparse
import hashlib
import os
import sys
import tarfile
import urllib.request

BASE_URL = "https://lmb.informatik.uni-freiburg.de/data/demon/traindata"
DATASETS = ("sun3d", "rgbd_bugfix", "mvs", "scenes11")

MD5_TGZ = {
    "mvs": "a981ec421da35df09225e875ce7531f8",
    "scenes11": "2cc58de179d11a5fa88f3a67edb0a5d2",
    "sun3d": "a77e1a5159258fadc0216e647fa21f33",
    "rgbd_bugfix": "3975c81540462d7ba009190381f2d88b",
}
# per-extracted-file manifest (subset that is not commented out in the
# reference manifest)
MD5_H5 = {
    "mvs_achteck_turm.h5": "d968ca0fa1785d57559469fdcb476121",
    "mvs_breisach.h5": "34818891c3b6ae66c90badc9a24ed015",
    "mvs_citywall.h5": "b3af67b01725f3cd99d6cebad08857e9",
    "rgbd_10_to_20_simple_train.h5": "a316f02a84abe42ccb6a1d5450ac4bf1",
    "rgbd_20_to_inf_simple_train.h5": "0ee80f4b7450bbaa4df59854b73ca770",
    "scenes11_train.h5": "2e07e7b76a4e39254dd046cfe6754fe7",
    "sun3d_train_0.01m_to_0.1m.h5": "ab1190b58350ed3f39b4d5e2966fb45c",
    "sun3d_train_0.1m_to_0.2m.h5": "d72b646f474559e7338a65c2199da544",
    "sun3d_train_0.2m_to_0.4m.h5": "d31bbefcffbfd795d2a19193ab61478f",
    "sun3d_train_0.4m_to_0.8m.h5": "8aeaae77e38f6493e52a0a0a7bcac8e3",
    "sun3d_train_0.8m_to_1.6m.h5": "6e872b0fec5cd5a404e25c034e1c9322",
    "sun3d_train_1.6m_to_infm.h5": "0d306ed5e6e4e4dcb5371b4c0c132e6a",
    "rgbd_bugfix_10_to_20_3d_train.h5": "3c8111feb0eebe50b5068c4a71ac6a28",
    "rgbd_bugfix_10_to_20_handheld_train.h5": "2c02bd33e6e5a7550ef5abe8eee1609e",
    "rgbd_bugfix_20_to_inf_3d_train.h5": "286c2b2bee520a427f347e848660636a",
    "rgbd_bugfix_20_to_inf_handheld_train.h5": "9a1907607af8d7543b99df33ae4d4733",
}


def md5sum(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir",
                    default=os.path.join(os.path.dirname(__file__) or ".",
                                         "traindata"))
    ap.add_argument("--datasets", nargs="*", default=list(DATASETS))
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    for ds in args.datasets:
        tgz = os.path.join(args.out_dir, f"{ds}_train.tgz")
        if not (os.path.isfile(tgz) and md5sum(tgz) == MD5_TGZ[ds]):
            url = f"{BASE_URL}/{ds}_train.tgz"
            print(f"downloading {url} (this is large)")
            urllib.request.urlretrieve(url, tgz)
            if md5sum(tgz) != MD5_TGZ[ds]:
                print(f"ERROR: {tgz} failed md5 verification")
                return 1
        print(f"extracting {tgz}")
        with tarfile.open(tgz) as tar:
            tar.extractall(args.out_dir)
    bad = []
    for name, want in MD5_H5.items():
        path = os.path.join(args.out_dir, name)
        if os.path.isfile(path) and md5sum(path) != want:
            bad.append(name)
    if bad:
        print("ERROR: extracted files failed verification:", bad)
        return 1
    print("training data ready")
    return 0


if __name__ == "__main__":
    sys.exit(main())
