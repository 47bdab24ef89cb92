"""Download the released DeMoN TF checkpoint and convert it to the
demon_tpu orbax format in one step (replaces weights/download_weights.sh
+ requires no TensorFlow; see demon_tpu/tools/converter.py).
"""

import argparse
import os
import sys
import tarfile
import urllib.request

URL = ("https://lmb.informatik.uni-freiburg.de/people/ummenhof/"
       "depthmotionnet/demon_original_weights.tgz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default=os.path.dirname(__file__) or ".")
    ap.add_argument("--converted", default=None,
                    help="output orbax dir (default <out-dir>/demon_tpu_v1)")
    ap.add_argument("--url", default=URL,
                    help="override the release URL (file:// works — used "
                         "by the ingestion drill, tests/test_release_drill.py)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    tgz = os.path.join(args.out_dir, "demon_original_weights.tgz")
    prefix = os.path.join(args.out_dir, "demon_original")
    if not os.path.isfile(prefix + ".index"):
        if not os.path.isfile(tgz):
            print(f"downloading {args.url}")
            urllib.request.urlretrieve(args.url, tgz)
        print(f"extracting {tgz}")
        with tarfile.open(tgz) as tar:
            tar.extractall(args.out_dir)

    from demon_tpu.tools.converter import (
        convert_tf_variables, save_params, verify_against_engine)
    from demon_tpu.tools.tf_bundle import read_tf_checkpoint

    variables = read_tf_checkpoint(prefix)
    print(f"read {len(variables)} variables from {prefix}")
    params = convert_tf_variables(variables)
    verify_against_engine(params, "v1")
    out = args.converted or os.path.join(args.out_dir, "demon_tpu_v1")
    save_params(params, out)
    print(f"converted weights saved to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
