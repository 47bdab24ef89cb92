"""Fabricate a release-shaped artifact set for the ingestion drill.

The reference distributes (a) a trained TF checkpoint tarball
(weights/download_weights.sh:1-3 -> demon_original_weights.tgz) and
(b) md5-pinned test-set tarballs (datasets/download_testdata.sh:57,
datasets/testdata.md5). This environment has no egress, so the FULL
ingestion chain — download -> md5 verify -> untar -> tf-bundle read ->
convert -> examples/evaluation.py — is drilled against locally fabricated
artifacts in the real formats:

* a TF bundle checkpoint (tools/tf_bundle.write_tf_checkpoint) holding a
  randomly initialized but structurally exact v1 parameter set (variable
  names = the reference's de-facto weight manifest,
  networks_original.py:44-57), tarred like the release;
* test h5 files in the real multiviH5 schema (tools/synthetic), tarred
  as {ds}_test.tgz;
* an md5 manifest in the shape download_testdata.py verifies against.

Usage:
    python -m demon_tpu.tools.fabricate_release --out-dir /tmp/release \
        --datasets sun3d --scenes 4

Then point the production scripts at it:
    python datasets/download_testdata.py --base-url file:///tmp/release \
        --md5-manifest /tmp/release/manifest.json --datasets sun3d ...
    python weights/download_and_convert_weights.py \
        --url file:///tmp/release/demon_original_weights.tgz ...
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import tarfile
import tempfile

import numpy as np


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def engine_params_to_tf_variables(params: dict) -> dict:
    """Flatten an engine parameter tree into the reference's flat TF
    variable names, inverse-applying the upconv layout conversion so that
    converter.convert_tf_variables round-trips exactly."""
    import jax

    variables = {}
    for section in ("bootstrap", "iterative", "refinement"):
        flat = jax.tree_util.tree_flatten_with_path(
            params[section]["params"])[0]
        for path, leaf in flat:
            names = [p.key for p in path]
            value = np.asarray(leaf, np.float32)
            if (names[-1] == "kernel" and value.ndim == 4
                    and "upconv" in names):
                # inverse of converter.convert_transpose_conv_kernel
                value = np.ascontiguousarray(
                    value.transpose(0, 1, 3, 2)[::-1, ::-1])
            variables["/".join(names)] = value
    return variables


def fabricate_weights_tgz(out_dir: str, seed: int = 0) -> str:
    """Write demon_original_weights.tgz containing a structurally exact
    (randomly initialized) v1 checkpoint in the real TF bundle format."""
    import jax

    from ..engine.inference import DemonEngine
    from .tf_bundle import write_tf_checkpoint

    engine = DemonEngine(variant="v1")
    params = engine.init(jax.random.key(seed))
    variables = engine_params_to_tf_variables(params)

    tgz = os.path.join(out_dir, "demon_original_weights.tgz")
    with tempfile.TemporaryDirectory() as tmp:
        prefix = os.path.join(tmp, "demon_original")
        write_tf_checkpoint(prefix, variables)
        with tarfile.open(tgz, "w:gz") as tar:
            for suffix in (".index", ".data-00000-of-00001"):
                tar.add(prefix + suffix,
                        arcname="demon_original" + suffix)
    print(f"wrote {tgz} ({len(variables)} variables)")
    return tgz


def fabricate_testdata_tgz(out_dir: str, dataset: str, scenes: int = 4,
                           seed: int = 0) -> str:
    """Write {dataset}_test.tgz containing {dataset}_test.h5 in the real
    multiviH5 schema (synthetic scenes stand in for the real captures)."""
    from .synthetic import write_dataset

    tgz = os.path.join(out_dir, f"{dataset}_test.tgz")
    with tempfile.TemporaryDirectory() as tmp:
        h5 = os.path.join(tmp, f"{dataset}_test.h5")
        write_dataset(h5, scenes, seed=seed, style="layered", n_views=2)
        with tarfile.open(tgz, "w:gz") as tar:
            tar.add(h5, arcname=f"{dataset}_test.h5")
        h5_md5 = _md5(h5)
    print(f"wrote {tgz}")
    return tgz, h5_md5


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--datasets", nargs="*", default=["sun3d"])
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    manifest = {"h5": {}, "tgz": {}}
    for ds in args.datasets:
        tgz, h5_md5 = fabricate_testdata_tgz(args.out_dir, ds,
                                             args.scenes, args.seed)
        manifest["tgz"][ds] = _md5(tgz)
        manifest["h5"][ds] = h5_md5
    weights_tgz = fabricate_weights_tgz(args.out_dir, args.seed)
    manifest["weights_tgz"] = _md5(weights_tgz)
    manifest_path = os.path.join(args.out_dir, "manifest.json")
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"manifest at {manifest_path}")


if __name__ == "__main__":
    main()
