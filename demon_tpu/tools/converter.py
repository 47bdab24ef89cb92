"""TF-checkpoint -> demon_tpu weight converter.

The released DeMoN weights are a TF1 Saver checkpoint whose variable names
follow the network scopes (netFlow1/conv1y/kernel, ...; reference
networks_original.py:44-57 — the de-facto weight manifest). Our flax
modules replicate those names, so conversion is a structural re-nesting
plus two layout fixes:

* conv kernels are [kh, kw, in, out] in both TF and flax — copied as-is;
* transpose-conv ('upconv') kernels: TF conv2d_transpose stores
  [kh, kw, out, in] and computes the gradient-of-conv (spatially flipped
  correlation); flax ConvTranspose correlates the kernel directly, so the
  TF kernel is spatially flipped and channel-transposed on conversion
  (validated in tests/test_converter.py against a numpy reference of the
  TF semantics);
* dense kernels are [in, out] in both; the flatten order is preserved by
  models.layers.flatten_nchw (C-major like the reference's NCHW flatten).

Usage:
    python -m demon_tpu.tools.converter --tf-checkpoint weights/demon_original \
        --out weights/demon_tpu_v1

Reads the bundle with the pure-python reader (tools/tf_bundle.py) — no
TensorFlow required. Also accepts an .npz of {var_name: array}.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np

# TF scope -> engine params section
_SCOPE_TO_SECTION = {
    "netFlow1": "bootstrap",
    "netDM1": "bootstrap",
    "netFlow2": "iterative",
    "netDM2": "iterative",
    "netRefine": "refinement",
}


def convert_transpose_conv_kernel(w_tf: np.ndarray) -> np.ndarray:
    """TF conv2d_transpose kernel [kh, kw, out, in] -> flax ConvTranspose
    kernel [kh, kw, in, out] with the spatial flip that maps
    gradient-of-conv onto direct correlation."""
    return np.ascontiguousarray(w_tf[::-1, ::-1].transpose(0, 1, 3, 2))


def convert_tf_variables(variables: Dict[str, np.ndarray]) -> Dict:
    """Nest flat TF variables into the DemonEngine params pytree
    {'bootstrap': {'params': {...}}, 'iterative': ..., 'refinement': ...}.
    """
    params = {"bootstrap": {"params": {}}, "iterative": {"params": {}},
              "refinement": {"params": {}}}
    skipped = []
    for name, value in variables.items():
        parts = name.split("/")
        if parts[0] not in _SCOPE_TO_SECTION:
            skipped.append(name)
            continue
        section = _SCOPE_TO_SECTION[parts[0]]
        leaf_name = parts[-1]
        if leaf_name not in ("kernel", "bias"):
            skipped.append(name)
            continue
        if leaf_name == "kernel" and value.ndim == 4 and "upconv" in parts:
            value = convert_transpose_conv_kernel(value)
        node = params[section]["params"]
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf_name] = np.asarray(value)
    if skipped:
        print(f"skipped {len(skipped)} non-model variables "
              f"(e.g. {skipped[:3]})")
    return params


def verify_against_engine(params: Dict, variant: str = "v1") -> None:
    """Check the converted tree matches the engine's parameter structure
    (missing/extra/shape-mismatched leaves raise)."""
    import jax

    from ..engine.inference import DemonEngine

    engine = DemonEngine(variant=variant)
    expected = engine.init(jax.random.key(0))

    exp_flat = dict(jax.tree_util.tree_flatten_with_path(expected)[0])
    got_flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    exp_keys = {jax.tree_util.keystr(k) for k in exp_flat}
    got_keys = {jax.tree_util.keystr(k) for k in got_flat}
    missing = exp_keys - got_keys
    extra = got_keys - exp_keys
    if missing or extra:
        raise ValueError(f"structure mismatch: missing={sorted(missing)[:5]} "
                         f"extra={sorted(extra)[:5]}")
    for k, v in exp_flat.items():
        g = got_flat[k]
        if tuple(np.shape(g)) != tuple(np.shape(v)):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(k)}: "
                f"{np.shape(g)} vs expected {np.shape(v)}")


def save_params(params: Dict, out_dir: str) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(out_dir), params, force=True)
    ckptr.wait_until_finished()


def load_params(ckpt_dir: str) -> Dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)

    def _upcast(tree):
        # exports may be stored float16/bfloat16 to halve the artifact
        # (export_trained_engine.py --dtype); compute wants fp32
        import jax
        import jax.numpy as jnp

        def up(a):
            arr = np.asarray(a)
            if arr.dtype in (np.dtype(np.float16), jnp.bfloat16.dtype):
                return arr.astype(np.float32)
            return a
        return jax.tree.map(up, tree)

    try:
        return _upcast(ocp.StandardCheckpointer().restore(path))
    except ValueError:
        # the checkpoint was saved on a device type absent here (e.g. a
        # TPU-trained export restored on a CPU host): fall back to a raw
        # numpy restore driven by the saved tree metadata
        import jax

        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path)
        tree = getattr(meta, "item_metadata", meta)
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return _upcast(ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tf-checkpoint", default=None,
                    help="TF checkpoint prefix (…/demon_original)")
    ap.add_argument("--npz", default=None,
                    help=".npz with {tf_var_name: array} instead")
    ap.add_argument("--out", required=True, help="output orbax dir")
    ap.add_argument("--variant", default="v1")
    ap.add_argument("--no-verify", action="store_true")
    args = ap.parse_args()

    if args.tf_checkpoint:
        from .tf_bundle import read_tf_checkpoint

        variables = read_tf_checkpoint(args.tf_checkpoint)
    elif args.npz:
        variables = dict(np.load(args.npz))
    else:
        ap.error("one of --tf-checkpoint / --npz required")

    print(f"read {len(variables)} variables")
    params = convert_tf_variables(variables)
    if not args.no_verify:
        verify_against_engine(params, args.variant)
        print("structure verified against the engine")
    save_params(params, args.out)
    print(f"saved to {args.out}")


if __name__ == "__main__":
    main()
