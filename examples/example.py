"""Two-view inference on the sculpture pair — the port of the reference
examples/example.py, with the 5 host round trips (bootstrap, 3x iterative,
refine; reference example.py:87-99) fused into ONE jitted TPU program.

Usage: python examples/example.py [--weights CKPT_DIR] [--export-ply PREFIX]

Without --weights the network runs with random initialization (the
released TF checkpoint can be converted with
`python -m demon_tpu.tools.converter`).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# sample assets shipped with the repo (the reference distributes the
# same sculpture pair as example data)
REF_EXAMPLES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image1", default=os.path.join(REF_EXAMPLES, "sculpture1.png"))
    ap.add_argument("--image2", default=os.path.join(REF_EXAMPLES, "sculpture2.png"))
    ap.add_argument("--weights", default=None,
                    help="orbax checkpoint dir produced by the converter")
    ap.add_argument("--export-ply", default="prediction_",
                    help="output prefix for the PLY point cloud")
    ap.add_argument("--variant", default="v1", choices=("v1", "v2"),
                    help="v1 = released-weights architecture, v2 = "
                         "trainable architecture (reference example_v2.py)")
    args = ap.parse_args()

    import jax
    from PIL import Image

    from demon_tpu.engine.inference import DemonEngine, prepare_input_pair
    from demon_tpu.vis import export_prediction_to_ply

    if os.path.exists(args.image1) and os.path.exists(args.image2):
        img1 = np.asarray(Image.open(args.image1).convert("RGB"))
        img2 = np.asarray(Image.open(args.image2).convert("RGB"))
    else:
        # self-contained fallback: a geometrically consistent synthetic
        # two-view scene (tools/synthetic.py) so the example runs without
        # any external assets
        print("sample images not found - generating a synthetic pair")
        from demon_tpu.tools.synthetic import make_scene

        v1, v2 = make_scene(np.random.RandomState(0))
        img1, img2 = v1.image, v2.image
    inputs = prepare_input_pair(img1, img2)

    engine = DemonEngine(variant=args.variant, iterations=3)
    if args.weights:
        from demon_tpu.tools.converter import load_params

        params = load_params(args.weights)
    else:
        print("WARNING: no --weights given, running with random init")
        params = engine.init(jax.random.key(0))

    out = engine.predict(params, inputs["image_pair"], inputs["image2_2"])
    depth = np.asarray(out.depth_refined)[0, ..., 0]
    rotation = np.asarray(out.prediction.rotation)[0]
    translation = np.asarray(out.prediction.translation)[0]
    print("rotation (angle-axis):", rotation)
    print("translation:", translation)
    print("inverse depth stats: min=%.4f mean=%.4f max=%.4f"
          % (np.nanmin(depth), np.nanmean(depth), np.nanmax(depth)))

    if args.export_ply:
        export_prediction_to_ply(
            args.export_ply, depth, rotation=rotation,
            translation=translation,
            image=np.asarray(inputs["image1"])[0])
        print(f"point cloud written to {args.export_ply}points.ply")


if __name__ == "__main__":
    main()
