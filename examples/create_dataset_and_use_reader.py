"""Write a two-view dataset in the multi-view h5 format and read it back
through the threaded reader — port of the reference
examples/create_dataset_and_use_readerop.py:22-101, doubling as the
reader integration example.
"""

import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# sample assets shipped with the repo (the reference distributes the
# same sculpture pair as example data)
REF_EXAMPLES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
NORMALIZED_INTRINSICS = [0.89115971, 1.18821287, 0.5, 0.5]


def main():
    from PIL import Image

    from demon_tpu.data import MultiViH5DataReader, View, write_view

    # -- write the dataset -------------------------------------------------
    with h5py.File("dataset.h5", "w") as f:
        for i in range(2):
            img = np.asarray(Image.open(
                os.path.join(REF_EXAMPLES, f"sculpture{i + 1}.png")).convert("RGB"))
            Rt = np.loadtxt(os.path.join(REF_EXAMPLES, f"sculpture_Rt{i + 1}.txt"))
            depth = np.load(os.path.join(REF_EXAMPLES,
                                         f"sculpture_depth{i + 1}.npy"))
            h, w = img.shape[:2]
            K = np.eye(3)
            K[0, 0] = NORMALIZED_INTRINSICS[0] * w
            K[1, 1] = NORMALIZED_INTRINSICS[1] * h
            K[0, 2] = NORMALIZED_INTRINSICS[2] * w
            K[1, 2] = NORMALIZED_INTRINSICS[3] * h
            view = View(R=Rt[:, :3], t=Rt[:, 3], K=K, image=img,
                        depth=depth.astype(np.float32), depth_metric="camera_z")
            write_view(f.require_group(f"sculpture/frames/t0/v{i}"), view)
        f["sculpture/frames/t0"].attrs["viewpoint_pairs"] = \
            np.array([0, 1, 1, 0], np.int32)

    # -- read it back ------------------------------------------------------
    reader_params = {
        "batch_size": 1,
        "test_phase": False,
        "builder_threads": 1,
        "inverse_depth": True,
        "motion_format": "ANGLEAXIS6",
        "norm_trans_scale_depth": True,
        "scaled_height": 96,
        "scaled_width": 128,
        "scene_pool_size": 5,
        "augment_rot180": 0,
        "augment_mirror_x": 0,
        "top_output": ("IMAGE_PAIR", "MOTION", "DEPTH", "INTRINSICS"),
        "source": [{"path": "dataset.h5", "weight": [{"t": 0, "v": 1.0}]}],
    }
    with MultiViH5DataReader(reader_params) as reader:
        batch = reader.get_batch(timeout=60)

    print("IMAGE_PAIR", batch["IMAGE_PAIR"].shape)
    print("MOTION    ", batch["MOTION"][0])
    print("DEPTH     ", batch["DEPTH"].shape,
          "finite:", np.isfinite(batch["DEPTH"]).mean())
    print("INTRINSICS", batch["INTRINSICS"][0])
    print("sample id ", batch["SAMPLE_IDS"][0])

    # visualize as a point cloud (PLY export; VTK viewer if installed)
    from demon_tpu.vis import visualize_prediction

    visualize_prediction(
        inverse_depth=batch["DEPTH"][0, ..., 0],
        image=batch["IMAGE_PAIR"][0, ..., :3],
        rotation=batch["MOTION"][0, :3],
        translation=batch["MOTION"][0, 3:])


if __name__ == "__main__":
    main()
