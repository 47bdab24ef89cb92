"""SUN3D dataset ingestion -> multi-view h5 training shards.

Port of the reference dataset_tools/sun3d_utils.py:32-234: sharp-frame
non-maximum suppression, baseline/view-angle filters, 50%-valid-depth
check, bidirectional depth-consistency via reprojection, and group writing
with the `viewpoint_pairs` attribute.
"""

from __future__ import annotations

import itertools
import math
import os
from typing import Sequence, Tuple

import numpy as np

from ..data.view import View
from ..data.view_io import write_view
from .helpers import measure_sharpness
from .view_tools import check_depth_consistency


def read_frameid_timestamp(files: Sequence[str]):
    """Parse '<frameid>-<timestamp>.<ext>' sun3d filenames
    (reference sun3d_utils.py:32-47)."""
    frameids, timestamps = [], []
    for f in files:
        a, b = f[:-4].split("-")
        frameids.append(int(a))
        timestamps.append(int(b))
    return np.asarray(frameids), np.asarray(timestamps)


def read_image(filename: str):
    from PIL import Image

    image = Image.open(filename)
    image.load()
    return image


def read_depth(filename: str) -> np.ndarray:
    """SUN3D 16-bit depth png: 3-bit circular shift decode, millimeters
    (reference sun3d_utils.py:60-72)."""
    from PIL import Image

    depth_uint16 = np.array(Image.open(filename)).astype(np.uint16)
    depth_shifted = (depth_uint16 >> 3) | (depth_uint16 << 13)
    return (depth_shifted / 1000.0).astype(np.float32)


def read_Rt(extrinsics: np.ndarray, frame: int):
    """SUN3D stores cam-to-world [R|C] stacked per frame; return
    world-to-cam (R, t) (reference sun3d_utils.py:74-88)."""
    Rt = extrinsics[3 * frame : 3 * frame + 3]
    R = Rt[:, :3].T
    t = -R @ Rt[:, 3]
    return R, t


def compute_sharpness(sun3d_data_path: str, seq_name: str) -> np.ndarray:
    """Sharpness (variance of Laplacian) of every image in a sequence
    (reference sun3d_utils.py:91-109)."""
    seq_path = os.path.join(sun3d_data_path, seq_name)
    image_files = sorted(
        f for f in os.listdir(os.path.join(seq_path, "image"))
        if f.endswith(".jpg"))
    return np.asarray([
        measure_sharpness(read_image(os.path.join(seq_path, "image", f)))
        for f in image_files])


def create_samples_from_sequence(h5file, sun3d_data_path: str, seq_name: str,
                                 baseline_range: Tuple[float, float],
                                 sharpness: np.ndarray,
                                 sharpness_window: int = 30,
                                 max_views_num: int = 10) -> int:
    """Write sample groups for one sequence; returns the group count
    (reference sun3d_utils.py:112-234)."""
    from scipy.ndimage import maximum_filter1d

    seq_path = os.path.join(sun3d_data_path, seq_name)
    group_prefix = seq_name.replace("/", ".")
    if not os.path.exists(os.path.join(seq_path, "extrinsics")):
        return 0

    image_files = sorted(f for f in os.listdir(os.path.join(seq_path, "image"))
                         if f.endswith(".jpg"))
    depth_files = sorted(f for f in os.listdir(
        os.path.join(seq_path, "depthTSDF")) if f.endswith(".png"))
    extrinsics_files = sorted(f for f in os.listdir(
        os.path.join(seq_path, "extrinsics")) if f.endswith(".txt"))

    intrinsics = np.loadtxt(os.path.join(seq_path, "intrinsics.txt"))
    extrinsics = np.loadtxt(
        os.path.join(seq_path, "extrinsics", extrinsics_files[-1]))

    img_ids, img_timestamps = read_frameid_timestamp(image_files)
    _, depth_timestamps = read_frameid_timestamp(depth_files)
    idx_img2depth = [int(np.argmin(np.abs(depth_timestamps - ts)))
                     for ts in img_timestamps]

    # sharp frames by non-maximum suppression (reference :161-164)
    assert sharpness.size == len(image_files)
    sharp_max = maximum_filter1d(np.asarray(sharpness),
                                 size=sharpness_window, mode="constant",
                                 cval=0)
    sharp_idx = np.where(sharpness == sharp_max)[0]

    generated = 0
    used_views = set()
    for i1, frame_idx1 in enumerate(sharp_idx):
        if i1 in used_views:
            continue
        R1, t1 = read_Rt(extrinsics, frame_idx1)
        depth1 = read_depth(os.path.join(
            seq_path, "depthTSDF", depth_files[idx_img2depth[frame_idx1]]))
        if np.count_nonzero(np.isfinite(depth1) & (depth1 > 0)) < 0.5 * depth1.size:
            continue
        image1 = read_image(
            os.path.join(seq_path, "image", image_files[frame_idx1]))
        view1 = View(R=R1, t=t1, K=intrinsics, image=image1, depth=depth1,
                     depth_metric="camera_z")
        views = [view1]
        used_views.add(i1)

        for i2 in range(i1 + 1, sharp_idx.size):
            frame_idx2 = sharp_idx[i2]
            R2, t2 = read_Rt(extrinsics, frame_idx2)
            baseline = float(np.linalg.norm(
                (-R1.T @ t1) - (-R2.T @ t2)))  # meters
            if baseline < baseline_range[0] or baseline > baseline_range[1]:
                continue
            if float(R1[2] @ R2[2]) < math.cos(math.radians(70)):
                continue
            depth2 = read_depth(os.path.join(
                seq_path, "depthTSDF", depth_files[idx_img2depth[frame_idx2]]))
            if np.count_nonzero(np.isfinite(depth2) & (depth2 > 0)) < \
                    0.5 * depth2.size:
                continue
            view2 = View(R=R2, t=t2, K=intrinsics, image=None, depth=depth2,
                         depth_metric="camera_z")
            check_params = {"min_valid_threshold": 0.4,
                            "min_depth_consistent": 0.7}
            if check_depth_consistency(view1, [view2], **check_params) and \
                    check_depth_consistency(view2, [view1], **check_params):
                image2 = read_image(os.path.join(
                    seq_path, "image", image_files[frame_idx2]))
                views.append(view2._replace(image=image2))
                used_views.add(i2)
            if len(views) > max_views_num:
                # post-append '>' admits max_views_num+1 views — reference
                # parity (sun3d_utils.py:211-212)
                break

        if len(views) > 1:
            # group is named after the anchor's position in the sharp-frame
            # list, not its frame id — reference parity (sun3d_utils.py:215
            # uses img_ids[i1], i1 being the enumerate index)
            group_name = group_prefix + "-{:07d}".format(img_ids[i1])
            # the reference writes EVERY ordered pair: its range test
            # `baseline >= lo or baseline <= hi` (sun3d_utils.py:222) is
            # always true, so the per-pair filter is a no-op; real
            # baseline/angle/consistency filtering already happened when
            # each view was admitted against the anchor above
            view_pairs = []
            for a, b in itertools.product(range(len(views)), repeat=2):
                if a != b:
                    view_pairs.extend((a, b))
            for i, v in enumerate(views):
                write_view(h5file.require_group(
                    f"{group_name}/frames/t0/v{i}"), v)
            h5file[group_name]["frames/t0"].attrs["viewpoint_pairs"] = \
                np.array(view_pairs, np.int32)
            generated += 1
    return generated
