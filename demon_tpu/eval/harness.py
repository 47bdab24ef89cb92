"""The evaluation harness: h5 prediction/GT files -> labeled 5-D error
array (snapshot x iteration x sample x errors x scaled).

Port of the reference evaluate_to_xarray.py:33-316 with xarray replaced by
LabeledArray (same JSON serialization).

File formats (identical to the reference):

* GT file: one group per sample holding datasets ``image_pair``/``motion``
  /``depth``/``intrinsics``/``flow`` (subset) and a ``sample_id`` attr
  (written by examples/evaluation.py:31-118).
* Results file ("iterative" layout): /<snapshot>/<sample>/predicted_<X>/<i>
  datasets, sample groups carrying ``sample_id`` attrs; iteration names
  like '0','1','2','3','3_refined'.
"""

from __future__ import annotations

import re
import time
from typing import Dict, Optional

import h5py
import numpy as np

from . import metrics as M
from .helpers import intrinsics_vector_to_K, motion_vector_to_Rt
from .labeled_array import LabeledArray

DEPTH_ERRORS = list(M.DEFAULT_DISTANCES)
ERRORS_TO_COMPUTE = (["rot_err", "tran_err", "tran_angle_err"]
                     + ["depth_" + e for e in DEPTH_ERRORS]
                     + ["flow_epe", "camera_baseline"])

_RE_ITERATION = re.compile(r".*_(\d+)(\.caffemodel\.h5)?")


def get_metainfo(data_file: str) -> dict:
    """Inspect a results h5 file (reference evaluate_to_xarray.py:43-91)."""
    with h5py.File(data_file, "r") as f:
        group_name = list(f.keys())[0]
        iterative = bool(_RE_ITERATION.match(group_name))
        if iterative:
            snapshots = sorted(f.keys(),
                               key=lambda x: int(_RE_ITERATION.match(x).group(1)))
            snapshot_iters = [int(_RE_ITERATION.match(x).group(1))
                              for x in snapshots]
            samples = sorted(f[snapshots[0]].keys(), key=int)
            sample_group = f[snapshots[0]][samples[0]]
            iterations = set()
            for pred in ("predicted_depth", "predicted_normal",
                         "predicted_motion", "predicted_flow", "predicted_conf"):
                if pred in sample_group:
                    iterations.update(list(sample_group[pred]))
            iterations = sorted(
                iterations,
                key=lambda x: (int(x.split("_")[0]), len(x.split("_"))))
        else:
            snapshots = ["snapshot"]
            snapshot_iters = [-1]
            iterations = ["0"]
            samples = sorted(f.keys(), key=int)
    return {
        "iterative": iterative,
        "snapshots": snapshots,
        "iterations": iterations,
        "samples": samples,
        "snapshot_iters": snapshot_iters,
        "input_file": data_file,
    }


def invalidate_points_not_visible_in_second_image(depth, motion, intrinsics):
    """NaN-out depth at points invisible in the second view, in place
    (reference evaluate_to_xarray.py:94-126)."""
    from ..data.view import View
    from ..tools.view_tools import compute_visible_points_mask

    abs_depth = 1.0 / depth
    R, t = motion_vector_to_Rt(np.asarray(motion).squeeze())
    if intrinsics is None:
        intrinsics = np.array([0.891, 1.188, 0.5, 0.5], np.float32)
    K = intrinsics_vector_to_K(np.asarray(intrinsics).squeeze(),
                               depth.shape[-1], depth.shape[-2])
    view1 = View(R=np.eye(3), t=np.zeros(3), K=K, image=None,
                 depth=abs_depth.astype(np.float32), depth_metric="camera_z")
    view2 = View(R=R, t=t, K=K, image=None,
                 depth=abs_depth.astype(np.float32), depth_metric="camera_z")
    invalid = compute_visible_points_mask(view1, view2) == 0
    depth[invalid] = np.nan


def _nearest_resize(a: np.ndarray, shape) -> np.ndarray:
    # floor(dst*scale) convention — keep in sync with its siblings
    # (reader._nearest_resize, view_tools._nearest_resize2d,
    # ops/image.py resize_nearest), which differ only in axis order
    H, W = a.shape[-2], a.shape[-1]
    h, w = shape
    ys = np.minimum((np.arange(h) * (H / h)).astype(np.int64), H - 1)
    xs = np.minimum((np.arange(w) * (W / w)).astype(np.int64), W - 1)
    return a[..., ys, :][..., xs]


def get_data(iterative: bool, results_h5_file, snap: str, sample: str,
             net_iter: str, gt_h5_file=None, depthmask: bool = False,
             eigen_crop_gt_and_pred: bool = False) -> Dict[str, np.ndarray]:
    """Read matched GT + prediction arrays for one (snapshot, sample,
    iteration) cell (reference evaluate_to_xarray.py:129-213).

    Asserts the prediction/GT sample ids match. Predictions smaller than
    GT are nearest-upsampled; NYU predictions at Eigen's (109,147) trigger
    the (436,588) GT crop.
    """
    # NOTE 'normals' here vs 'predicted_normal' (singular) in
    # get_metainfo — the reference has the same mismatch
    # (evaluate_to_xarray.py:70 vs :158), reproduced for parity
    data_types = ["motion", "depth", "flow", "normals", "intrinsics"]
    data: Dict[str, np.ndarray] = {}
    gt_sample_id = None

    if iterative and gt_h5_file is None:
        sample_group = results_h5_file[snap][sample]
    elif gt_h5_file is None:
        sample_group = results_h5_file[sample]
    else:
        sample_group = gt_h5_file[sample]
        gt_sample_id = sample_group.attrs["sample_id"]

    for dt in data_types:
        if dt in sample_group:
            data[dt + "_gt"] = sample_group[dt][:]

    if iterative:
        sample_group = results_h5_file[snap][sample]
        pr_sample_id = sample_group.attrs["sample_id"]
        if gt_sample_id is not None:
            assert _canon(gt_sample_id) == _canon(pr_sample_id), \
                f"sample ids do not match: '{pr_sample_id}' vs '{gt_sample_id}'"
        for dt in data_types:
            key = f"predicted_{dt}/{net_iter}"
            if key in sample_group:
                data[dt + "_pred"] = sample_group["predicted_" + dt][net_iter][:]
    else:
        sample_group = results_h5_file[sample]
        for dt in data_types:
            if ("predicted_" + dt) in sample_group:
                data[dt + "_pred"] = sample_group["predicted_" + dt][:]

    for key in data:
        data[key] = np.squeeze(data[key])

    if "depth_pred" in data and data["depth_pred"].shape == (109, 147):
        assert data["depth_gt"].shape == (480, 640)
        data["depth_gt"] = data["depth_gt"][23 : 23 + 436, 27 : 27 + 588]

    if depthmask and "motion_gt" in data and "depth_gt" in data:
        intr = data.get("intrinsics_gt", data.get("intrinsics"))
        invalidate_points_not_visible_in_second_image(
            data["depth_gt"], data["motion_gt"], intr)

    if ("depth_gt" in data and "depth_pred" in data
            and data["depth_gt"].shape != data["depth_pred"].shape):
        data["depth_pred"] = _nearest_resize(
            data["depth_pred"], data["depth_gt"].shape)
    if ("flow_gt" in data and "flow_pred" in data
            and data["flow_gt"].shape != data["flow_pred"].shape):
        # resized to DEPTH_gt's shape, not flow_gt's — deliberate
        # reproduction of the reference quirk (evaluate_to_xarray.py:
        # 203-205), which eval results depend on when GT depth is
        # cropped/resized differently from GT flow
        data["flow_pred"] = _nearest_resize(
            data["flow_pred"], data["depth_gt"].shape)

    if eigen_crop_gt_and_pred and data["depth_gt"].shape != (436, 588):
        assert data["depth_gt"].shape == (480, 640)
        assert data["depth_pred"].shape == (480, 640)
        data["depth_gt"] = data["depth_gt"][23 : 23 + 436, 27 : 27 + 588]
        data["depth_pred"] = data["depth_pred"][23 : 23 + 436, 27 : 27 + 588]

    return data


def _canon(sid) -> str:
    if isinstance(sid, bytes):
        sid = sid.decode()
    return str(sid).strip()


def evaluate(results_file: str, gt_file: Optional[str],
             depthmask: bool = False, eigen_crop_gt_and_pred: bool = False,
             depth_scaling: str = "abs", verbose: bool = True) -> LabeledArray:
    """Full evaluation to a labeled 5-D array
    (reference evaluate_to_xarray.py:216-316)."""
    metainfo = get_metainfo(results_file)
    shape = (len(metainfo["snapshots"]), len(metainfo["iterations"]),
             len(metainfo["samples"]), len(ERRORS_TO_COMPUTE), 2)
    results = LabeledArray(
        np.full(shape, np.nan),
        ["snapshot", "iteration", "sample", "errors", "scaled"],
        {
            "snapshot": metainfo["snapshots"],
            "iteration": metainfo["iterations"],
            "sample": metainfo["samples"],
            "errors": ERRORS_TO_COMPUTE,
            "scaled": [False, True],
        },
    )
    results.attrs.update(metainfo)
    results.attrs["gt_file"] = gt_file
    results.attrs["depthmask"] = depthmask
    results.attrs["depth_scaling"] = depth_scaling

    all_slice = slice(None)
    with h5py.File(results_file, "r") as results_f:
        gt_f = h5py.File(gt_file, "r") if gt_file else None
        t0 = 0.0
        try:
            for snap in metainfo["snapshots"]:
                for nsample, sample in enumerate(metainfo["samples"]):
                    if verbose and time.time() - t0 > 5:
                        t0 = time.time()
                        print(f"Processing sample {nsample + 1}/"
                              f"{len(metainfo['samples'])}")
                    for net_iter in metainfo["iterations"]:
                        data = get_data(
                            metainfo["iterative"], results_f, snap, sample,
                            net_iter, gt_h5_file=gt_f, depthmask=depthmask,
                            eigen_crop_gt_and_pred=eigen_crop_gt_and_pred)

                        if "depth_gt" in data and "depth_pred" in data:
                            if "motion_gt" in data and not np.any(
                                    np.isnan(data["motion_gt"])):
                                translation_gt = data["motion_gt"][-3:]
                                results.set(
                                    (snap, net_iter, sample, "camera_baseline",
                                     all_slice),
                                    np.linalg.norm(translation_gt))
                            else:
                                translation_gt = np.array([1.0, 0.0, 0.0])
                            errs, errs_scaled = M.evaluate_depth(
                                translation_gt, data["depth_gt"],
                                data["depth_pred"],
                                distances_to_compute=DEPTH_ERRORS,
                                inverse_gt=True, inverse_pred=True,
                                depth_scaling=depth_scaling)
                            for dist in DEPTH_ERRORS:
                                results.set((snap, net_iter, sample,
                                             "depth_" + dist, False), errs[dist])
                                results.set((snap, net_iter, sample,
                                             "depth_" + dist, True),
                                            errs_scaled[dist])

                        if "motion_gt" in data and "motion_pred" in data:
                            rot_err, tran_err, tran_angle_err = \
                                M.compute_motion_errors(
                                    data["motion_pred"], data["motion_gt"], True)
                            for name, v in (("rot_err", rot_err),
                                            ("tran_err", tran_err),
                                            ("tran_angle_err", tran_angle_err)):
                                results.set((snap, net_iter, sample, name,
                                             all_slice), v)

                        if "flow_gt" in data and "flow_pred" in data:
                            results.set(
                                (snap, net_iter, sample, "flow_epe", all_slice),
                                M.compute_flow_epe(data["flow_pred"],
                                                   data["flow_gt"]))
        finally:
            if gt_f is not None:
                gt_f.close()
    return results
