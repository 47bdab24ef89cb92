"""Evaluation subsystem — metrics and the xarray-style harness.

Port of the reference ``python/depthmotionnet/evaluation`` package
(metrics.py, evaluate_to_xarray.py, helpers.py) with minieigen replaced by
numpy quaternion math and xarray replaced by a self-contained labeled
5-D array that serializes to the same JSON layout.
"""

from .metrics import (
    compute_valid_depth_mask,
    compute_errors,
    compute_depth_scale_factor,
    evaluate_depth,
    compute_flow_epe,
    compute_motion_errors,
    DEFAULT_DISTANCES,
)
from .helpers import (
    motion_vector_to_Rt,
    intrinsics_vector_to_K,
)
from .labeled_array import LabeledArray, write_labeled_array_json, read_labeled_array_json
from .harness import evaluate, get_metainfo

__all__ = [
    "compute_valid_depth_mask",
    "compute_errors",
    "compute_depth_scale_factor",
    "evaluate_depth",
    "compute_flow_epe",
    "compute_motion_errors",
    "DEFAULT_DISTANCES",
    "motion_vector_to_Rt",
    "intrinsics_vector_to_K",
    "LabeledArray",
    "write_labeled_array_json",
    "read_labeled_array_json",
    "evaluate",
    "get_metainfo",
]
