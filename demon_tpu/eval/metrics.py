"""Depth / flow / motion error metrics.

Numpy port of the reference evaluation metrics
(python/depthmotionnet/evaluation/metrics.py:24-445) with minieigen's
Quaternion replaced by plain numpy quaternion math. All depth metrics take
preprocessed positive finite depths; `compute_errors` applies the joint
validity mask first.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import numpy as np

DEFAULT_DISTANCES = (
    "l1", "l1_inverse", "scale_invariant", "abs_relative", "sq_relative",
    "avg_log10", "rmse_log", "rmse",
    "ratio_threshold_1.25", "ratio_threshold_1.5625",
    "ratio_threshold_1.953125",
)


def compute_valid_depth_mask(d1: np.ndarray, d2: Optional[np.ndarray] = None):
    """Mask of finite positive values in one or both maps
    (reference metrics.py:24-37)."""
    if d2 is None:
        return np.isfinite(d1) & (np.nan_to_num(d1, nan=-1.0) > 0)
    ok = np.isfinite(d1) & np.isfinite(d2)
    return ok & (np.nan_to_num(d1, nan=-1.0) > 0) & (np.nan_to_num(d2, nan=-1.0) > 0)


def _mean_or_nan(x: np.ndarray) -> float:
    return float(np.mean(x)) if x.size else float("nan")


def l1(depth1, depth2):
    return _mean_or_nan(np.abs(depth1 - depth2))


def l1_inverse(depth1, depth2):
    return _mean_or_nan(np.abs(1.0 / depth1 - 1.0 / depth2))


def rmse_log(depth1, depth2):
    d = np.log(depth1) - np.log(depth2)
    return float(np.sqrt(np.mean(d * d))) if d.size else float("nan")


def rmse(depth1, depth2):
    d = depth1 - depth2
    return float(np.sqrt(np.mean(d * d))) if d.size else float("nan")


def scale_invariant(depth1, depth2):
    """sqrt of Eigen et al. Eq. 3 (reference metrics.py:128-148)."""
    d = np.log(depth1) - np.log(depth2)
    if not d.size:
        return float("nan")
    n = float(d.size)
    # clamp tiny negative values from cancellation before the sqrt
    return float(np.sqrt(max(0.0, np.sum(d * d) / n - (np.sum(d) / n) ** 2)))


def abs_relative(depth_pred, depth_gt):
    return _mean_or_nan(np.abs(depth_pred - depth_gt) / depth_gt)


def sq_relative(depth_pred, depth_gt):
    d = depth_pred - depth_gt
    return _mean_or_nan(d * d / depth_gt)


def avg_log10(depth1, depth2):
    return _mean_or_nan(np.abs(np.log10(depth1) - np.log10(depth2)))


def ratio_threshold(depth1, depth2, threshold):
    """Fraction of pixels with |log ratio| < log threshold
    (reference metrics.py:217-237)."""
    assert threshold > 0.0
    d = np.abs(np.log(depth1) - np.log(depth2))
    if not d.size:
        return float("nan")
    return float(np.sum(d < np.log(threshold))) / float(d.size)


_METRIC_FNS = {
    "l1": l1, "l1_inverse": l1_inverse, "rmse_log": rmse_log, "rmse": rmse,
    "scale_invariant": scale_invariant, "abs_relative": abs_relative,
    "sq_relative": sq_relative, "avg_log10": avg_log10,
}


def compute_errors(depth_pred, depth_gt,
                   distances_to_compute: Optional[Sequence[str]] = None) -> Dict[str, float]:
    """All distance measures + num_valid (reference metrics.py:240-279)."""
    mask = compute_valid_depth_mask(depth_pred, depth_gt)
    dp = depth_pred[mask]
    dg = depth_gt[mask]
    if distances_to_compute is None:
        distances_to_compute = DEFAULT_DISTANCES
    results: Dict[str, float] = {"num_valid": int(np.sum(mask))}
    for dist in distances_to_compute:
        if dist.startswith("ratio_threshold"):
            results[dist] = ratio_threshold(dp, dg, float(dist.split("_")[-1]))
        else:
            results[dist] = _METRIC_FNS[dist](dp, dg)
    return results


def compute_depth_scale_factor(depth1, depth2, depth_scaling: str = "abs") -> float:
    """Least-squares scale for depth1 against depth2 in abs / log / inv
    space (reference metrics.py:282-321)."""
    if depth_scaling == "abs":
        s11 = float(np.sum(depth1 * depth1))
        s12 = float(np.sum(depth1 * depth2))
        return s12 / s11 if s11 > 0 else 1.0
    if depth_scaling == "log":
        return float(np.exp(np.mean(np.log(depth2) - np.log(depth1))))
    if depth_scaling == "inv":
        i1 = 1.0 / depth1
        i2 = 1.0 / depth2
        s11 = float(np.sum(i1 * i1))
        s12 = float(np.sum(i1 * i2))
        return s11 / s12 if s11 > 0 else 1.0
    raise ValueError(f"unknown depth scaling {depth_scaling!r}")


def evaluate_depth(translation_gt, depth_gt_in, depth_pred_in,
                   distances_to_compute=None, inverse_gt=True,
                   inverse_pred=True, depth_scaling="abs"):
    """Errors raw and after least-squares scaling
    (reference metrics.py:324-374). Returns (errs, errs_pred_scaled).

    GT depth is divided by ||t_gt|| when the translation is unnormalized,
    matching the reader's ||t||=1-with-depth-rescale convention.
    """
    mask = compute_valid_depth_mask(depth_pred_in, depth_gt_in)
    depth_pred = depth_pred_in[mask].astype(np.float64)
    depth_gt = depth_gt_in[mask].astype(np.float64)
    if inverse_gt:
        depth_gt = 1.0 / depth_gt
    if inverse_pred:
        depth_pred = 1.0 / depth_pred

    translation_gt = np.asarray(translation_gt, np.float64)
    tnorm = float(np.sqrt(translation_gt @ translation_gt))
    if not np.isclose(1.0, tnorm):
        depth_gt = depth_gt / tnorm

    errs = compute_errors(depth_pred, depth_gt, distances_to_compute)
    scale = compute_depth_scale_factor(depth_pred, depth_gt, depth_scaling)
    errs_scaled = compute_errors(depth_pred * scale, depth_gt,
                                 distances_to_compute)
    return errs, errs_scaled


def compute_flow_epe(flow1, flow2) -> float:
    """Mean endpoint error; accepts [2,H,W] or [H,W,2]
    (reference metrics.py:377-387 is [2,H,W])."""
    diff = np.asarray(flow1) - np.asarray(flow2)
    if diff.shape[0] == 2 and diff.ndim == 3:
        epe = np.sqrt(diff[0] ** 2 + diff[1] ** 2)
    else:
        epe = np.sqrt(diff[..., 0] ** 2 + diff[..., 1] ** 2)
    epe = epe[np.isfinite(epe)]
    return float(np.mean(epe)) if epe.size else float("nan")


def _angleaxis_to_quat(aa: np.ndarray) -> np.ndarray:
    aa = np.asarray(aa, np.float64)
    angle = np.linalg.norm(aa)
    if angle < 1e-6:
        return np.array([1.0, 0.0, 0.0, 0.0])
    axis = aa / angle
    return np.concatenate([[math.cos(angle / 2)], math.sin(angle / 2) * axis])


def compute_motion_errors(predicted_motion, gt_motion, normalize_translations):
    """(rot angular distance deg, normalized translation distance,
    translation angle deg) — reference metrics.py:390-445 with the
    quaternion angular distance 2*acos(|<q1,q2>|) replacing
    minieigen's Quaternion::angularDistance."""
    predicted_motion = np.asarray(predicted_motion, np.float64)
    gt_motion = np.asarray(gt_motion, np.float64)

    q_gt = _angleaxis_to_quat(gt_motion[:3])
    q_pr = _angleaxis_to_quat(predicted_motion[:3])
    dot = abs(float(q_gt @ q_pr))
    rotation_angle_dist = 2.0 * math.acos(min(1.0, dot))

    gt_trans = gt_motion[3:6].copy()
    pr_trans = predicted_motion[3:6].copy()
    if normalize_translations:
        n = np.linalg.norm(gt_trans)
        if n > 0:
            gt_trans /= n
        n = np.linalg.norm(pr_trans)
        if n > 1e-6:
            pr_trans /= n
    translation_dist = float(np.linalg.norm(gt_trans - pr_trans))
    translation_angle = math.acos(float(np.clip(gt_trans @ pr_trans, -1.0, 1.0)))
    return (np.rad2deg(rotation_angle_dist), translation_dist,
            np.rad2deg(translation_angle))
