"""Small conversion helpers for evaluation
(reference python/depthmotionnet/evaluation/helpers.py:22-120, with
minieigen replaced by numpy)."""

from __future__ import annotations

import numpy as np

from ..data.host_geometry import angleaxis_to_rotation_matrix


def motion_vector_to_Rt(motion, epsilon: float = 1e-6):
    """[aa1, aa2, aa3, tx, ty, tz] -> (R [3,3], t [3])."""
    tmp = np.asarray(motion).squeeze().astype(np.float64)
    aa = tmp[:3]
    if np.linalg.norm(aa) < epsilon:
        R = np.eye(3)
    else:
        R = angleaxis_to_rotation_matrix(aa)
    return R, tmp[3:6].copy()


def intrinsics_vector_to_K(intrinsics, width: int, height: int) -> np.ndarray:
    """Normalized [fx, fy, cx, cy] -> pixel-unit K for (width, height)."""
    t = np.asarray(intrinsics).squeeze().astype(np.float64)
    return np.array([
        [t[0] * width, 0.0, t[2] * width],
        [0.0, t[1] * height, t[3] * height],
        [0.0, 0.0, 1.0],
    ])
