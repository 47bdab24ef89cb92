"""The View abstraction: one camera observation of a scene.

Reference: dataset_tools/view.py:25 — a namedtuple with the same fields and
conventions (world-to-camera extrinsics: X_cam = R @ X_world + t; K in
pixel units of the stored image).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class View(NamedTuple):
    """A camera view.

    R: [3, 3] world-to-camera rotation.
    t: [3] world-to-camera translation (X_cam = R X_world + t).
    K: [3, 3] pixel-unit intrinsics of `image`.
    image: PIL.Image or uint8 array [H, W, 3] (may be None).
    depth: float32 array [H, W] (may be None).
    depth_metric: 'camera_z' or 'ray_length'.
    """

    R: np.ndarray
    t: np.ndarray
    K: np.ndarray
    image: object
    depth: Optional[np.ndarray]
    depth_metric: str = "camera_z"
