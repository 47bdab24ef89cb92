"""Dataset tools — View geometry utilities, image helpers, SUN3D dataset
generation, and the weight converter.

Port of the reference ``python/depthmotionnet/dataset_tools`` package with
the Cython per-pixel loops (view_tools_cython.pyx) replaced by vectorized
numpy.
"""

from .view_tools import (
    compute_visible_points_mask,
    compute_depth_ratios,
    check_depth_consistency,
    adjust_intrinsics,
    resize_view,
    compute_view_distances,
    compute_view_angle,
    compute_flow_from_views,
    create_image_overview,
    visualize_views,
)
from .helpers import (
    measure_sharpness,
    safe_crop_image,
    safe_crop_array2d,
    concat_images_horizontal,
    concat_images_vertical,
)

__all__ = [
    "compute_visible_points_mask",
    "compute_depth_ratios",
    "check_depth_consistency",
    "adjust_intrinsics",
    "resize_view",
    "compute_view_distances",
    "compute_view_angle",
    "compute_flow_from_views",
    "create_image_overview",
    "visualize_views",
    "measure_sharpness",
    "safe_crop_image",
    "safe_crop_array2d",
    "concat_images_horizontal",
    "concat_images_vertical",
]
