"""Point-cloud visualization and PLY export.

Replaces the reference's VTK + Cython stack (vis.py:23-419,
vis_cython.pyx:24-173) with vectorized numpy and a self-contained PLY
writer; interactive VTK viewing is optional and gated on the vtk import.
"""

from .pointcloud import (
    compute_point_cloud_from_depthmap,
    transform_pointcloud_points,
    camera_mesh,
    export_prediction_to_ply,
    visualize_prediction,
    write_ply,
)

__all__ = [
    "compute_point_cloud_from_depthmap",
    "transform_pointcloud_points",
    "camera_mesh",
    "export_prediction_to_ply",
    "visualize_prediction",
    "write_ply",
]
