"""Geometry and image op library — the TPU-native ``lmbspecialops`` equivalent.

The reference framework implements these as C++/CUDA TensorFlow ops
(lmbspecialops submodule; op contract recovered from the call sites, see
reference python/depthmotionnet/blocks_original.py and v2/losses.py).
Here they are batched NHWC jax.numpy functions that XLA fuses onto the
VPU/MXU, with Pallas kernels for the gather-heavy paths.

Conventions
-----------
* Tensors are NHWC: images [B, H, W, C], depth [B, H, W, 1] (or [B, H, W]),
  flow [B, H, W, 2] with channels (dx, dy).
* Intrinsics: [B, 4] = (fx, fy, cx, cy), normalized by image width/height
  (reference: multivih5datareader.cpp:1392-1396).
* Pixel (x, y) has center (x+0.5, y+0.5); normalized coordinates
  u=(x+0.5)/W, v=(y+0.5)/H (reference: multivih5datareader.cpp:394,
  view_tools_cython.pyx:36-37).
* "Normalized flow" is measured in units of image width (dx) / height (dy).
* Rotation: angle-axis 3-vector, angle = |aa|.
* Relative motion (R, t): X2 = R @ X1 + t for a cam1-frame point X1.
* Invalid values are NaN at op boundaries; `replace_nonfinite` gives losses
  a zero-contribution path (reference v2/losses.py:49).
"""

from .geometry import (
    angleaxis_to_rotation_matrix,
    rotation_matrix_to_angleaxis,
    angleaxis_to_quaternion,
    depth_to_flow,
    flow_to_depth,
    flow_to_depth2,
    depth_to_normals,
    pixel_rays,
)
from .warp import warp2d


def warp2d_pallas(*args, **kwargs):
    """Lazy import of the Pallas MXU warp kernel (see ops/pallas_warp.py)."""
    from .pallas_warp import warp2d_pallas as _impl

    return _impl(*args, **kwargs)
from .image import (
    median3x3_downsample,
    recursive_median_downsample,
    resize_nearest,
    resize_area,
)
from .elementwise import (
    leaky_relu,
    replace_nonfinite,
    scale_invariant_gradient,
)

__all__ = [
    "angleaxis_to_rotation_matrix",
    "rotation_matrix_to_angleaxis",
    "angleaxis_to_quaternion",
    "depth_to_flow",
    "flow_to_depth",
    "flow_to_depth2",
    "depth_to_normals",
    "pixel_rays",
    "warp2d",
    "warp2d_pallas",
    "median3x3_downsample",
    "recursive_median_downsample",
    "resize_nearest",
    "resize_area",
    "leaky_relu",
    "replace_nonfinite",
    "scale_invariant_gradient",
]
