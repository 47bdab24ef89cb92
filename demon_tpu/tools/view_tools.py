"""View geometry tools — vectorized numpy replacements for the reference's
Cython inner loops (dataset_tools/view_tools.py:23-384,
view_tools_cython.pyx:8-240).

Conventions: View.K in pixel units of its image/depth; world-to-camera
extrinsics (X_cam = R X_world + t); pixel centers at (x+0.5, y+0.5).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..data.view import View


def _project_view1_into_view2(view1: View, view2: View):
    """Common reprojection: back-project view1's depth, transform to
    world, project with view2's camera. Returns (u2, v2, z2, valid)."""
    depth = np.asarray(view1.depth, np.float32)
    h, w = depth.shape
    K1 = np.asarray(view1.K, np.float64)
    xs = np.arange(w, dtype=np.float32) + 0.5
    ys = np.arange(h, dtype=np.float32) + 0.5
    valid = np.isfinite(depth) & (depth > 0)
    d = np.where(valid, depth, 1.0)
    X = d * (xs[None, :] - K1[0, 2]) / K1[0, 0]
    Y = d * (ys[:, None] - K1[1, 2]) / K1[1, 1]
    Z = d
    pts = np.stack([X, Y, Z], axis=-1) - np.asarray(view1.t, np.float32)
    Xw = pts @ np.asarray(view1.R, np.float32)  # R1^T applied from the right
    P2 = (np.asarray(view2.K) @ np.hstack(
        [np.asarray(view2.R), np.asarray(view2.t).reshape(3, 1)])).astype(np.float32)
    p = Xw @ P2[:, :3].T + P2[:, 3]
    with np.errstate(divide="ignore", invalid="ignore"):
        u2 = p[..., 0] / p[..., 2]
        v2 = p[..., 1] / p[..., 2]
    return u2, v2, p[..., 2], valid


def compute_visible_points_mask(view1: View, view2: View,
                                borderx: int = 0, bordery: int = 0) -> np.ndarray:
    """Mask (uint8) of view1 pixels visible in view2
    (reference view_tools_cython.pyx:8-101)."""
    assert view1.depth_metric == "camera_z", "Depth metric must be 'camera_z'"
    if view2.depth is None:
        h2, w2 = view1.depth.shape
    else:
        h2, w2 = view2.depth.shape
    u2, v2, z2, valid = _project_view1_into_view2(view1, view2)
    ok = valid & (z2 > 0) & (u2 > borderx) & (v2 > bordery) & \
        (u2 < w2 - borderx) & (v2 < h2 - bordery)
    return ok.astype(np.uint8)


def compute_depth_ratios(view1: View, view2: View) -> np.ndarray:
    """Ratio of reprojected depth to view2's stored depth per view1 pixel;
    NaN where invalid (reference view_tools_cython.pyx:104-195)."""
    assert view1.depth_metric == "camera_z"
    assert view2.depth_metric == "camera_z"
    d2map = np.asarray(view2.depth, np.float32)
    h2, w2 = d2map.shape
    u2, v2, z2, valid = _project_view1_into_view2(view1, view2)
    inb = valid & (z2 > 0) & (u2 > 0) & (v2 > 0) & (u2 < w2) & (v2 < h2)
    # nearest-neighbor lookup (reference rounds then clips)
    x2 = np.clip(np.round(np.where(inb, u2, 0)).astype(np.int64), 0, w2 - 1)
    y2 = np.clip(np.round(np.where(inb, v2, 0)).astype(np.int64), 0, h2 - 1)
    d2 = d2map[y2, x2]
    good = inb & np.isfinite(d2) & (d2 > 0)
    out = np.full(u2.shape, np.nan, np.float32)
    out[good] = z2[good] / d2[good]
    return out


def compute_flow_from_views(view1: View, view2: View) -> np.ndarray:
    """Pixel-unit flow [2, H, W] from view1 to view2; NaN where invalid
    (reference view_tools_cython.pyx:198-240)."""
    h, w = view1.depth.shape
    u2, v2, z2, valid = _project_view1_into_view2(view1, view2)
    xs = np.arange(w, dtype=np.float32) + 0.5
    ys = np.arange(h, dtype=np.float32) + 0.5
    flow = np.stack([u2 - xs[None, :], v2 - ys[:, None]])
    flow[:, ~valid] = np.nan
    return flow.astype(np.float32)


def check_depth_consistency(view: View, rest_of_the_views: Sequence[View],
                            depth_ratio_threshold: float = 0.9,
                            min_valid_threshold: float = 0.5,
                            min_depth_consistent: float = 0.7) -> bool:
    """True if `view`'s depth is consistent with every other view
    (reference view_tools.py:62-95)."""
    lo = min(depth_ratio_threshold, 1.0 / depth_ratio_threshold)
    hi = max(depth_ratio_threshold, 1.0 / depth_ratio_threshold)
    for v in rest_of_the_views:
        dr = compute_depth_ratios(view, v)
        valid = dr[np.isfinite(dr)]
        if valid.size / dr.size < min_valid_threshold:
            return False
        consistent = np.count_nonzero((valid > lo) & (valid < hi))
        if consistent / valid.size < min_depth_consistent:
            return False
    return True


def _nearest_resize2d(a: np.ndarray, h: int, w: int) -> np.ndarray:
    # floor(dst*scale) convention — keep in sync with
    # reader._nearest_resize / harness._nearest_resize / ops resize_nearest
    H, W = a.shape
    ys = np.minimum((np.arange(h) * (H / h)).astype(np.int64), H - 1)
    xs = np.minimum((np.arange(w) * (W / w)).astype(np.int64), W - 1)
    return a[ys][:, xs]


def _to_pil(image):
    from PIL import Image

    if isinstance(image, np.ndarray):
        return Image.fromarray(image)
    return image


def adjust_intrinsics(view: View, K_new: np.ndarray, width_new: int,
                      height_new: int) -> View:
    """New View with the given intrinsics/size via scale + crop
    (reference view_tools.py:97-172). Skew is ignored."""
    from PIL import Image

    from .helpers import safe_crop_array2d, safe_crop_image

    img = _to_pil(view.image)
    fx, fy = view.K[0, 0], view.K[1, 1]
    cx, cy = view.K[0, 2], view.K[1, 2]
    width, height = img.width, img.height

    scale_x = K_new[0, 0] / fx
    scale_y = K_new[1, 1] / fy
    width_resize = int(width * scale_x)
    height_resize = int(height * scale_y)
    cx_resize = cx * scale_x
    cy_resize = cy * scale_y

    img_resize = img.resize(
        (width_resize, height_resize),
        Image.BILINEAR if scale_x > 1 else Image.LANCZOS)
    if view.depth is not None:
        depth_resize = _nearest_resize2d(np.asarray(view.depth, np.float32),
                                         height_resize, width_resize)
    else:
        depth_resize = None

    x0 = int(round(cx_resize - K_new[0, 2]))
    y0 = int(round(cy_resize - K_new[1, 2]))
    x1 = x0 + int(width_new)
    y1 = y0 + int(height_new)

    if x0 < 0 or y0 < 0 or x1 > width_resize or y1 > height_resize:
        img_new = safe_crop_image(img_resize, (x0, y0, x1, y1), (127, 127, 127))
        depth_new = None if depth_resize is None else safe_crop_array2d(
            depth_resize, (x0, y0, x1, y1), 0).astype(np.float32)
    else:
        img_new = img_resize.crop((x0, y0, x1, y1))
        depth_new = None if depth_resize is None else \
            depth_resize[y0:y1, x0:x1].astype(np.float32)

    return View(R=view.R, t=view.t, K=np.asarray(K_new), image=img_new,
                depth=depth_new, depth_metric=view.depth_metric)


def resize_view(view: View, width_new: int, height_new: int) -> View:
    """New View at a new size with proportionally scaled intrinsics
    (reference view_tools.py:175-216)."""
    from PIL import Image

    img = _to_pil(view.image)
    if img.width == width_new and img.height == height_new:
        return View(*view)
    width, height = img.width, img.height
    K_new = np.array([
        [width_new * view.K[0, 0] / width, 0, width_new * view.K[0, 2] / width],
        [0, height_new * view.K[1, 1] / height, height_new * view.K[1, 2] / height],
        [0, 0, 1],
    ])
    img_resize = img.resize(
        (width_new, height_new),
        Image.BILINEAR if width_new > width else Image.LANCZOS)
    depth_resize = None
    if view.depth is not None:
        depth_resize = _nearest_resize2d(
            np.asarray(view.depth, np.float32), height_new, width_new
        ).astype(np.asarray(view.depth).dtype)
    return View(R=view.R, t=view.t, K=K_new, image=img_resize,
                depth=depth_resize, depth_metric=view.depth_metric)


def compute_view_distances(views: Sequence[View]) -> np.ndarray:
    """Pairwise camera-center distances (reference view_tools.py:219-231)."""
    centers = np.stack([-np.asarray(v.R).T @ np.asarray(v.t) for v in views])
    diff = centers[:, None] - centers[None, :]
    return np.linalg.norm(diff, axis=-1)


def compute_view_angle(view1: View, view2: View) -> float:
    """Angle between the two optical axes in rad
    (reference view_tools.py:234-246)."""
    a1 = np.asarray(view1.R)[2]
    a2 = np.asarray(view2.R)[2]
    return float(np.arccos(np.clip(a1 @ a2, -1.0, 1.0)))


def create_image_overview(views: Sequence[View]):
    """Horizontal strip of all view images at height 128
    (reference view_tools.py:249-277)."""
    from .helpers import concat_images_horizontal

    imgs = []
    for v in views:
        img = _to_pil(v.image)
        w = int(round(img.width * 128 / img.height))
        imgs.append(img.resize((w, 128)))
    return concat_images_horizontal(imgs)


def visualize_views(views: Sequence[View], export_ply_prefix: str = "views_"):
    """Point-cloud visualization of a set of views: VTK viewer when
    available, PLY export otherwise (reference view_tools.py:280-384
    is VTK-only)."""
    from ..vis import camera_mesh, compute_point_cloud_from_depthmap, write_ply

    clouds = []
    for i, v in enumerate(views):
        if v.depth is None:
            continue
        colors = None
        if v.image is not None:
            colors = np.transpose(np.asarray(_to_pil(v.image)), (2, 0, 1))
        clouds.append(compute_point_cloud_from_depthmap(
            np.asarray(v.depth, np.float32), v.K, v.R, v.t, colors=colors))
    if clouds:
        write_ply(export_ply_prefix + "points.ply",
                  np.concatenate([c["points"] for c in clouds]),
                  colors=(np.concatenate([c["colors"] for c in clouds])
                          if all("colors" in c for c in clouds) else None))
    for i, v in enumerate(views):
        verts, tris = camera_mesh(v.R, v.t)
        write_ply(f"{export_ply_prefix}cam{i}.ply", verts, faces=tris)
