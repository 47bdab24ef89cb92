"""Host-side (numpy) geometry for the data pipeline.

Vectorized re-derivations of the reference's per-pixel C++ loops:
flow rendering (computeFlow, multivih5datareader.cpp:369-424), the
depth-visibility mask (computeDepthmask, :430-498), ray_length->camera_z
conversion (:1488-1512), rotation conversions (:252-261, 306-313) and the
HSV photometric augmentation (augmentImage, :640-714).

These run in the loader's builder threads on the host CPU; the on-device
counterparts live in demon_tpu.ops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


# ---------------------------------------------------------------------------
# rotations (numpy)
# ---------------------------------------------------------------------------

def rotation_matrix_to_angleaxis(R: np.ndarray) -> np.ndarray:
    """R [3,3] -> angle-axis [3] (Eigen::AngleAxisd semantics,
    reference multivih5datareader.cpp:252-261).

    Scalar math on purpose: this runs per item in the reader's builder
    threads, and numpy-scalar ops cost ~5 us each under the GIL."""
    import math

    qw, qx, qy, qz = rotation_matrix_to_quaternion(R)
    w = min(1.0, max(-1.0, qw))
    s = math.sqrt(qx * qx + qy * qy + qz * qz)
    if s < 1e-12:
        return np.array([2.0 * qx, 2.0 * qy, 2.0 * qz])
    k = 2.0 * math.atan2(s, w) / s
    return np.array([qx * k, qy * k, qz * k])


def rotation_matrix_to_quaternion(R: np.ndarray) -> np.ndarray:
    """R [3,3] -> (w, x, y, z), w >= 0. Shepperd's method (scalar math —
    per-item hot path, see rotation_matrix_to_angleaxis)."""
    import math

    m = np.asarray(R, np.float64)
    (m00, m01, m02), (m10, m11, m12), (m20, m21, m22) = m.tolist()
    tr = m00 + m11 + m22
    cand = (1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22)
    i = max(range(4), key=lambda j: cand[j])
    s = math.sqrt(max(cand[i], 1e-12))
    if i == 0:
        q = (s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s)
    elif i == 1:
        q = ((m21 - m12) / s, s, (m01 + m10) / s, (m02 + m20) / s)
    elif i == 2:
        q = ((m02 - m20) / s, (m01 + m10) / s, s, (m12 + m21) / s)
    else:
        q = ((m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, s)
    n = math.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    sign = 1.0 / n if q[0] >= 0 else -1.0 / n
    return np.array([q[0] * sign, q[1] * sign, q[2] * sign, q[3] * sign])


def angleaxis_to_rotation_matrix(aa: np.ndarray) -> np.ndarray:
    """Rodrigues. aa [3] -> R [3,3]."""
    aa = np.asarray(aa, np.float64)
    angle = np.linalg.norm(aa)
    if angle < 1e-12:
        return np.eye(3)
    u = aa / angle
    K = np.array([[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]])
    return np.eye(3) * np.cos(angle) + np.sin(angle) * K + \
        (1 - np.cos(angle)) * np.outer(u, u)


def rotate_camera_180_around_z(R: np.ndarray, t: np.ndarray):
    """In-place-style fixup for the rot180 augmentation
    (reference rotateCamera180DegAroundZ, multivih5datareader.cpp:306-313)."""
    C = -R.T @ t
    R2 = R.copy()
    R2[0] = -R2[0]
    R2[1] = -R2[1]
    return R2, -R2 @ C


def compute_fundamental_from_cameras(P1: np.ndarray, P2: np.ndarray) -> np.ndarray:
    """F from two 3x4 projection matrices (reference
    computeFundamentalFromCameras, multivih5datareader.cpp:264-303)."""
    X = [P1[[1, 2]], np.vstack([P1[2], P1[0]]), P1[[0, 1]]]
    Y = [P2[[1, 2]], np.vstack([P2[2], P2[0]]), P2[[0, 1]]]
    F = np.empty((3, 3))
    for i in range(3):
        for j in range(3):
            F[j, i] = np.linalg.det(np.vstack([X[i], Y[j]]))
    return F


# ---------------------------------------------------------------------------
# pixel-grid helpers
# ---------------------------------------------------------------------------

def _backproject(depth: np.ndarray, K_px: np.ndarray, depth_metric: str):
    """Rays and camera-frame points for every pixel; K in pixel units.

    Returns (pos [H,W,3] cam-frame points, valid [H,W]).
    """
    h, w = depth.shape
    inv_K = np.linalg.inv(K_px)
    xs = np.arange(w, dtype=np.float32) + 0.5
    ys = np.arange(h, dtype=np.float32) + 0.5
    px = inv_K[0, 0] * xs[None, :] + inv_K[0, 2]
    py = inv_K[1, 1] * ys[:, None] + inv_K[1, 2]
    rx = np.broadcast_to(px, (h, w)).astype(np.float32)
    ry = np.broadcast_to(py, (h, w)).astype(np.float32)
    rz = np.ones((h, w), np.float32)
    rays = np.stack([rx, ry, rz], axis=-1)
    valid = np.isfinite(depth) & (depth > 0)
    if depth_metric == "ray_length":
        scale = depth / np.linalg.norm(rays, axis=-1)
    else:
        scale = depth
    return rays * scale[..., None], valid


def ray_length_to_camera_z(depth: np.ndarray, K_px: np.ndarray) -> np.ndarray:
    """Convert ray-length depth to camera-z depth
    (reference multivih5datareader.cpp:1488-1512)."""
    h, w = depth.shape
    inv_K = np.linalg.inv(K_px)
    xs = np.arange(w, dtype=np.float32) + 0.5
    ys = np.arange(h, dtype=np.float32) + 0.5
    px = inv_K[0, 0] * xs[None, :] + inv_K[0, 2]
    py = inv_K[1, 1] * ys[:, None] + inv_K[1, 2]
    norm = np.sqrt(px * px + py * py + 1.0)
    return (depth / norm).astype(np.float32)


def _pixel_K(K_norm: np.ndarray, width: int, height: int) -> np.ndarray:
    K = np.array(K_norm, np.float64, copy=True)
    K[0, 0] *= width
    K[1, 1] *= height
    K[0, 2] *= width
    K[1, 2] *= height
    return K


def compute_flow(depth1: np.ndarray, K1n, R1, t1, K2n, R2, t2,
                 depth_metric: str = "camera_z") -> np.ndarray:
    """Optical flow cam1 -> cam2 in PIXEL units, [2, H, W] is NOT used —
    returns [H, W, 2] (dx, dy); NaN where depth invalid.

    Vectorized equivalent of the reference computeFlow
    (multivih5datareader.cpp:369-424): K normalized, world-to-cam
    extrinsics X_cam = R X_world + t.
    """
    h, w = depth1.shape
    K1 = _pixel_K(K1n, w, h)
    K2 = _pixel_K(K2n, w, h)
    pos, valid = _backproject(depth1.astype(np.float32), K1, depth_metric)
    # cam1 -> world
    Xw = (pos - np.asarray(t1, np.float32)) @ np.asarray(R1, np.float32)
    # world -> image2
    P2 = K2 @ np.hstack([np.asarray(R2), np.asarray(t2).reshape(3, 1)])
    P2 = P2.astype(np.float32)
    p2 = Xw @ P2[:, :3].T + P2[:, 3]
    with np.errstate(divide="ignore", invalid="ignore"):
        u2 = p2[..., 0] / p2[..., 2]
        v2 = p2[..., 1] / p2[..., 2]
    xs = np.arange(w, dtype=np.float32) + 0.5
    ys = np.arange(h, dtype=np.float32) + 0.5
    flow = np.stack([u2 - xs[None, :], v2 - ys[:, None]], axis=-1)
    flow[~valid] = np.nan
    return flow.astype(np.float32)


def compute_depthmask(depth1: np.ndarray, K1n, R1, t1, K2n, R2, t2,
                      border1: int = 3, border2: int = 5,
                      depth_metric: str = "camera_z") -> np.ndarray:
    """Binary mask of pixels whose depth is recoverable from the pair
    (reference computeDepthmask, multivih5datareader.cpp:430-498):
    zero within `border1` of image 1's edge, zero where invalid depth,
    zero where the reprojection falls within `border2` of image 2's edge.
    Returns float32 [H, W] of {0, 1}.
    """
    h, w = depth1.shape
    K1 = _pixel_K(K1n, w, h)
    K2 = _pixel_K(K2n, w, h)
    pos, valid = _backproject(depth1.astype(np.float32), K1, depth_metric)
    Xw = (pos - np.asarray(t1, np.float32)) @ np.asarray(R1, np.float32)
    P2 = (K2 @ np.hstack([np.asarray(R2), np.asarray(t2).reshape(3, 1)])).astype(np.float32)
    p2 = Xw @ P2[:, :3].T + P2[:, 3]
    # like the reference, no z>0 test: points behind camera 2 may project
    # in-bounds and stay masked-in (multivih5datareader.cpp:483-495
    # divides by p2.z unconditionally) — kept for parity
    with np.errstate(divide="ignore", invalid="ignore"):
        u2 = p2[..., 0] / p2[..., 2]
        v2 = p2[..., 1] / p2[..., 2]
    inb2 = (u2 >= border2) & (v2 >= border2) & (u2 < w - border2) & (v2 < h - border2)
    mask = (valid & inb2).astype(np.float32)
    if border1 > 0:
        mask[:border1] = 0
        mask[-border1:] = 0
        mask[:, :border1] = 0
        mask[:, -border1:] = 0
    return mask


# ---------------------------------------------------------------------------
# photometric augmentation (HSV + contrast/brightness/gamma)
# ---------------------------------------------------------------------------

@dataclass
class RandomDist:
    """A scalar random parameter: normal(mean, stddev) or uniform(a, b)
    (reference multivih5datareader.h aug params / getRandomParam)."""

    normal: Optional[tuple] = None   # (mean, stddev)
    uniform: Optional[tuple] = None  # (a, b)

    def any_dist(self) -> bool:
        return self.normal is not None or self.uniform is not None

    def sample(self, rng: np.random.RandomState) -> float:
        if self.normal is not None:
            return float(rng.normal(self.normal[0], self.normal[1]))
        if self.uniform is not None:
            return float(rng.uniform(self.uniform[0], self.uniform[1]))
        return 0.0

    @staticmethod
    def from_json(obj) -> "RandomDist":
        if obj is None:
            return RandomDist()
        if "normal" in obj:
            return RandomDist(normal=(obj["normal"]["mean"], obj["normal"]["stddev"]))
        if "uniform" in obj:
            return RandomDist(uniform=(obj["uniform"]["a"], obj["uniform"]["b"]))
        raise ValueError(f"bad random dist spec {obj!r}")


def rgb_to_hsv(rgb: np.ndarray):
    """rgb [..,3] in [0,1] -> (h deg [0,360), s, v)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = rgb.max(axis=-1)
    mn = rgb.min(axis=-1)
    c = v - mn
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(v > 0, c / v, 0.0)
        hr = np.where(c > 0, ((g - b) / c) % 6.0, 0.0)
        hg = np.where(c > 0, (b - r) / c + 2.0, 0.0)
        hb = np.where(c > 0, (r - g) / c + 4.0, 0.0)
    h = np.where(v == r, hr, np.where(v == g, hg, hb)) * 60.0
    return h % 360.0, s, v


def hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    c = v * s
    hp = (h / 60.0) % 6.0
    x = c * (1.0 - np.abs(hp % 2.0 - 1.0))
    z = np.zeros_like(c)
    i = hp.astype(np.int32) % 6
    r = np.choose(i, [c, x, z, z, x, c])
    g = np.choose(i, [x, c, c, x, z, z])
    b = np.choose(i, [z, z, x, c, c, x])
    m = v - c
    return np.stack([r + m, g + m, b + m], axis=-1)


@dataclass
class PhotometricAugParams:
    hue: RandomDist = field(default_factory=RandomDist)
    sat: RandomDist = field(default_factory=RandomDist)
    val: RandomDist = field(default_factory=RandomDist)
    contrast: RandomDist = field(default_factory=RandomDist)
    brightness: RandomDist = field(default_factory=RandomDist)
    gamma: RandomDist = field(default_factory=RandomDist)

    def any(self) -> bool:
        return any(d.any_dist()
                   for d in (self.hue, self.sat, self.val, self.contrast,
                             self.brightness, self.gamma))


def augment_image_pair(images: np.ndarray, params: PhotometricAugParams,
                       rng: np.random.RandomState) -> np.ndarray:
    """Photometric augmentation applied with ONE parameter draw to both
    images of the pair (reference augmentImage,
    multivih5datareader.cpp:640-714).

    images: [H, W, 6] float32 in [-0.5, 0.5] (RGBRGB). Returns same.
    """
    if not params.any():
        return images
    hue_change = params.hue.sample(rng)
    sat_change = params.sat.sample(rng)
    val_change = params.val.sample(rng)
    contrast = params.contrast.sample(rng) if params.contrast.any_dist() else 1.0
    brightness = params.brightness.sample(rng) if params.brightness.any_dist() else 0.0
    gamma = params.gamma.sample(rng) if params.gamma.any_dist() else 1.0

    out = images.copy()
    for i in (0, 1):
        rgb = out[..., 3 * i : 3 * i + 3] + 0.5
        h, s, v = rgb_to_hsv(np.clip(rgb, 0.0, 1.0))
        h = (h + hue_change) % 360.0
        s = np.clip(s + sat_change, 0.0, 1.0)
        v = np.clip(v + val_change, 0.0, 1.0)
        rgb = hsv_to_rgb(h, s, v)
        rgb = (rgb - 0.5) * contrast + brightness + 0.5
        rgb = np.power(np.clip(rgb, 0.0, 1.0), gamma)
        out[..., 3 * i : 3 * i + 3] = np.clip(rgb, 0.0, 1.0) - 0.5
    return out
