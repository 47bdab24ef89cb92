"""Two-view geometry ops: rotations, flow rendering, triangulation, normals.

Semantics match the reference op contract (lmbspecialops call sites in
blocks_original.py:155-176,344-360 and the reader's computeFlow,
multivih5datareader.cpp:369-424): normalized intrinsics, half-pixel
centered coordinates, inverse-depth in/out, NaN for invalid pixels.

All ops are batched, NHWC, and jit/vmap/grad-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# rotation parameterizations
# ---------------------------------------------------------------------------

def angleaxis_to_rotation_matrix(aa: jax.Array) -> jax.Array:
    """Rodrigues formula, batched. aa: [..., 3] -> R: [..., 3, 3].

    Safe at angle ~ 0 (returns identity; gradients finite). Matches the
    reference's numpy helper (helpers.py:37-57).
    """
    aa = jnp.asarray(aa)
    angle2 = jnp.sum(aa * aa, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    angle = jnp.sqrt(jnp.maximum(angle2, 1e-24))
    # unit axis; for tiny angles direction is irrelevant because sin/1-cos -> 0
    u = aa / jnp.maximum(angle[..., 0], 1e-12)
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    one_c = 1.0 - c

    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    zeros = jnp.zeros_like(ux)
    # cross-product matrix [u]_x
    K = jnp.stack(
        [
            jnp.stack([zeros, -uz, uy], axis=-1),
            jnp.stack([uz, zeros, -ux], axis=-1),
            jnp.stack([-uy, ux, zeros], axis=-1),
        ],
        axis=-2,
    )
    outer = u[..., :, None] * u[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), outer.shape)
    R = c * eye + s * K + one_c * outer
    # exact identity for zero rotation (avoids u = aa/eps noise)
    small = angle2 < 1e-16
    return jnp.where(small, eye, R)


def rotation_matrix_to_angleaxis(R: jax.Array) -> jax.Array:
    """Inverse Rodrigues, batched. R: [..., 3, 3] -> aa: [..., 3].

    Uses the quaternion route for numerical stability near 0 and pi.
    Matches Eigen::AngleAxisd(R) used by the reference reader
    (multivih5datareader.cpp:255-262).
    """
    q = _rotation_matrix_to_quaternion(R)
    return _quaternion_to_angleaxis(q)


def angleaxis_to_quaternion(aa: jax.Array) -> jax.Array:
    """aa: [..., 3] -> quaternion [..., 4] as (w, x, y, z)."""
    angle2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle2, 1e-24))
    half = 0.5 * angle
    # sin(half)/angle with Taylor fallback for tiny angles
    sinc_half = jnp.where(angle2 < 1e-16, 0.5 - angle2 / 48.0, jnp.sin(half) / angle)
    w = jnp.cos(half)
    xyz = aa * sinc_half
    return jnp.concatenate([w, xyz], axis=-1)


def _rotation_matrix_to_quaternion(R: jax.Array) -> jax.Array:
    """R: [..., 3, 3] -> (w, x, y, z) with w >= 0. Shepperd's method,
    branch-free (computes all four candidates, picks the best-conditioned)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four squared magnitudes (up to factor 4)
    qw2 = jnp.maximum(0.0, 1.0 + tr)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # candidate quaternions from each pivot
    def _safe(x):
        return jnp.maximum(x, 1e-12)

    sw = jnp.sqrt(_safe(qw2))
    qa = jnp.stack([sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], -1)
    sx = jnp.sqrt(_safe(qx2))
    qb = jnp.stack([(m21 - m12) / sx, sx, (m01 + m10) / sx, (m02 + m20) / sx], -1)
    sy = jnp.sqrt(_safe(qy2))
    qc = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, sy, (m12 + m21) / sy], -1)
    sz = jnp.sqrt(_safe(qz2))
    qd = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, sz], -1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], -1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([qa, qb, qc, qd], -2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def _quaternion_to_angleaxis(q: jax.Array) -> jax.Array:
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]
    scale = jnp.where(sin_half < 1e-12, 2.0, angle / jnp.maximum(sin_half, 1e-12))
    return xyz * scale


# ---------------------------------------------------------------------------
# camera helpers
# ---------------------------------------------------------------------------

def pixel_rays(height: int, width: int, intrinsics: jax.Array) -> jax.Array:
    """Unit-z viewing rays K^-1 (u, v, 1) for every pixel.

    intrinsics: [B, 4] normalized (fx, fy, cx, cy).
    Returns [B, H, W, 3] with last channel == 1.
    """
    dtype = intrinsics.dtype
    u = (jnp.arange(width, dtype=dtype) + 0.5) / width     # [W]
    v = (jnp.arange(height, dtype=dtype) + 0.5) / height   # [H]
    uu = jnp.broadcast_to(u[None, :], (height, width))
    vv = jnp.broadcast_to(v[:, None], (height, width))
    fx = intrinsics[:, 0][:, None, None]
    fy = intrinsics[:, 1][:, None, None]
    cx = intrinsics[:, 2][:, None, None]
    cy = intrinsics[:, 3][:, None, None]
    rx = (uu[None] - cx) / fx
    ry = (vv[None] - cy) / fy
    rz = jnp.ones_like(rx)
    return jnp.stack([rx, ry, rz], axis=-1)


def _rotate_points(R: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [B,3,3] rotations to [B,H,W,3] points with explicit fp32
    multiply-adds. (A dot_general here would ride the default matmul
    precision — bf16 on TPU — which is far too coarse for geometry.)"""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    r = R[:, None, None]  # [B,1,1,3,3]
    ox = r[..., 0, 0] * x + r[..., 0, 1] * y + r[..., 0, 2] * z
    oy = r[..., 1, 0] * x + r[..., 1, 1] * y + r[..., 1, 2] * z
    oz = r[..., 2, 0] * x + r[..., 2, 1] * y + r[..., 2, 2] * z
    return jnp.stack([ox, oy, oz], axis=-1)


def _as_bhw(depth: jax.Array) -> jax.Array:
    """Accept [B,H,W] or [B,H,W,1] and return [B,H,W]."""
    if depth.ndim == 4:
        if depth.shape[-1] != 1:
            raise ValueError(f"depth must have 1 channel, got {depth.shape}")
        return depth[..., 0]
    if depth.ndim != 3:
        raise ValueError(f"depth must be [B,H,W] or [B,H,W,1], got {depth.shape}")
    return depth


# ---------------------------------------------------------------------------
# depth_to_flow
# ---------------------------------------------------------------------------

def depth_to_flow(
    intrinsics: jax.Array,
    depth: jax.Array,
    rotation: jax.Array,
    translation: jax.Array,
    *,
    inverse_depth: bool = True,
    normalize_flow: bool = True,
) -> jax.Array:
    """Render the optical flow field implied by depth and egomotion.

    Reference contract: sops.depth_to_flow (call sites blocks_original.py:155,
    v2/losses.py:332-334); math follows the reader's computeFlow
    (multivih5datareader.cpp:369-424) specialized to relative motion.

    Args:
      intrinsics: [B, 4] normalized (fx, fy, cx, cy).
      depth: [B, H, W] or [B, H, W, 1]; inverse depth if `inverse_depth`.
      rotation: [B, 3] angle-axis of R12 (cam1 -> cam2).
      translation: [B, 3] t12.
      inverse_depth: input depth is 1/z.
      normalize_flow: flow in units of image width/height, else pixels.

    Returns:
      flow [B, H, W, 2] = (dx, dy). NaN where depth is invalid
      (<= 0 or non-finite).
    """
    d = _as_bhw(depth)
    B, H, W = d.shape
    rays = pixel_rays(H, W, intrinsics)  # [B,H,W,3]

    z = 1.0 / d if inverse_depth else d
    valid = jnp.isfinite(d) & (d > 0)
    z = jnp.where(valid, z, 1.0)  # keep math finite; mask at the end

    X1 = rays * z[..., None]  # [B,H,W,3]
    R = angleaxis_to_rotation_matrix(rotation)  # [B,3,3]
    X2 = _rotate_points(R, X1) + translation[:, None, None, :]

    fx = intrinsics[:, 0][:, None, None]
    fy = intrinsics[:, 1][:, None, None]
    cx = intrinsics[:, 2][:, None, None]
    cy = intrinsics[:, 3][:, None, None]
    z2 = X2[..., 2]
    u2 = fx * X2[..., 0] / z2 + cx
    v2 = fy * X2[..., 1] / z2 + cy

    dtype = d.dtype
    u1 = (jnp.arange(W, dtype=dtype) + 0.5) / W
    v1 = (jnp.arange(H, dtype=dtype) + 0.5) / H
    du = u2 - u1[None, None, :]
    dv = v2 - v1[None, :, None]
    if not normalize_flow:
        du = du * W
        dv = dv * H
    flow = jnp.stack([du, dv], axis=-1)
    nan = jnp.asarray(jnp.nan, dtype)
    return jnp.where(valid[..., None], flow, nan)


# ---------------------------------------------------------------------------
# flow_to_depth (triangulation)
# ---------------------------------------------------------------------------

def flow_to_depth(
    flow: jax.Array,
    intrinsics: jax.Array,
    rotation: jax.Array,
    translation: jax.Array,
    *,
    normalized_flow: bool = True,
    inverse_depth: bool = True,
) -> jax.Array:
    """Per-pixel two-view triangulation: recover depth from flow + motion.

    This is the inverse of `depth_to_flow` (validated as such in tests):
    for pixel p1 with correspondence p2 = p1 + flow, find z minimizing the
    algebraic reprojection error of K(R z r1 + t) against p2 (linear least
    squares in z, two equations one unknown).

    Reference contract: sops.flow_to_depth (blocks_original.py:344-360).

    Args:
      flow: [B, H, W, 2].
      intrinsics / rotation / translation: as in depth_to_flow.
      normalized_flow: flow in width/height units, else pixels.
      inverse_depth: return 1/z instead of z.

    Returns:
      depth [B, H, W, 1].
    """
    B, H, W, _ = flow.shape
    dtype = flow.dtype
    rays = pixel_rays(H, W, intrinsics)  # r1
    R = angleaxis_to_rotation_matrix(rotation)
    a = _rotate_points(R, rays)  # R r1

    fx = intrinsics[:, 0][:, None, None]
    fy = intrinsics[:, 1][:, None, None]
    cx = intrinsics[:, 2][:, None, None]
    cy = intrinsics[:, 3][:, None, None]

    # project direction and translation into normalized pixel homogeneous coords
    ahat1 = fx * a[..., 0] + cx * a[..., 2]
    ahat2 = fy * a[..., 1] + cy * a[..., 2]
    ahat3 = a[..., 2]
    t = translation
    bhat1 = (intrinsics[:, 0] * t[:, 0] + intrinsics[:, 2] * t[:, 2])[:, None, None]
    bhat2 = (intrinsics[:, 1] * t[:, 1] + intrinsics[:, 3] * t[:, 2])[:, None, None]
    bhat3 = t[:, 2][:, None, None]

    u1 = (jnp.arange(W, dtype=dtype) + 0.5) / W
    v1 = (jnp.arange(H, dtype=dtype) + 0.5) / H
    du = flow[..., 0] / (1.0 if normalized_flow else W)
    dv = flow[..., 1] / (1.0 if normalized_flow else H)
    u2 = u1[None, None, :] + du
    v2 = v1[None, :, None] + dv

    # z * (ahat - u2 * ahat3) = u2 * bhat3 - bhat   (for both coordinates)
    A1 = ahat1 - u2 * ahat3
    A2 = ahat2 - v2 * ahat3
    B1 = u2 * bhat3 - bhat1
    B2 = v2 * bhat3 - bhat2
    denom = A1 * A1 + A2 * A2
    z = (A1 * B1 + A2 * B2) / jnp.maximum(denom, 1e-20)

    out = 1.0 / z if inverse_depth else z
    valid = jnp.isfinite(du) & jnp.isfinite(dv)
    nan = jnp.asarray(jnp.nan, dtype)
    out = jnp.where(valid, out, nan)
    return out[..., None]


def flow_to_depth2(
    flow: jax.Array,
    intrinsics: jax.Array,
    rotation: jax.Array,
    translation: jax.Array,
    *,
    normalized_flow: bool = True,
    inverse_depth: bool = True,
) -> jax.Array:
    """v2 variant of flow_to_depth (reference call site v2/blocks.py:362-379).

    Identical triangulation, but negative (behind-camera) solutions are
    clamped to 0 so the caller's clip to [0, 50] keeps a clean support.
    """
    d = flow_to_depth(
        flow,
        intrinsics,
        rotation,
        translation,
        normalized_flow=normalized_flow,
        inverse_depth=inverse_depth,
    )
    return jnp.maximum(d, 0.0)


# ---------------------------------------------------------------------------
# depth_to_normals
# ---------------------------------------------------------------------------

def depth_to_normals(
    depth: jax.Array,
    intrinsics: jax.Array,
    *,
    inverse_depth: bool = True,
) -> jax.Array:
    """Surface normals from a depth map (reference: sops.depth_to_normals,
    v2/losses.py:336-337; forward-only, used for ground-truth generation).

    Normals are computed from central differences of the back-projected
    3D point map and oriented toward the camera (n . ray < 0), so a
    fronto-parallel plane yields n = (0, 0, -1).

    Args:
      depth: [B, H, W] or [B, H, W, 1].
      intrinsics: [B, 4].

    Returns:
      normals [B, H, W, 3], NaN where the local neighborhood is invalid.
    """
    d = _as_bhw(depth)
    B, H, W = d.shape
    rays = pixel_rays(H, W, intrinsics)
    valid = jnp.isfinite(d) & (d > 0)
    z = jnp.where(valid, 1.0 / d if inverse_depth else d, jnp.nan)
    X = rays * z[..., None]  # [B,H,W,3]

    # central differences with edge replication (keeps shape)
    def ddx(t):
        left = jnp.concatenate([t[:, :, :1], t[:, :, :-1]], axis=2)
        right = jnp.concatenate([t[:, :, 1:], t[:, :, -1:]], axis=2)
        return right - left

    def ddy(t):
        top = jnp.concatenate([t[:, :1], t[:, :-1]], axis=1)
        bot = jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)
        return bot - top

    tx = ddx(X)
    ty = ddy(X)
    n = jnp.cross(tx, ty)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # orient toward the camera
    flip = jnp.sum(n * rays, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    # invalid where the neighborhood produced non-finite values OR the
    # center pixel itself is invalid (central differences skip the center)
    ok = jnp.all(jnp.isfinite(n), axis=-1, keepdims=True) & valid[..., None]
    return jnp.where(ok, n, jnp.nan)
