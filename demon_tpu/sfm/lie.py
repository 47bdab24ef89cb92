"""SO(3)/SE(3) Lie group operations, batched and jit/grad-safe.

Used by the pose-graph and bundle-adjustment optimizers. Conventions:
rotations as 3x3 matrices, poses as (R, t) world-to-camera
(X_cam = R X_world + t), tangent vectors as [omega, v] with rotation
first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _hat(w: jax.Array) -> jax.Array:
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([zeros, -wz, wy], -1),
        jnp.stack([wz, zeros, -wx], -1),
        jnp.stack([-wy, wx, zeros], -1),
    ], -2)


def so3_exp(w: jax.Array) -> jax.Array:
    """Exponential map [..., 3] -> [..., 3, 3]; Taylor-safe at 0."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = _hat(w)
    K2 = K @ K
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2,
                  0.5 - theta2 / 24.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jax.Array) -> jax.Array:
    """Log map [..., 3, 3] -> [..., 3]; stable away from pi.

    Differentiation-safe at the identity: both `where` branches stay
    finite under jacfwd/jacrev (an arccos formulation produces NaN
    gradients at theta = 0, which poisons Gauss-Newton residuals of
    well-fit pose-graph edges)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1)                                    # = 2 sin(theta) * axis
    sin2 = jnp.sum(w * w, axis=-1) / 4.0      # sin^2 theta
    small = sin2 < 1e-10
    sin_safe = jnp.sqrt(jnp.where(small, 1.0, sin2))
    theta = jnp.arctan2(sin_safe, cos_theta)
    scale = jnp.where(small, 0.5 + sin2 / 12.0,
                      theta / (2.0 * sin_safe))
    return w * scale[..., None]


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    """V such that se3_exp translation = V @ v."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = _hat(w)
    K2 = K @ K
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2,
                  0.5 - theta2 / 24.0)
    c = jnp.where(theta2 > _EPS, (theta - jnp.sin(theta)) / (theta2 * theta),
                  1.0 / 6.0 - theta2 / 120.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + b * K + c * K2


def se3_exp(xi: jax.Array):
    """[..., 6] = [omega, v] -> (R [..., 3, 3], t [..., 3])."""
    w = xi[..., :3]
    v = xi[..., 3:]
    R = so3_exp(w)
    V = _so3_left_jacobian(w)
    t = (V @ v[..., None])[..., 0]
    return R, t


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R, t) -> [..., 6]. Inverse of se3_exp."""
    w = so3_log(R)
    V = _so3_left_jacobian(w)
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra, ta) o (Rb, tb): X -> Ra (Rb X + tb) + ta."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]
