"""Backward image warping by a flow field (the ``sops.warp2d`` equivalent).

Reference contract: blocks_original.py:171-176,336-339 — bilinear backward
warp of image 2 by a (normalized) displacement field; out-of-bounds samples
filled with a constant (zeros for 'value' border mode). Differentiable in
both image and flow (the reference wraps calls in stop_gradient, but the
op itself has gradients; we simply rely on autodiff through the gather).

Implementation: one-shot bilinear gather expressed with take_along_axis on
the flattened H*W axis, which XLA lowers to an efficient TPU gather. A
Pallas kernel variant lives in ops/pallas for the serving path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp2d(
    image: jax.Array,
    displacements: jax.Array,
    *,
    normalized: bool = True,
    border_mode: str = "value",
    border_value: float = 0.0,
) -> jax.Array:
    """Sample `image` at (pixel + displacement) with bilinear interpolation.

    Args:
      image: [B, H, W, C].
      displacements: [B, H, W, 2] flow (dx, dy); units of width/height when
        `normalized`, else pixels. Non-finite displacements produce the
        border value.
      border_mode: 'value' (constant fill) or 'clamp' (edge replication).

    Returns:
      warped image [B, H, W, C].
    """
    if border_mode not in ("value", "clamp"):
        raise ValueError(f"unsupported border_mode {border_mode!r}")
    B, H, W, C = image.shape
    dtype = image.dtype

    dx = displacements[..., 0]
    dy = displacements[..., 1]
    if normalized:
        dx = dx * W
        dy = dy * H
    finite = jnp.isfinite(dx) & jnp.isfinite(dy)
    dx = jnp.where(finite, dx, 0.0)
    dy = jnp.where(finite, dy, 0.0)

    # sample position in index space: pixel centers are at integer indices
    # here because source and target grids share the +0.5 offset.
    xs = jnp.arange(W, dtype=dx.dtype)[None, None, :] + dx
    ys = jnp.arange(H, dtype=dy.dtype)[None, :, None] + dy

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    # non-finite displacements always produce the border value; per-tap
    # out-of-bounds handling happens inside gather() for 'value' mode
    inb = finite

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        flat_idx = (yc * W + xc).reshape(B, H * W, 1)
        flat_img = image.reshape(B, H * W, C)
        vals = jnp.take_along_axis(flat_img, flat_idx, axis=1).reshape(B, H, W, C)
        if border_mode == "value":
            ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            vals = jnp.where(ok[..., None], vals, jnp.asarray(border_value, dtype))
        return vals

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[..., None].astype(dtype)
    wy = wy[..., None].astype(dtype)
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    out = jnp.where(inb[..., None], out, jnp.asarray(border_value, dtype))
    return out
