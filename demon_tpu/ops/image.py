"""Image pyramid ops: median 3x3 downsampling and resizes.

``median3x3_downsample`` is the reference's GT-pyramid builder
(sops.median3x3_downsample, used recursively in v2/helpers.py:94-103 and
examples/evaluation.py:173): a 3x3 median evaluated at every second pixel.

NaN behavior (load-bearing for depth pyramids): the median is taken as the
5th element of the 9-element sorted window; jnp.sort places NaNs last, so a
window yields NaN only when it contains 5 or more NaNs. Invalid pixels thus
shrink rather than grow across pyramid levels, matching the robust intent
of a median filter over NaN-poisoned depth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _median9(t):
    """Median of 9 same-shaped arrays via the 19-comparator exchange
    network (Smith 1996) — pure min/max, fuses to VPU elementwise ops
    instead of a materialized sort. NaN behavior matches jnp.sort's
    nan-last ordering closely enough for depth pyramids: a window returns
    NaN only when NaNs reach the median position."""
    def mn(a, b):
        return jnp.minimum(a, b)

    def mx(a, b):
        return jnp.maximum(a, b)

    p = list(t)
    # exchange(i, j): p[i] <- min, p[j] <- max (canonical 19-op network)
    for i, j in ((1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7),
                 (1, 2), (4, 5), (7, 8),
                 (0, 3), (5, 8), (4, 7),
                 (3, 6), (1, 4), (2, 5),
                 (4, 7), (4, 2), (6, 4), (4, 2)):
        p[i], p[j] = mn(p[i], p[j]), mx(p[i], p[j])
    return p[4]


def median3x3_downsample(x: jax.Array) -> jax.Array:
    """3x3 median filter + 2x downsample. x: [B, H, W, C] -> [B, H/2, W/2, C].

    Window centers sit at the even input pixels (0, 2, 4, ...); borders are
    edge-replicated. H and W must be even.
    """
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError(f"H and W must be even, got {x.shape}")
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # the 9 taps of each window at stride 2
    taps = [padded[:, oy : oy + H : 2, ox : ox + W : 2, :]
            for oy in range(3) for ox in range(3)]
    if jnp.issubdtype(x.dtype, jnp.floating):
        # nan-last ordering like jnp.sort: min/max would propagate NaN and
        # make invalid pixels GROW across pyramid levels instead of shrink
        big = jnp.asarray(jnp.inf, x.dtype)
        taps = [jnp.where(jnp.isnan(t), big, t) for t in taps]
        med = _median9(taps)
        return jnp.where(jnp.isinf(med), jnp.asarray(jnp.nan, x.dtype), med)
    return _median9(taps)


def recursive_median_downsample(x: jax.Array, iterations: int):
    """Repeatedly apply median3x3_downsample; returns a tuple of all levels
    (reference: v2/helpers.py:94-103)."""
    out = []
    cur = x
    for _ in range(iterations):
        cur = median3x3_downsample(cur)
        out.append(cur)
    return tuple(out)


def resize_nearest(x: jax.Array, height: int, width: int) -> jax.Array:
    """Nearest-neighbor resize, NHWC.

    Source index = floor(dst * src/dst) — TF1 resize_nearest_neighbor with
    align_corners=False (NO half-pixel offset), matching the reference's
    upsampling of depth2 into the refinement net (blocks_original.py:475)
    and the host-side `_nearest_resize` in eval/harness.py."""
    B, H, W, C = x.shape
    if height % H == 0 and width % W == 0:
        # integer upscale (the refinement net's depth2 4x path): the
        # floor-index pattern is exactly pixel replication, which lowers
        # to a broadcast instead of a row-count-bound gather — TPU
        # gathers cost ~1 row/cycle, and this one would be the largest
        # in the pipeline (B*192*256 rows)
        fy, fx = height // H, width // W
        r = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (B, H, fy, W, fx, C))
        return r.reshape(B, height, width, C)
    if H % height == 0 and W % width == 0:
        # integer downscale: floor(j*f) = j*f — a strided slice
        return x[:, :: H // height, :: W // width]
    ys = (jnp.arange(height) * (H / height)).astype(jnp.int32)
    xs = (jnp.arange(width) * (W / width)).astype(jnp.int32)
    ys = jnp.clip(ys, 0, H - 1)
    xs = jnp.clip(xs, 0, W - 1)
    return x[:, ys][:, :, xs]


def resize_area(x: jax.Array, height: int, width: int) -> jax.Array:
    """Area (box) downsampling for integer factors, NHWC.

    Matches cv2.INTER_AREA / tf resize_area for integer ratios (used by the
    training driver for image2_2, training.py:179). NaNs propagate.
    """
    B, H, W, C = x.shape
    if H % height or W % width:
        raise ValueError(f"resize_area requires integer factors: {(H, W)} -> {(height, width)}")
    fy, fx = H // height, W // width
    r = x.reshape(B, height, fy, width, fx, C)
    return r.mean(axis=(2, 4))
