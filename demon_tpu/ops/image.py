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


def median3x3_downsample(x: jax.Array) -> jax.Array:
    """3x3 median filter + 2x downsample. x: [B, H, W, C] -> [B, H/2, W/2, C].

    Window centers sit at the even input pixels (0, 2, 4, ...); borders are
    edge-replicated. H and W must be even.
    """
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError(f"H and W must be even, got {x.shape}")
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # gather the 9 taps of each window at stride 2
    taps = []
    for oy in range(3):
        for ox in range(3):
            taps.append(padded[:, oy : oy + H : 2, ox : ox + W : 2, :])
    stacked = jnp.stack(taps, axis=-1)  # [B, H/2, W/2, C, 9]
    s = jnp.sort(stacked, axis=-1)
    return s[..., 4]


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
    """Nearest-neighbor resize, NHWC (TF resize_nearest_neighbor semantics
    with half-pixel source sampling — used for upsampling depth2 into the
    refinement net, blocks_original.py:475)."""
    B, H, W, C = x.shape
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
