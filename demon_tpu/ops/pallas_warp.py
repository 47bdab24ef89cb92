"""Pallas TPU kernel for bilinear backward warping (warp2d).

The jnp warp2d (ops/warp.py) lowers to 4 XLA gathers over the flattened
image — on TPU a gather is a serialized loop. This kernel reformulates
bilinear warping as an MXU matmul: for each block of output pixels, the
4-tap interpolation is a sparse row of a [P_out, P_src] weight matrix;
the block of that matrix is materialized on the fly from tap indices via
iota comparison and multiplied against the flattened source image. All
FLOPs land on the MXU, no gathers.

Cost: HW x HW x C MACs per image — at the 48x64 operating point where
DeMoN warps (blocks_original.py:171, image2_2), that is ~28M MACs, noise
for the MXU.

Measured on v5e (B=16, 48x64x3, standalone dispatch): 1.93 ms/call vs
1.08 ms/call for the jnp gather version — both dominated by dispatch
overhead at this size, and inside the fused pipeline XLA fuses the
gather with its producers. The jnp version therefore remains the default
(ops.warp2d); this kernel is kept as the MXU alternative for standalone
large-batch warping workloads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(flow_ref, image_ref, out_ref, *, h, w, c,
                 block_out, block_src, normalized, border_value):
    """Grid: (batch, num_out_blocks). image_ref: [HW, C] of one batch
    element; flow_ref: [block_out, 2]; out_ref: [block_out, C]."""
    hw = h * w
    po = pl.program_id(1)

    dx = flow_ref[0, :, 0:1]  # [block_out, 1] — keep 2D for the VPU
    dy = flow_ref[0, :, 1:2]
    if normalized:
        dx = dx * w
        dy = dy * h
    finite = jnp.isfinite(dx) & jnp.isfinite(dy)
    dx = jnp.where(finite, dx, jnp.asarray(2.0 * w, dx.dtype))
    dy = jnp.where(finite, dy, jnp.asarray(2.0 * h, dy.dtype))

    # output pixel coordinates of this block
    base = po * block_out
    lin = base + jax.lax.broadcasted_iota(jnp.int32, (block_out, 1), 0)
    ox = (lin % w).astype(dx.dtype)
    oy = (lin // w).astype(dy.dtype)

    xs = ox + dx
    ys = oy + dy
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)
    wy = (ys - y0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # accumulate the 4 taps into out
    acc = jnp.zeros((block_out, c), jnp.float32)
    num_src_blocks = hw // block_src
    for tap_dy in (0, 1):
        for tap_dx in (0, 1):
            xi = x0i + tap_dx
            yi = y0i + tap_dy
            wgt = (wx if tap_dx else (1.0 - wx)) * \
                (wy if tap_dy else (1.0 - wy))
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            flat = jnp.where(ok, yi * w + xi, -1)     # [block_out, 1]
            wgt = jnp.where(ok, wgt, 0.0).astype(jnp.float32)

            def body(qs, acc):
                src = image_ref[0, pl.ds(qs * block_src, block_src), :]
                col = qs * block_src + jax.lax.broadcasted_iota(
                    jnp.int32, (block_out, block_src), 1)
                sel = (flat == col).astype(jnp.float32)   # one-hot rows
                m = sel * wgt
                return acc + jax.lax.dot_general(
                    m, src.astype(jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(0, num_src_blocks, body, acc)

    acc = jnp.where(finite, acc, jnp.asarray(border_value, jnp.float32))
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("normalized", "border_value",
                                             "block_out", "block_src"))
def warp2d_pallas(image: jax.Array, displacements: jax.Array,
                  normalized: bool = True, border_value: float = 0.0,
                  block_out: int = 256, block_src: int = 512) -> jax.Array:
    """Pallas bilinear backward warp. image [B, H, W, C], displacements
    [B, H, W, 2] -> [B, H, W, C]. Semantics match ops.warp2d with
    border_mode='value'."""
    B, H, W, C = image.shape
    hw = H * W
    if hw % block_out or hw % block_src:
        raise ValueError(f"H*W={hw} must divide block sizes "
                         f"({block_out}, {block_src})")
    flow_flat = displacements.reshape(B, hw, 2)
    img_flat = image.reshape(B, hw, C)

    grid = (B, hw // block_out)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, h=H, w=W, c=C, block_out=block_out,
                          block_src=block_src, normalized=normalized,
                          border_value=border_value),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), image.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_out, 2), lambda b, p: (b, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, C), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_out, C), lambda b, p: (b, p, 0),
                               memory_space=pltpu.VMEM),
    )(flow_flat, img_flat)
    return out.reshape(B, H, W, C)
