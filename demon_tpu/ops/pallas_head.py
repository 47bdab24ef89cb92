"""Pallas fused prediction head: conv3x3(cout~24)+lrelu -> conv3x3(cout<=4).

DeMoN's prediction heads (_predict_flow / _predict_depthnormal, reference
blocks_original.py:23-51,238-294, v2/blocks.py:24-52,257-314) are 3x3
convs with 24 (16) and 4 (1) output channels. On the MXU a conv with
cout=24 uses 24 of 128 output lanes — ~5x waste — and the profile shows
the heads costing a disproportionate share of device time.

This kernel restructures each head conv as ONE packed matmul:

    partial[p, t*Cp + c] = x[p, :] @ W[t][:, c]      (t = 9 taps)

i.e. all 9 taps ride the N dimension together (N = 9*32 = 288 lanes,
~2.25 tiles instead of 9 single-tile passes), then the taps are reduced
with 9 shifted adds on the VPU — a zero-FLOP relayout instead of 9
underutilized MXU passes. The second conv is packed the same way, and the
24-channel intermediate never leaves VMEM.

Caffe and TF-SAME padding coincide here (stride 1, odd kernel). Operands
stay in the input dtype (bf16 rides the MXU natively); accumulation fp32.
Inference-only (no custom VJP) — callers gate exactly like
ops.pallas_conv (models/layers.py convrelu2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAK = 0.1
_CP = 32  # per-tap lane stride the packed weights are padded to


def _lrelu(x):
    return jnp.where(x >= 0, x, _LEAK * x)


def _pack_w(w, cp):
    """[3,3,cin,cout] -> [cin, 9*cp] with each tap's columns zero-padded
    to cp lanes (tap-major)."""
    k2 = w.shape[0] * w.shape[1]
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cp - cout)))
    return wp.reshape(k2, cin, cp).transpose(1, 0, 2).reshape(cin, k2 * cp)


def _packed_conv3(x2d, wpacked, h, w, cout_p):
    """x2d [h*w, cin] -> conv3x3 via one matmul + 9 shifted VPU adds.
    Returns [h, w, cout_p] fp32 (padded lanes are zero)."""
    partial = jax.lax.dot_general(
        x2d, wpacked, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [h*w, 9*cp]
    partial = partial.reshape(h, w, 9 * cout_p)
    pp = jnp.pad(partial, ((1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((h, w, cout_p), jnp.float32)
    for t in range(9):
        dy, dx = t // 3, t % 3
        out = out + pp[dy : dy + h, dx : dx + w,
                       t * cout_p : (t + 1) * cout_p]
    return out


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, c2):
    dt = x_ref.dtype
    x = x_ref[0]                                     # [H, W, cin]
    H, W, cin = x.shape
    mid = _packed_conv3(x.reshape(H * W, cin), w1_ref[...], H, W, _CP)
    mid = _lrelu(mid + b1_ref[...].astype(jnp.float32)).astype(dt)
    out = _packed_conv3(mid.reshape(H * W, _CP), w2_ref[...], H, W, _CP)
    out = out + b2_ref[...].astype(jnp.float32)
    out_ref[0] = out[:, :, :c2].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_head(x: jax.Array, w1: jax.Array, b1: jax.Array,
               w2: jax.Array, b2: jax.Array,
               interpret: bool = None) -> jax.Array:
    """x [B,H,W,Cin]; w1 [3,3,Cin,C1] (C1<=32); w2 [3,3,C1,C2] (C2<=32).
    Returns conv3x3(lrelu(conv3x3(x)+b1))+b2, stride 1, caffe/SAME pad."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    B, H, W, Cin = x.shape
    c1, c2 = w1.shape[-1], w2.shape[-1]
    w1p = _pack_w(w1, _CP)
    b1p = jnp.pad(b1, (0, _CP - c1))
    # zero-pad conv2's input channels to _CP to match mid's padded lanes
    w2p = _pack_w(jnp.pad(w2, ((0, 0), (0, 0), (0, _CP - c1), (0, 0))), _CP)
    b2p = jnp.pad(b2, (0, _CP - c2))

    return pl.pallas_call(
        functools.partial(_kernel, c2=c2),
        out_shape=jax.ShapeDtypeStruct((B, H, W, c2), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1p.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1p.shape, lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2p.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2p.shape, lambda b: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, c2), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w1p, b1p, w2p, b2p)
