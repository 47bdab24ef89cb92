"""Pallas fused factored-conv pair: LReLU(conv1xk(LReLU(convkx1(x)))).

Every DeMoN "conv" is a (k,1) then (1,k) pair with leaky-ReLU after each
(models/layers.py convrelu2). XLA runs them as two convolutions with the
intermediate round-tripping through HBM; since the whole pipeline is
HBM-bound (BENCHMARKS.md), that round trip is pure waste. This kernel
keeps the intermediate entirely in VMEM: the grid walks the batch, each
step loads one image, computes the (k,1) conv as k shifted matmuls on the
MXU, activates, runs the (1,k) conv on the VMEM-resident intermediate,
and writes only the final activations. At DeMoN's operating shapes every
per-image activation fits VMEM (<= ~2 MB).

Scope: stride 1, same/caffe padding (identical at stride 1), NHWC.
Covers the conv*_1 / conv2_extra_inputs layers (about half the trunk);
strided pairs stay on XLA. Not yet wired into the model (parity risk
budget for round 1) — see NOTES_NEXT_ROUND.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAK = 0.1


def _lrelu(x):
    return jnp.where(x >= 0, x, _LEAK * x)


def _kernel(x_ref, wy_ref, by_ref, wx_ref, bx_ref, out_ref, *,
            k, h, w, cin, cmid, cout):
    """Grid: (B,). x_ref: [1, h + k - 1, w, cin] (pre-padded in H);
    out_ref: [1, h, w, cout]."""
    pad = k // 2

    x = x_ref[0].astype(jnp.float32)          # [h+k-1, w, cin]
    wy = wy_ref[...].astype(jnp.float32)      # [k, cin, cmid]
    wx = wx_ref[...].astype(jnp.float32)      # [k, cmid, cout]

    # (k,1) conv: mid[r, c, m] = sum_t x[r + t, c, :] @ wy[t]
    mid = jnp.zeros((h, w, cmid), jnp.float32)
    for t in range(k):
        xs = x[t : t + h].reshape(h * w, cin)
        mid += jax.lax.dot_general(
            xs, wy[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(h, w, cmid)
    mid = _lrelu(mid + by_ref[...].astype(jnp.float32))

    # (1,k) conv on the VMEM-resident intermediate with zero x-padding
    zero = jnp.zeros((h, pad, cmid), jnp.float32)
    midp = jnp.concatenate([zero, mid, zero], axis=1)  # [h, w+k-1, cmid]
    out = jnp.zeros((h, w, cout), jnp.float32)
    for t in range(k):
        ms = midp[:, t : t + w].reshape(h * w, cmid)
        out += jax.lax.dot_general(
            ms, wx[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(h, w, cout)
    out = _lrelu(out + bx_ref[...].astype(jnp.float32))
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fused_convrelu2_s1(x: jax.Array, wy: jax.Array, by: jax.Array,
                       wx: jax.Array, bx: jax.Array, *, k: int,
                       interpret: bool = False) -> jax.Array:
    """x [B,H,W,Cin]; wy [k,1,Cin,Cmid]; wx [1,k,Cmid,Cout] (flax Conv
    kernels of the (k,1)/(1,k) pair); stride 1. Returns [B,H,W,Cout]."""
    B, H, W, Cin = x.shape
    Cmid = wy.shape[-1]
    Cout = wx.shape[-1]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))

    return pl.pallas_call(
        functools.partial(_kernel, k=k, h=H, w=W, cin=Cin,
                          cmid=Cmid, cout=Cout),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + k - 1, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, Cin, Cmid), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cmid,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, Cmid, Cout), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, wy[:, 0], by, wx[0], bx)
