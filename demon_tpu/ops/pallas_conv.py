"""Pallas fused factored-conv pair: LReLU(conv1xk(LReLU(convkx1(x)))).

Every DeMoN "conv" is a (k,1) then (1,k) pair with leaky-ReLU after each
(models/layers.py convrelu2; reference helpers.py:105-153). XLA runs them
as two convolutions with the intermediate activation round-tripping
through HBM; since the whole pipeline is HBM-bound (BENCHMARKS.md), that
round trip is pure waste. This kernel keeps the intermediate entirely in
VMEM: the grid walks the batch, each step loads one image, computes the
(k,1) conv as k shifted matmuls on the MXU (operands stay in the input
dtype so bf16 rides the MXU natively; accumulation is fp32), activates,
transposes H<->W in VMEM, runs the (1,k) conv the same way on the
resident intermediate, and writes only the final activations.

Strided pairs apply stride to H in the first conv and W in the second
(exactly flax's strides=(s,1)/(1,s)); the stride-s row subsampling is a
free outer-dim reshape, never a strided lane/sublane access. Both caffe
padding (pad k//2 both sides then VALID, reference helpers.py:70-153) and
TF 'SAME' (v2/helpers.py:24-91) geometries are supported; they differ by
a one-pixel shift for stride 2.

VMEM: per-image blocks; lanes pad the channel dim to 128, so the entry
layer (cin=6) is excluded by callers (models/layers.py gates on cin>=32).
At every other DeMoN operating shape the working set is <= ~8 MB.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAK = 0.1


def _lrelu(x):
    return jnp.where(x >= 0, x, _LEAK * x)


def _pads(size: int, k: int, stride: int, pad_mode: str):
    """(out_size, pad_before, padded_size). padded_size is sized so every
    shifted window slice [t : t + stride*out] with t < k fits (one extra
    trailing zero row beyond the minimum when stride*out + k - 1 exceeds
    the TF-padded extent; the surplus only lands in discarded phases)."""
    if pad_mode == "caffe":
        p = k // 2
        out = (size + 2 * p - k) // stride + 1
        before = p
    elif pad_mode == "same":
        out = math.ceil(size / stride)
        total = max((out - 1) * stride + k - size, 0)
        before = total // 2
    else:
        raise ValueError(f"unknown pad_mode {pad_mode!r}")
    padded = stride * out + k - 1
    if padded < size + before:
        raise ValueError("kernel/stride combination shrinks below input")
    return out, before, padded


def _shift_matmul(xp, w, out_len, stride, k):
    """sum_t xp[t + stride*i] @ w[t] over leading-dim windows.

    xp: [padded, N, cin]; w: [k, cin, cout]; returns [out_len, N, cout]
    fp32. The stride-s subsample is reshape+outer-index (layout-free)."""
    padded, n, cin = xp.shape
    cout = w.shape[-1]
    acc = jnp.zeros((out_len * n, cout), jnp.float32)
    for t in range(k):
        if stride == 1:
            xs = xp[t : t + out_len]
        else:
            xs = xp[t : t + stride * out_len]
            xs = xs.reshape(out_len, stride, n, cin)[:, 0]
        acc = acc + jax.lax.dot_general(
            xs.reshape(out_len * n, cin), w[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc.reshape(out_len, n, cout)


def _kernel(x_ref, wy_ref, by_ref, wx_ref, bx_ref, out_ref, *,
            k, stride, h_out, w_out, pt, pl_, ph, pw):
    dt = x_ref.dtype
    x = x_ref[0]                                  # [H, W, cin]
    H, W, cin = x.shape
    cmid = wy_ref.shape[-1]
    cout = wx_ref.shape[-1]

    # (k,1) conv, stride (s,1): pad H with zeros in VMEM, k shifted matmuls
    xp = jnp.concatenate([
        jnp.zeros((pt, W, cin), dt), x,
        jnp.zeros((ph - H - pt, W, cin), dt)], axis=0)
    mid = _shift_matmul(xp, wy_ref[...], h_out, stride, k)
    mid = _lrelu(mid + by_ref[...].astype(jnp.float32)).astype(dt)

    # (1,k) conv, stride (1,s): transpose so W is the leading dim and the
    # same outer-dim window walk applies (no strided sublane access)
    midT = mid.transpose(1, 0, 2)                 # [W, h_out, cmid]
    midTp = jnp.concatenate([
        jnp.zeros((pl_, h_out, cmid), dt), midT,
        jnp.zeros((pw - W - pl_, h_out, cmid), dt)], axis=0)
    outT = _shift_matmul(midTp, wx_ref[...], w_out, stride, k)
    out = _lrelu(outT + bx_ref[...].astype(jnp.float32)).transpose(1, 0, 2)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("k", "stride", "pad_mode", "interpret"))
def fused_convrelu2(x: jax.Array, wy: jax.Array, by: jax.Array,
                    wx: jax.Array, bx: jax.Array, *, k: int, stride: int = 1,
                    pad_mode: str = "caffe",
                    interpret: bool = None) -> jax.Array:
    """x [B,H,W,Cin]; wy [k,1,Cin,Cmid]; wx [1,k,Cmid,Cout] (flax Conv
    kernels of the (k,1)/(1,k) pair). Returns [B,h_out,w_out,Cout].

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (keeps the CPU test suite exercising the exact same code path)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    B, H, W, Cin = x.shape
    Cmid = wy.shape[-1]
    Cout = wx.shape[-1]
    h_out, pt, ph = _pads(H, k, stride, pad_mode)
    w_out, pl_, pw = _pads(W, k, stride, pad_mode)

    return pl.pallas_call(
        functools.partial(_kernel, k=k, stride=stride, h_out=h_out,
                          w_out=w_out, pt=pt, pl_=pl_, ph=ph, pw=pw),
        out_shape=jax.ShapeDtypeStruct((B, h_out, w_out, Cout), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, Cin, Cmid), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cmid,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, Cmid, Cout), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, wy[:, 0], by, wx[0], bx)


def fused_convrelu2_s1(x, wy, by, wx, bx, *, k, interpret=False):
    """Back-compat alias (stride 1; caffe == SAME for odd k)."""
    return fused_convrelu2(x, wy, by, wx, bx, k=k, stride=1,
                           pad_mode="caffe", interpret=interpret)
