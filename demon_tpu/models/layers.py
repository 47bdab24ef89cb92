"""Conv/dense building blocks shared by all DeMoN networks.

Layout is NHWC (TPU native). Two padding modes:

* ``caffe`` — pad kernel//2 on *both* sides, then VALID convolution. For
  odd kernels with stride 2 this differs from SAME by a one-pixel shift;
  it must be preserved bit-exactly for v1 weight parity (reference
  helpers.py:70-153).
* ``same`` — TF 'SAME' padding (reference v2/helpers.py:24-91).

Every conv pair is factored ky x 1 then 1 x kx with leaky-ReLU(0.1) after
each (reference helpers.py:105-153) — on TPU these map onto the MXU as two
skinny matmuls and XLA fuses the activation.

Weight-manifest note: module names replicate the reference variable scopes
('conv1y', 'conv1x', 'upconv', 'motion_fc1', ...) so a converted TF
checkpoint maps 1:1 onto the flax param tree (see tools/converter.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import leaky_relu


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _tf_same_pad_s2(size: int, k: int) -> Tuple[int, int]:
    """TF 'SAME' padding (lo, hi) for a stride-2 window of size k."""
    out = -(-size // 2)
    tot = max((out - 1) * 2 + k - size, 0)
    return tot // 2, tot - tot // 2


@lru_cache(maxsize=None)
def _phased_axis_conv(axis: int, k: int, pad_lo: int, pad_hi: int):
    """Stride-2 conv along `axis` (1=H, 2=W; kernel k x 1 resp. 1 x k) with
    a phase-decomposed data gradient.

    Forward is the ordinary lax conv (bit-identical to nn.Conv). The
    backward-data pass is where XLA's derived gradient hurts on TPU: it
    emits a conv over the 2x input-dilated cotangent — a 50%-zeros operand
    the MXU chews at less than half forward efficiency (profiled 2.4x the
    forward time on the evo-4 step's conv1/conv2 layers). Like PhaseUpconv
    does for the model's explicit transpose convs, decompose by output
    phase instead:

        dx[2j + r] = sum_u w[2u + r + pad_lo] * dy[j - u]

    i.e. per phase r a dense stride-1 correlation of dy with the reversed
    tap subset — no zeros, same FLOPs as the forward. The weight gradient
    keeps XLA's own formulation (jax.vjp of the raw conv), and the math is
    element-identical to the derived gradient (tests/test_layers_phased.py).
    """
    stride = (2, 1) if axis == 1 else (1, 2)
    pad = [(pad_lo, pad_hi), (0, 0)] if axis == 1 else \
          [(0, 0), (pad_lo, pad_hi)]

    def raw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.custom_vjp
    def conv(x, w, b):
        return raw(x, w) + b

    def fwd(x, w, b):
        return conv(x, w, b), (x, w)

    def bwd(res, g):
        x, w = res
        cin, cout = w.shape[2], w.shape[3]
        wk = w.reshape(k, cin, cout)  # taps along the strided axis
        phases = []
        for r in (0, 1):
            u_min = -((r + pad_lo) // 2)
            u_max = (k - 1 - r - pad_lo) // 2
            taps = [2 * u + r + pad_lo for u in range(u_min, u_max + 1)]
            K = jnp.stack([wk[t] for t in reversed(taps)], 0)
            Kd = jnp.transpose(K, (0, 2, 1))  # [K_r, Cout, Cin]
            if axis == 1:
                Kd = Kd[:, None]
                p = [(u_max, -u_min), (0, 0)]
            else:
                Kd = Kd[None, :]
                p = [(0, 0), (u_max, -u_min)]
            phases.append(jax.lax.conv_general_dilated(
                g, Kd, (1, 1), p,
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        y = jnp.stack(phases, axis=axis + 1)
        shp = list(g.shape)
        shp[axis] *= 2
        shp[-1] = cin
        dx = y.reshape(shp)
        _, wvjp = jax.vjp(lambda w_: raw(x, w_), w)
        dw, = wvjp(g)
        db = g.sum((0, 1, 2))
        return dx, dw, db

    conv.defvjp(fwd, bwd)
    return conv


def _kernel_init():
    # variance_scaling matches the reference's
    # tf.contrib.layers.variance_scaling_initializer() (helpers.py:66-67):
    # scale=2.0, mode='fan_in', normal.
    return nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


class Conv2D(nn.Module):
    """Plain conv with caffe or SAME padding, optional activation."""

    features: int
    kernel: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    pad_mode: str = "caffe"
    activate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ky, kx = _pair(self.kernel)
        sy, sx = _pair(self.stride)
        if self.pad_mode == "caffe":
            padding = ((ky // 2, ky // 2), (kx // 2, kx // 2))
        elif self.pad_mode == "same":
            padding = "SAME"
        else:
            raise ValueError(f"unknown pad_mode {self.pad_mode!r}")
        y = nn.Conv(
            features=self.features,
            kernel_size=(ky, kx),
            strides=(sy, sx),
            padding=padding,
            kernel_init=_kernel_init(),
            dtype=self.dtype,
            name="conv",
        )(x)
        return leaky_relu(y) if self.activate else y


def conv2d(x, features, kernel, *, name, pad_mode, stride=1, dtype=jnp.float32,
           activate=False, pallas=False, phased_bwd=False):
    """Functional helper usable inside a parent @nn.compact context.

    Creates an unwrapped nn.Conv named `name` (matching the reference's
    tf.layers.conv2d variable scope). `pallas` is accepted for call-site
    uniformity with convrelu2 and ignored (single convs stay on XLA); so
    is `phased_bwd` (it only applies to the factored stride-2 pairs)."""
    del pallas, phased_bwd
    ky, kx = _pair(kernel)
    sy, sx = _pair(stride)
    if pad_mode == "caffe":
        padding = ((ky // 2, ky // 2), (kx // 2, kx // 2))
    else:
        padding = "SAME"
    y = nn.Conv(
        features=features,
        kernel_size=(ky, kx),
        strides=(sy, sx),
        padding=padding,
        kernel_init=_kernel_init(),
        dtype=dtype,
        name=name,
    )(x)
    return leaky_relu(y) if activate else y


def convrelu(x, features, kernel, *, name, pad_mode, stride=1, dtype=jnp.float32,
             pallas=False, phased_bwd=False):
    """conv + leaky-ReLU (reference helpers.py:97-102 / v2/helpers.py:38-43)."""
    del pallas, phased_bwd
    return conv2d(
        x, features, kernel, name=name, pad_mode=pad_mode, stride=stride,
        dtype=dtype, activate=True,
    )


class _ConvParams(nn.Module):
    """Parameter holder with the exact tree of an nn.Conv (kernel+bias),
    for layers computed by a custom kernel instead of nn.Conv.__call__."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _kernel_init(), self.shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.shape[-1],),
                          jnp.float32)
        return kernel, bias


def _pallas_pair_fits(x, fy, fx, kernel, dtype) -> bool:
    """Whether the fused pallas pair's per-image VMEM working set fits.

    Lanes pad channels to 128; fp32 accumulators double buffer the two
    matmul chains. Budget ~16 MB/core; keep the estimate under half."""
    b, h, w, cin = x.shape
    lane = lambda c: -(-c // 128) * 128
    bpe = 2 if dtype == jnp.bfloat16 else 4
    x_block = h * w * lane(cin) * bpe * 3          # block + pad copy + dbuf
    mid = (h * w // 1) * lane(fy) * (4 + bpe * 2)  # acc + bf16 + transpose
    return (x_block + mid) < 8 * 1024 * 1024


def convrelu2(x, features, kernel, *, name, pad_mode, stride=1,
              dtype=jnp.float32, pallas=False, phased_bwd=False):
    """Factored (ky,1)+(1,kx) conv pair, leaky-ReLU after each
    (reference helpers.py:105-153, v2/helpers.py:46-91).

    features: int or (int_y, int_x) — channels after the y and x convs.
    pallas=True routes through the VMEM-fused pair kernel
    (ops/pallas_conv.py) when the shape qualifies: channel dim >= 32
    (lane-padding economics) and the working set fits VMEM. Parameter
    tree is identical either way. Inference-only (no custom VJP).
    phased_bwd=True swaps the stride-2 pair's data gradient for the
    phase-decomposed formulation (_phased_axis_conv) — math-identical
    (tests/test_layers_phased.py) but MEASURED SLOWER end-to-end on the
    chip (evo-4 bf16 train step: 367 -> 174 samples/s; the custom-VJP
    boundaries cost more fusion than the dilated-conv gradient costs MXU
    zeros), so it stays opt-in as a measured dead end.
    """
    fy, fx = _pair(features)
    if pallas and x.shape[-1] >= 32 and stride in (1, 2) \
            and _pallas_pair_fits(x, fy, fx, kernel, dtype):
        from ..ops.pallas_conv import fused_convrelu2

        wy, by = _ConvParams((kernel, 1, x.shape[-1], fy), name=name + "y")()
        wx, bx = _ConvParams((1, kernel, fy, fx), name=name + "x")()
        return fused_convrelu2(
            x.astype(dtype), wy.astype(dtype), by.astype(dtype),
            wx.astype(dtype), bx.astype(dtype),
            k=kernel, stride=stride, pad_mode=pad_mode)
    if phased_bwd and stride == 2 and kernel % 2 == 1 \
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        # stride-2 factored pair with the phase-decomposed data gradient
        # (_phased_axis_conv): forward identical to nn.Conv, backward-data
        # avoids the input-dilated conv XLA derives. Params via _ConvParams
        # keep the exact nn.Conv tree.
        wy, by = _ConvParams((kernel, 1, x.shape[-1], fy), name=name + "y")()
        wx, bx = _ConvParams((1, kernel, fy, fx), name=name + "x")()
        if pad_mode == "caffe":
            py = px = (kernel // 2, kernel // 2)
        else:
            py = _tf_same_pad_s2(x.shape[1], kernel)
            px = _tf_same_pad_s2(x.shape[2], kernel)
        y = _phased_axis_conv(1, kernel, *py)(
            x.astype(dtype), wy.astype(dtype), by.astype(dtype))
        y = leaky_relu(y)
        y = _phased_axis_conv(2, kernel, *px)(
            y, wx.astype(dtype), bx.astype(dtype))
        return leaky_relu(y)
    if pad_mode == "caffe":
        p = kernel // 2
        pad_y = ((p, p), (0, 0))
        pad_x = ((0, 0), (p, p))
    else:
        pad_y = "SAME"
        pad_x = "SAME"
    y = nn.Conv(
        features=fy,
        kernel_size=(kernel, 1),
        strides=(stride, 1),
        padding=pad_y,
        kernel_init=_kernel_init(),
        dtype=dtype,
        name=name + "y",
    )(x)
    y = leaky_relu(y)
    y = nn.Conv(
        features=fx,
        kernel_size=(1, kernel),
        strides=(1, stride),
        padding=pad_x,
        kernel_init=_kernel_init(),
        dtype=dtype,
        name=name + "x",
    )(y)
    return leaky_relu(y)


class PhaseUpconv(nn.Module):
    """4x4 stride-2 transpose conv as ONE dense 2x2 conv over output phases.

    A stride-2 transpose conv realized the textbook way (input dilation +
    full conv) feeds the MXU a 75%-zeros operand. Instead, each output
    pixel (2j+ry, 2l+rx) only sees a fixed 2x2 window of the input through
    a fixed 2x2 slice of the 4x4 kernel, so the whole op is a single
    stride-1 VALID conv with 4*features output channels (one per phase)
    followed by a zero-FLOP interleave — 4x less MXU work and better lane
    utilization for small `features`. Parameter tree (kernel [4,4,in,out],
    bias [out]) is identical to nn.ConvTranspose, so converted TF weights
    (tools/converter.py) map unchanged.

    Produces the full VALID output [B, 2H+2, 2W+2, C]; callers slice.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        cout = self.features
        kernel = self.param("kernel", _kernel_init(), (4, 4, cin, cout),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        # lax.conv_transpose (transpose_kernel=False) computes
        #   y[o] = sum_d K[d] * x_dil[o + d - 3]   (full padding, x dilated)
        # so y[2j+r] = K[3-r]*x[j] + K[1-r]*x[j+1] per axis. Grouping taps by
        # phase r and window offset d in {0,1} (window x[j-1+d] of the
        # 1-padded input) gives tap weight K[2d + (1-r)].
        kr = k.reshape(2, 2, 2, 2, cin, cout)       # [dy, 1-ry, dx, 1-rx, i, o]
        kr = jnp.flip(kr, axis=(1, 3))              # [dy, ry, dx, rx, i, o]
        kr = kr.transpose(0, 2, 4, 1, 3, 5)         # [dy, dx, i, ry, rx, o]
        kr = kr.reshape(2, 2, cin, 4 * cout)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, kr, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, hp, wp, _ = y.shape
        y = y.reshape(b, hp, wp, 2, 2, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * hp, 2 * wp, cout)
        return y + bias.astype(self.dtype)


def upconv(x, features, *, name, pad_mode, activate, dtype=jnp.float32,
           target_hw=None):
    """4x4 stride-2 transposed convolution (phase-decomposed, see PhaseUpconv).

    pad_mode 'same': output = 2*input (reference _upsample_prediction /
    v2 _refine upconv) — equals the full-VALID output sliced [1:1+2H].
    pad_mode 'caffe': VALID transpose conv (output 2*input + 2) followed by
    a [1:1+2H, 1:1+2W] slice — the reference v1 trick
    (blocks_original.py:97-110); `target_hw` gives the slice size.
    """
    y = PhaseUpconv(features=features, dtype=dtype, name=name)(x)
    if target_hw is None or pad_mode == "same":
        target_hw = (2 * x.shape[1], 2 * x.shape[2])
    th, tw = target_hw
    y = y[:, 1 : 1 + th, 1 : 1 + tw, :]
    return leaky_relu(y) if activate else y


def dense(x, features, *, name, activate, dtype=jnp.float32):
    y = nn.Dense(
        features=features,
        kernel_init=_kernel_init(),
        dtype=dtype,
        name=name,
    )(x)
    return leaky_relu(y) if activate else y


def flatten_nchw(x):
    """Flatten NHWC activations in (C, H, W) element order.

    The reference always flattens NCHW tensors before its dense layers
    (blocks_original.py:388-392), so the FC weight layout is channel-major;
    we replicate the order to keep converted weights valid.
    """
    b, h, w, c = x.shape
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c * h * w)
