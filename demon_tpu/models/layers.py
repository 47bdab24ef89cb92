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

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import leaky_relu


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


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
           activate=False):
    """Functional helper usable inside a parent @nn.compact context.

    Creates an unwrapped nn.Conv named `name` (matching the reference's
    tf.layers.conv2d variable scope)."""
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


def convrelu(x, features, kernel, *, name, pad_mode, stride=1, dtype=jnp.float32):
    """conv + leaky-ReLU (reference helpers.py:97-102 / v2/helpers.py:38-43)."""
    return conv2d(
        x, features, kernel, name=name, pad_mode=pad_mode, stride=stride,
        dtype=dtype, activate=True,
    )


def convrelu2(x, features, kernel, *, name, pad_mode, stride=1, dtype=jnp.float32):
    """Factored (ky,1)+(1,kx) conv pair, leaky-ReLU after each
    (reference helpers.py:105-153, v2/helpers.py:46-91).

    features: int or (int_y, int_x) — channels after the y and x convs.
    """
    fy, fx = _pair(features)
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


def upconv(x, features, *, name, pad_mode, activate, dtype=jnp.float32,
           target_hw=None):
    """4x4 stride-2 transposed convolution.

    pad_mode 'same': output = 2*input (reference _upsample_prediction /
    v2 _refine upconv).
    pad_mode 'caffe': VALID transpose conv (output 2*input + 2) followed by
    a [1:1+2H, 1:1+2W] slice — the reference v1 trick
    (blocks_original.py:97-110); `target_hw` gives the slice size.
    """
    if pad_mode == "same":
        y = nn.ConvTranspose(
            features=features,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",
            kernel_init=_kernel_init(),
            dtype=dtype,
            name=name,
        )(x)
    else:
        y = nn.ConvTranspose(
            features=features,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="VALID",
            kernel_init=_kernel_init(),
            dtype=dtype,
            name=name,
        )(x)
        if target_hw is None:
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
