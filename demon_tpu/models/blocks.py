"""The three DeMoN network blocks: flow, depth/motion, refinement.

A single parameterized implementation covers both reference variants
(v1: blocks_original.py, v2: v2/blocks.py) instead of the reference's two
copy-pasted files. Geometry coupling between blocks (flow rendering,
warping, triangulation) runs through demon_tpu.ops inside the module so the
whole pipeline stays inside one jitted XLA program.

All tensors NHWC; images in [-0.5, 0.5]; flow normalized; depth inverse.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from .layers import convrelu, convrelu2, conv2d, upconv, dense, flatten_nchw


def _head_conv_pair(x, c1, c2, *, pad_mode, dtype, pallas):
    """conv3x3(c1)+lrelu -> conv3x3(c2) — the shared shape of both
    prediction heads. pallas=True routes through the packed-tap MXU
    kernel (ops/pallas_head.py) when the per-image block fits VMEM;
    parameter tree identical to the two nn.Conv path either way."""
    from .layers import _ConvParams

    b, h, w, cin = x.shape
    lane = lambda c: -(-c // 128) * 128
    bpe = 2 if dtype == jnp.bfloat16 else 4
    # working-set estimate for the PACKED-TAP head kernel (9 taps ride N,
    # 32-ch intermediate in VMEM) — deliberately different from
    # layers._pallas_pair_fits, which budgets the factored-pair kernel
    vmem = h * w * (lane(cin) * bpe * 3 + 9 * 32 * 4 * 2)
    if pallas and c1 <= 32 and c2 <= 32 and vmem < 8 * 1024 * 1024:
        from ..ops.pallas_head import fused_head

        w1, b1 = _ConvParams((3, 3, cin, c1), name="conv1")()
        w2, b2 = _ConvParams((3, 3, c1, c2), name="conv2")()
        return fused_head(x.astype(dtype), w1.astype(dtype),
                          b1.astype(dtype), w2.astype(dtype),
                          b2.astype(dtype))
    t = convrelu(x, c1, 3, name="conv1", pad_mode=pad_mode, dtype=dtype)
    return conv2d(t, c2, 3, name="conv2", pad_mode=pad_mode, dtype=dtype)


def _predict_flow(x, *, pad_mode, dtype, pallas=False):
    """flow+confidence head: 24-ch conv + 4-ch linear conv
    (reference blocks_original.py:23-51, v2/blocks.py:24-52)."""
    return _head_conv_pair(x, 24, 4, pad_mode=pad_mode, dtype=dtype,
                           pallas=pallas)


def _predict_depthnormal(x, *, scale, predict_normals, intermediate, pad_mode,
                         dtype, pallas=False):
    """depth(+normal) head; depth channel multiplied by the predicted scale
    (reference blocks_original.py:238-294)."""
    out = _head_conv_pair(x, intermediate, 4 if predict_normals else 1,
                          pad_mode=pad_mode, dtype=dtype, pallas=pallas)
    if predict_normals:
        depth, normal = out[..., :1], out[..., 1:]
    else:
        depth, normal = out, None
    if scale is not None:
        depth = depth * scale[:, None, None, :]
    return depth, normal


def _resolve_head_flag(pallas: bool, pallas_head) -> bool:
    """pallas_head=None follows `pallas`; True/False overrides it — so the
    packed-tap head kernel can be measured (and defaulted) independently
    of the factored-pair conv kernels."""
    return pallas if pallas_head is None else pallas_head


class _PredictFlow(nn.Module):
    pad_mode: str
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False
    # opt-in phase-decomposed bwd-data for stride-2 pairs (measured
    # dead end on the round-3 chip; see models/layers.py convrelu2)
    phased_bwd: bool = False

    @nn.compact
    def __call__(self, x):
        return _predict_flow(x, pad_mode=self.pad_mode, dtype=self.dtype,
                             pallas=self.pallas)


class _PredictDepthNormal(nn.Module):
    pad_mode: str
    predict_normals: bool = True
    intermediate: int = 24
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False
    # opt-in phase-decomposed bwd-data for stride-2 pairs (measured
    # dead end on the round-3 chip; see models/layers.py convrelu2)
    phased_bwd: bool = False

    @nn.compact
    def __call__(self, x, scale=None):
        return _predict_depthnormal(
            x, scale=scale, predict_normals=self.predict_normals,
            intermediate=self.intermediate, pad_mode=self.pad_mode,
            dtype=self.dtype, pallas=self.pallas,
        )


class _Upsample(nn.Module):
    """upsample a prediction 2x with a learned 4x4 upconv
    (reference _upsample_prediction)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return upconv(x, self.features, name="upconv", pad_mode="same",
                      activate=False, dtype=self.dtype)


class _Refine(nn.Module):
    """2x upconv of coarse features + concat with skip features (+ optional
    upsampled prediction); reference _refine_caffe_padding / v2 _refine."""

    features: int
    pad_mode: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, features_direct, upsampled_prediction=None):
        target_hw = (features_direct.shape[1], features_direct.shape[2])
        up = upconv(x, self.features, name="upconv", pad_mode=self.pad_mode,
                    activate=True, dtype=self.dtype, target_hw=target_hw)
        parts = [up, features_direct]
        if upsampled_prediction is not None:
            parts.append(upsampled_prediction)
        return jnp.concatenate(parts, axis=-1)


def _dense_bottleneck(x, *, dtype):
    """v2's dense5: slice the first 96 channels of conv5_1, flatten, a
    full-size dense layer, reshape back, concat (v2/blocks.py:198-215)."""
    b, h, w, c = x.shape
    sl = x[..., :96]
    units = 96 * h * w
    flat = flatten_nchw(sl)
    d = dense(flat, units, name="dense5", activate=True, dtype=dtype)
    d = d.reshape(b, 96, h, w).transpose(0, 2, 3, 1)
    return jnp.concatenate([x, d], axis=-1)


class FlowBlock(nn.Module):
    """Optical flow network (reference flow_block_demon_original /
    v2 flow_block). Emits 4-channel flow+conf at levels 5 (H/32) and 2 (H/4).

    When `prev` predictions are provided (iterative mode) the block is
    conditioned on stop-gradient geometric renders of the previous state:
    flow-from-depth-motion (zeroed where |flow| >= 1), the second image
    warped by it, and the previous depth and normals
    (blocks_original.py:143-187).
    """

    variant: str = "v1"
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False
    # opt-in phase-decomposed bwd-data for stride-2 pairs (measured
    # dead end on the round-3 chip; see models/layers.py convrelu2)
    phased_bwd: bool = False
    # the packed-tap head kernel measured separately from the factored
    # conv-pair kernels: None follows `pallas`, True/False overrides
    pallas_head: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        image_pair: jax.Array,
        image2_2: Optional[jax.Array] = None,
        intrinsics: Optional[jax.Array] = None,
        prev: Optional[Dict[str, jax.Array]] = None,
    ) -> Dict[str, jax.Array]:
        v1 = self.variant == "v1"
        pad = "caffe" if v1 else "same"
        cp = dict(pad_mode=pad, dtype=self.dtype, pallas=self.pallas,
                  phased_bwd=self.phased_bwd)

        conv1 = convrelu2(image_pair, 32 if v1 else (24, 32), 9, name="conv1",
                          stride=2, **cp)
        if prev is None:
            conv2 = convrelu2(conv1, 64 if v1 else (48, 64), 7, name="conv2",
                              stride=2, **cp)
            conv2_1 = convrelu2(conv2, 64, 3, name="conv2_1", stride=1, **cp)
        else:
            conv2 = convrelu2(conv1, 32, 7, name="conv2", stride=2, **cp)

            # geometry runs in fp32 regardless of the conv dtype — bf16 is
            # far too coarse for reprojection math
            f32 = lambda t: t.astype(jnp.float32)
            flow_dm = ops.depth_to_flow(
                f32(intrinsics),
                f32(prev["depth2"]),
                f32(prev["rotation"]),
                f32(prev["translation"]),
                inverse_depth=True,
                normalize_flow=True,
            )
            # zero where motion too large; also kills NaNs from bad cameras
            # (blocks_original.py:163-168)
            norm = jnp.linalg.norm(flow_dm, axis=-1, keepdims=True)
            flow_dm = jnp.where(norm < 1.0, flow_dm, 0.0)
            flow_dm = ops.replace_nonfinite(flow_dm)

            image2_2_warped = ops.warp2d(
                f32(image2_2), flow_dm, normalized=True, border_mode="value"
            )
            extra = jnp.concatenate(
                [image2_2_warped.astype(self.dtype),
                 flow_dm.astype(self.dtype),
                 prev["depth2"].astype(self.dtype),
                 prev["normal2"].astype(self.dtype)],
                axis=-1,
            )
            extra = jax.lax.stop_gradient(extra)
            conv_extra = convrelu2(extra, 32, 3, name="conv2_extra_inputs",
                                   stride=1, **cp)
            conv2_concat = jnp.concatenate([conv2, conv_extra], axis=-1)
            conv2_1 = convrelu2(conv2_concat, 64, 3, name="conv2_1", stride=1, **cp)

        conv3 = convrelu2(conv2_1, 128 if v1 else (96, 128), 5, name="conv3",
                          stride=2, **cp)
        conv3_1 = convrelu2(conv3, 128, 3, name="conv3_1", stride=1, **cp)
        conv4 = convrelu2(conv3_1, 256 if v1 else (192, 256), 5, name="conv4",
                          stride=2, **cp)
        conv4_1 = convrelu2(conv4, 256, 3, name="conv4_1", stride=1, **cp)
        conv5 = convrelu2(conv4_1, 512 if v1 else 384, 5, name="conv5",
                          stride=2, **cp)
        conv5_1 = convrelu2(conv5, 512 if v1 else 384, 3, name="conv5_1",
                            stride=1, **cp)

        top = conv5_1 if v1 else _dense_bottleneck(conv5_1, dtype=self.dtype)

        flowconf5 = _PredictFlow(pad, self.dtype, _resolve_head_flag(self.pallas, self.pallas_head),
                                 name="predict_flow5")(top)
        flowconf5to4 = _Upsample(2, self.dtype, name="upsample_flow5to4")(flowconf5)
        concat4 = _Refine(256, pad, self.dtype, name="refine4")(
            top, conv4_1, flowconf5to4
        )
        concat3 = _Refine(128, pad, self.dtype, name="refine3")(concat4, conv3_1)
        concat2 = _Refine(64, pad, self.dtype, name="refine2")(concat3, conv2_1)
        flowconf2 = _PredictFlow(pad, self.dtype, _resolve_head_flag(self.pallas, self.pallas_head),
                                 name="predict_flow2")(concat2)

        return {
            "predict_flowconf5": flowconf5,
            "predict_flowconf2": flowconf2,
        }


class DepthMotionBlock(nn.Module):
    """Depth + egomotion network (reference depthmotion_block_demon_original /
    v2 depthmotion_block).

    Extra conditioning inputs at level 2 (all stop-gradient): image2
    warped by the predicted flow, the 4-channel flow+conf, and — when a
    previous motion estimate exists — triangulated depth-from-flow
    (v2 clips it to [0, 50], v2/blocks.py:379).
    """

    variant: str = "v1"
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False
    # opt-in phase-decomposed bwd-data for stride-2 pairs (measured
    # dead end on the round-3 chip; see models/layers.py convrelu2)
    phased_bwd: bool = False
    pallas_head: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        image_pair: jax.Array,
        image2_2: jax.Array,
        prev_flow2: jax.Array,
        prev_flowconf2: jax.Array,
        prev_rotation: Optional[jax.Array] = None,
        prev_translation: Optional[jax.Array] = None,
        intrinsics: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        v1 = self.variant == "v1"
        pad = "caffe" if v1 else "same"
        cp = dict(pad_mode=pad, dtype=self.dtype, pallas=self.pallas,
                  phased_bwd=self.phased_bwd)

        conv1 = convrelu2(image_pair, 32 if v1 else (24, 32), 9, name="conv1",
                          stride=2, **cp)
        conv2 = convrelu2(conv1, 32, 7, name="conv2", stride=2, **cp)

        f32 = lambda t: t.astype(jnp.float32)
        image2_2_warped = ops.warp2d(
            f32(image2_2), f32(prev_flow2), normalized=True,
            border_mode="value"
        ).astype(self.dtype)
        extra = [image2_2_warped, prev_flowconf2.astype(self.dtype)]
        if prev_rotation is not None and prev_translation is not None \
                and intrinsics is not None:
            if v1:
                depth_from_flow = ops.flow_to_depth(
                    f32(prev_flow2), f32(intrinsics), f32(prev_rotation),
                    f32(prev_translation),
                    normalized_flow=True, inverse_depth=True,
                )
            else:
                depth_from_flow = ops.flow_to_depth2(
                    f32(prev_flow2), f32(intrinsics), f32(prev_rotation),
                    f32(prev_translation),
                    normalized_flow=True, inverse_depth=True,
                )
                depth_from_flow = jnp.clip(depth_from_flow, 0.0, 50.0)
            depth_from_flow = ops.replace_nonfinite(depth_from_flow)
            extra.append(depth_from_flow.astype(self.dtype))

        extra = jax.lax.stop_gradient(jnp.concatenate(extra, axis=-1))
        conv_extra = convrelu2(extra, 32, 3, name="conv2_extra_inputs",
                               stride=1, **cp)
        conv2_concat = jnp.concatenate([conv2, conv_extra], axis=-1)
        conv2_1 = convrelu2(conv2_concat, 64, 3, name="conv2_1", stride=1, **cp)

        conv3 = convrelu2(conv2_1, 128 if v1 else (96, 128), 5, name="conv3",
                          stride=2, **cp)
        conv3_1 = convrelu2(conv3, 128, 3, name="conv3_1", stride=1, **cp)
        conv4 = convrelu2(conv3_1, 256 if v1 else (192, 256), 5, name="conv4",
                          stride=2, **cp)
        conv4_1 = convrelu2(conv4, 256, 3, name="conv4_1", stride=1, **cp)
        conv5 = convrelu2(conv4_1, 512 if v1 else 384, 3, name="conv5",
                          stride=2, **cp)
        conv5_1 = convrelu2(conv5, 512 if v1 else 384, 3, name="conv5_1",
                            stride=1, **cp)

        # ---- motion head ----
        if v1:
            motion_conv1 = convrelu(conv5_1, 128, 3, name="motion_conv1", **cp)
            motion_flat = flatten_nchw(motion_conv1)
        else:
            top = _dense_bottleneck(conv5_1, dtype=self.dtype)
            m3 = convrelu2(conv2_1, 64, 5, name="motion_conv3", stride=2, **cp)
            m4 = convrelu2(m3, 64, 5, name="motion_conv4", stride=2, **cp)
            m5a = convrelu2(m4, 64, 3, name="motion_conv5a", stride=2, **cp)
            m5b = convrelu(top, 64, 3, name="motion_conv5b", **cp)
            motion_flat = flatten_nchw(jnp.concatenate([m5a, m5b], axis=-1))

        fc1 = dense(motion_flat, 1024, name="motion_fc1", activate=True,
                    dtype=self.dtype)
        fc2 = dense(fc1, 128, name="motion_fc2", activate=True, dtype=self.dtype)
        motion = dense(fc2, 7, name="motion_fc3", activate=False, dtype=self.dtype)
        rotation = motion[:, 0:3]
        translation = motion[:, 3:6]
        scale = motion[:, 6:7]

        # ---- expanding part (always from conv5_1, v2/blocks.py:462) ----
        concat4 = _Refine(256, pad, self.dtype, name="refine4")(conv5_1, conv4_1)
        concat3 = _Refine(128, pad, self.dtype, name="refine3")(concat4, conv3_1)
        concat2 = _Refine(64, pad, self.dtype, name="refine2")(concat3, conv2_1)

        depth2, normal2 = _PredictDepthNormal(
            pad, predict_normals=True, intermediate=24, dtype=self.dtype,
            pallas=_resolve_head_flag(self.pallas, self.pallas_head), name="predict_depthnormal2",
        )(concat2, scale)

        return {
            "predict_depth2": depth2,
            "predict_normal2": normal2,
            "predict_rotation": rotation,
            "predict_translation": translation,
            "predict_scale": scale,
        }


class RefinementBlock(nn.Module):
    """Depth upsampling/refinement network (reference
    depth_refine_block_demon_original / v2 depth_refine_block): nearest-
    upsampled coarse depth + full-res image 1 -> full-res depth
    (v2 additionally predicts normals)."""

    variant: str = "v1"
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False
    # opt-in phase-decomposed bwd-data for stride-2 pairs (measured
    # dead end on the round-3 chip; see models/layers.py convrelu2)
    phased_bwd: bool = False
    pallas_head: Optional[bool] = None

    @nn.compact
    def __call__(self, image1: jax.Array, depth2: jax.Array) -> Dict[str, jax.Array]:
        v1 = self.variant == "v1"
        pad = "caffe" if v1 else "same"
        cp = dict(pad_mode=pad, dtype=self.dtype, pallas=self.pallas,
                  phased_bwd=self.phased_bwd)

        H, W = image1.shape[1], image1.shape[2]
        depth_up = ops.resize_nearest(depth2, H, W)
        x = jnp.concatenate([image1, depth_up], axis=-1)

        conv0 = convrelu(x, 32, 3, name="conv0", stride=1, **cp)
        conv1 = convrelu(conv0, 64, 3, name="conv1", stride=2, **cp)
        conv1_1 = convrelu(conv1, 64, 3, name="conv1_1", stride=1, **cp)
        conv2 = convrelu(conv1_1, 128, 3, name="conv2", stride=2, **cp)
        conv2_1 = convrelu(conv2, 128, 3, name="conv2_1", stride=1, **cp)

        concat1 = _Refine(64, pad, self.dtype, name="refine1")(conv2_1, conv1_1)
        concat0 = _Refine(32, pad, self.dtype, name="refine0")(concat1, conv0)

        depth0, normal0 = _PredictDepthNormal(
            pad, predict_normals=not v1, intermediate=16, dtype=self.dtype,
            pallas=_resolve_head_flag(self.pallas, self.pallas_head), name="predict_depth0",
        )(concat0, None)
        out = {"predict_depth0": depth0}
        if normal0 is not None:
            out["predict_normal0"] = normal0
        return out
