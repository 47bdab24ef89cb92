"""Numpy forward model of the reference v1 blocks, transcribed from the
TF source — the golden standard for weight/semantics parity.

Every convolution/padding/slicing/flatten rule here is transcribed line by
line from the REFERENCE (not from demon_tpu), so a flax-model bug in any of
these conventions fails the cross-check in test_golden_tf_v1.py:

* pad-then-VALID caffe padding            (reference helpers.py:70-153)
* factored convrelu2 pairs, stride (s,1)/(1,s)          (helpers.py:105-153)
* transpose conv SAME (_upsample_prediction, blocks_original.py:54-75) and
  VALID + [1:,1:] slice (_refine_caffe_padding, blocks_original.py:97-110)
* refine concat order [upconv, skip, upsampled_pred]  (blocks_original.py:111)
* NCHW flatten before the motion FC stack             (blocks_original.py:388-392)
* depth scale s[B,1,1,1] * depth                      (blocks_original.py:280-283)
* TF1 resize_nearest_neighbor align_corners=False     (blocks_original.py:475)
* iterative conditioning: flow zeroing at |flow|>=1, warp, stop-gradient
  concat orders                                       (blocks_original.py:143-187,331-367)

Weights come in TF layout: conv kernels [kh,kw,in,out], transpose-conv
kernels [kh,kw,out,in] (gradient-of-conv semantics), dense [in,out]; names
follow the reference variable scopes (netFlow1/conv1y/kernel, ...).

The cross-block geometry ops (depth_to_flow, flow_to_depth, warp2d) are
NOT transcribed here — they are validated separately against a per-pixel
port of the reference C++ in test_ops_geometry.py / test_ops_image_warp.py;
this model calls demon_tpu.ops for them so the comparison isolates the
conv/layout semantics.

Data format: channels_first (NCHW), the reference default.
"""

from __future__ import annotations

import numpy as np


def lrelu(x):
    """leaky_relu leak 0.1 (reference helpers.py:60-63)."""
    return np.maximum(x, 0.1 * x)


def conv2d_valid_nchw(x, w, b, stride=(1, 1)):
    """VALID cross-correlation, NCHW. w: [kh, kw, cin, cout] (TF layout)."""
    sy, sx = stride
    kh, kw, cin, cout = w.shape
    win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(2, 3))
    win = win[:, :, ::sy, ::sx]                     # [B,cin,Ho,Wo,kh,kw]
    out = np.einsum("bcijyx,yxco->boij", win, w, optimize=True)
    return out + b[None, :, None, None]


def conv2d_caffe_nchw(x, w, b, stride=(1, 1)):
    """conv2d_caffe_padding: pad kh//2, kw//2 both sides then VALID
    (reference helpers.py:70-94)."""
    kh, kw = w.shape[0], w.shape[1]
    xp = np.pad(x, ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)))
    return conv2d_valid_nchw(xp, w, b, stride)


def convrelu_caffe(v, scope, name, x, k, stride=1):
    """convrelu_caffe_padding (reference helpers.py:97-102)."""
    return lrelu(conv2d_caffe_nchw(
        x, v[f"{scope}/{name}/kernel"], v[f"{scope}/{name}/bias"],
        (stride, stride)))


def convrelu2_caffe(v, scope, name, x, k, stride):
    """convrelu2_caffe_padding: pad y -> conv (k,1) stride (s,1) + lrelu ->
    pad x -> conv (1,k) stride (1,s) + lrelu (reference helpers.py:105-153)."""
    p = k // 2
    xp = np.pad(x, ((0, 0), (0, 0), (p, p), (0, 0)))
    t = lrelu(conv2d_valid_nchw(
        xp, v[f"{scope}/{name}y/kernel"], v[f"{scope}/{name}y/bias"],
        (stride, 1)))
    tp = np.pad(t, ((0, 0), (0, 0), (0, 0), (p, p)))
    return lrelu(conv2d_valid_nchw(
        tp, v[f"{scope}/{name}x/kernel"], v[f"{scope}/{name}x/bias"],
        (1, stride)))


def conv2d_transpose_nchw(x, w_tf, b, stride=2, padding="SAME"):
    """TF conv2d_transpose (gradient-of-conv): out[s*i+dy-pad, s*j+dx-pad]
    += x[i,j,cin] * w_tf[dy,dx,cout,cin]. w_tf: [kh, kw, out, in]."""
    kh, kw, cout, cin = w_tf.shape
    B, C, H, W = x.shape
    s = stride
    Hf, Wf = s * (H - 1) + kh, s * (W - 1) + kw
    out = np.zeros((B, cout, Hf, Wf), x.dtype)
    for dy in range(kh):
        for dx in range(kw):
            contrib = np.einsum("bcij,oc->boij", x, w_tf[dy, dx],
                                optimize=True)
            out[:, :, dy: dy + s * H: s, dx: dx + s * W: s] += contrib
    if padding == "SAME":
        # TF SAME transpose conv: out = in*s, pad_before = (k - s) // 2
        pb = (kh - s) // 2
        out = out[:, :, pb: pb + s * H, pb: pb + s * W]
    return out + b[None, :, None, None]


def predict_flow(v, scope, x):
    """_predict_flow_caffe_padding with confidence
    (reference blocks_original.py:23-51)."""
    t = convrelu_caffe(v, scope, "conv1", x, 3)
    return conv2d_caffe_nchw(
        x=t, w=v[f"{scope}/conv2/kernel"], b=v[f"{scope}/conv2/bias"])


def upsample_prediction(v, scope, x, num_outputs):
    """_upsample_prediction: transpose conv 4x4 s2 SAME, linear
    (reference blocks_original.py:54-75)."""
    return conv2d_transpose_nchw(
        x, v[f"{scope}/upconv/kernel"], v[f"{scope}/upconv/bias"],
        stride=2, padding="SAME")


def refine(v, scope, inp, features_direct, upsampled_prediction=None):
    """_refine_caffe_padding: transpose conv 4x4 s2 VALID + lrelu, slice
    [:, :, 1:1+th, 1:1+tw], concat [up, skip, pred]
    (reference blocks_original.py:79-117)."""
    t = lrelu(conv2d_transpose_nchw(
        inp, v[f"{scope}/upconv/kernel"], v[f"{scope}/upconv/bias"],
        stride=2, padding="VALID"))
    th, tw = features_direct.shape[2], features_direct.shape[3]
    up = t[:, :, 1: 1 + th, 1: 1 + tw]
    parts = [up, features_direct]
    if upsampled_prediction is not None:
        parts.append(upsampled_prediction)
    return np.concatenate(parts, axis=1)


def predict_depthnormal(v, scope, x, scale=None, predict_normals=True,
                        intermediate=24):
    """_predict_depthnormal_caffe_padding (reference blocks_original.py:238-294)."""
    t = convrelu_caffe(v, scope, "conv1", x, 3)
    t2 = conv2d_caffe_nchw(
        t, v[f"{scope}/conv2/kernel"], v[f"{scope}/conv2/bias"])
    if predict_normals:
        depth, normal = t2[:, :1], t2[:, 1:]
        if scale is not None:
            depth = scale.reshape(-1, 1, 1, 1) * depth
        return depth, normal
    if scale is not None:
        t2 = scale.reshape(-1, 1, 1, 1) * t2
    return t2


def resize_nearest_tf1(x_nchw, height, width):
    """TF1 resize_nearest_neighbor, align_corners=False: src = floor(dst *
    in/out) (reference blocks_original.py:475)."""
    B, C, H, W = x_nchw.shape
    ys = np.minimum((np.arange(height) * (H / height)).astype(np.int64), H - 1)
    xs = np.minimum((np.arange(width) * (W / width)).astype(np.int64), W - 1)
    return x_nchw[:, :, ys][:, :, :, xs]


# ---------------------------------------------------------------------------
# geometry ops — delegated to demon_tpu.ops (validated separately); NCHW<->NHWC
# conversion at the boundary like the reference's channels_last branch.
# ---------------------------------------------------------------------------

def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _ops():
    from demon_tpu import ops
    return ops


def warp2d_nchw(image, flow):
    out = _ops().warp2d(
        _nchw_to_nhwc(image), _nchw_to_nhwc(flow),
        normalized=True, border_mode="value")
    return _nhwc_to_nchw(np.asarray(out))


def depth_to_flow_nchw(intrinsics, depth, rotation, translation):
    out = _ops().depth_to_flow(
        intrinsics, _nchw_to_nhwc(depth)[..., 0], rotation, translation,
        inverse_depth=True, normalize_flow=True)
    return _nhwc_to_nchw(np.asarray(out))


def flow_to_depth_nchw(flow, intrinsics, rotation, translation):
    out = _ops().flow_to_depth(
        _nchw_to_nhwc(flow), intrinsics, rotation, translation,
        normalized_flow=True, inverse_depth=True)
    return _nhwc_to_nchw(np.asarray(out))


# ---------------------------------------------------------------------------
# the three blocks (reference blocks_original.py:121-513)
# ---------------------------------------------------------------------------

def flow_block(v, scope, image_pair, image2_2=None, intrinsics=None,
               prev_predictions=None):
    """flow_block_demon_original (reference blocks_original.py:121-235).
    All tensors NCHW."""
    conv1 = convrelu2_caffe(v, scope, "conv1", image_pair, 9, 2)
    if prev_predictions is None:
        conv2 = convrelu2_caffe(v, scope, "conv2", conv1, 7, 2)
        conv2_1 = convrelu2_caffe(v, scope, "conv2_1", conv2, 3, 1)
    else:
        conv2 = convrelu2_caffe(v, scope, "conv2", conv1, 7, 2)
        flow_dm = depth_to_flow_nchw(
            intrinsics, prev_predictions["predict_depth2"],
            prev_predictions["predict_rotation"],
            prev_predictions["predict_translation"])
        # zero where |flow| >= 1 (also kills NaNs: NaN < 1.0 is False)
        norm = np.sqrt(flow_dm[:, :1] ** 2 + flow_dm[:, 1:] ** 2)
        with np.errstate(invalid="ignore"):
            keep = norm < 1.0
        flow_dm = np.where(np.concatenate([keep, keep], axis=1), flow_dm, 0.0)
        image2_2_warped = warp2d_nchw(image2_2, flow_dm)
        extra = np.concatenate(
            [image2_2_warped, flow_dm, prev_predictions["predict_depth2"],
             prev_predictions["predict_normal2"]], axis=1)
        conv_extra = convrelu2_caffe(v, scope, "conv2_extra_inputs", extra, 3, 1)
        conv2_concat = np.concatenate([conv2, conv_extra], axis=1)
        conv2_1 = convrelu2_caffe(v, scope, "conv2_1", conv2_concat, 3, 1)

    conv3 = convrelu2_caffe(v, scope, "conv3", conv2_1, 5, 2)
    conv3_1 = convrelu2_caffe(v, scope, "conv3_1", conv3, 3, 1)
    conv4 = convrelu2_caffe(v, scope, "conv4", conv3_1, 5, 2)
    conv4_1 = convrelu2_caffe(v, scope, "conv4_1", conv4, 3, 1)
    conv5 = convrelu2_caffe(v, scope, "conv5", conv4_1, 5, 2)
    conv5_1 = convrelu2_caffe(v, scope, "conv5_1", conv5, 3, 1)

    flowconf5 = predict_flow(v, f"{scope}/predict_flow5", conv5_1)
    flowconf5to4 = upsample_prediction(
        v, f"{scope}/upsample_flow5to4", flowconf5, 2)
    concat4 = refine(v, f"{scope}/refine4", conv5_1, conv4_1, flowconf5to4)
    concat3 = refine(v, f"{scope}/refine3", concat4, conv3_1)
    concat2 = refine(v, f"{scope}/refine2", concat3, conv2_1)
    flowconf2 = predict_flow(v, f"{scope}/predict_flow2", concat2)
    return {"predict_flowconf5": flowconf5, "predict_flowconf2": flowconf2}


def depthmotion_block(v, scope, image_pair, image2_2, prev_flow2,
                      prev_flowconf2, prev_rotation=None,
                      prev_translation=None, intrinsics=None):
    """depthmotion_block_demon_original (reference blocks_original.py:299-448)."""
    conv1 = convrelu2_caffe(v, scope, "conv1", image_pair, 9, 2)
    conv2 = convrelu2_caffe(v, scope, "conv2", conv1, 7, 2)

    image2_2_warped = warp2d_nchw(image2_2, prev_flow2)
    extra = [image2_2_warped, prev_flowconf2]
    if prev_rotation is not None and prev_translation is not None \
            and intrinsics is not None:
        extra.append(flow_to_depth_nchw(
            prev_flow2, intrinsics, prev_rotation, prev_translation))
    extra = np.concatenate(extra, axis=1)
    conv_extra = convrelu2_caffe(v, scope, "conv2_extra_inputs", extra, 3, 1)
    conv2_concat = np.concatenate([conv2, conv_extra], axis=1)
    conv2_1 = convrelu2_caffe(v, scope, "conv2_1", conv2_concat, 3, 1)

    conv3 = convrelu2_caffe(v, scope, "conv3", conv2_1, 5, 2)
    conv3_1 = convrelu2_caffe(v, scope, "conv3_1", conv3, 3, 1)
    conv4 = convrelu2_caffe(v, scope, "conv4", conv3_1, 5, 2)
    conv4_1 = convrelu2_caffe(v, scope, "conv4_1", conv4, 3, 1)
    # NOTE kernel 3 (not 5) for conv5 in the DM block (blocks_original.py:375)
    conv5 = convrelu2_caffe(v, scope, "conv5", conv4_1, 3, 2)
    conv5_1 = convrelu2_caffe(v, scope, "conv5_1", conv5, 3, 1)

    # motion head: conv 3x3 128 -> NCHW flatten -> FC 1024 -> 128 -> 7
    motion_conv1 = convrelu_caffe(v, scope, "motion_conv1", conv5_1, 3)
    B = motion_conv1.shape[0]
    flat = motion_conv1.reshape(B, -1)      # NCHW row-major = (C,H,W) order
    fc1 = lrelu(flat @ v[f"{scope}/motion_fc1/kernel"]
                + v[f"{scope}/motion_fc1/bias"])
    fc2 = lrelu(fc1 @ v[f"{scope}/motion_fc2/kernel"]
                + v[f"{scope}/motion_fc2/bias"])
    motion = fc2 @ v[f"{scope}/motion_fc3/kernel"] + v[f"{scope}/motion_fc3/bias"]
    rotation, translation, scale = motion[:, :3], motion[:, 3:6], motion[:, 6:]

    concat4 = refine(v, f"{scope}/refine4", conv5_1, conv4_1)
    concat3 = refine(v, f"{scope}/refine3", concat4, conv3_1)
    concat2 = refine(v, f"{scope}/refine2", concat3, conv2_1)
    depth2, normal2 = predict_depthnormal(
        v, f"{scope}/predict_depthnormal2", concat2, scale=scale)
    return {
        "predict_depth2": depth2,
        "predict_normal2": normal2,
        "predict_rotation": rotation,
        "predict_translation": translation,
        "predict_scale": scale,
    }


def depth_refine_block(v, scope, image1, depth2):
    """depth_refine_block_demon_original (reference blocks_original.py:452-513)."""
    H, W = image1.shape[2], image1.shape[3]
    depth2_up = resize_nearest_tf1(depth2, H, W)
    x = np.concatenate([image1, depth2_up], axis=1)

    conv0 = convrelu_caffe(v, scope, "conv0", x, 3, 1)
    conv1 = convrelu_caffe(v, scope, "conv1", conv0, 3, 2)
    conv1_1 = convrelu_caffe(v, scope, "conv1_1", conv1, 3, 1)
    conv2 = convrelu_caffe(v, scope, "conv2", conv1_1, 3, 2)
    conv2_1 = convrelu_caffe(v, scope, "conv2_1", conv2, 3, 1)

    concat1 = refine(v, f"{scope}/refine1", conv2_1, conv1_1)
    concat0 = refine(v, f"{scope}/refine0", concat1, conv0)
    depth0 = predict_depthnormal(
        v, f"{scope}/predict_depth0", concat0, predict_normals=False,
        intermediate=16)
    return {"predict_depth0": depth0}
