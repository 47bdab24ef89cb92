"""Numpy forward model of the reference v2 blocks, transcribed from the
TF source — the golden standard for the trainable-architecture semantics.

Transcribed line by line from the REFERENCE v2 sources (not from
demon_tpu), so a flax-model bug in any of these conventions fails the
cross-check in test_golden_tf_v2.py:

* TF 'SAME' padding (asymmetric for stride 2)   (reference v2/helpers.py:24-91)
* factored convrelu2, channel tuples (24,32)/(48,64)/(96,128)/(192,256)/384
                                                (v2/blocks.py:140-199,349-400)
* dense5 bottleneck: slice ch[:96], NCHW flatten, full-size dense + lrelu,
  reshape back, concat                          (v2/blocks.py:200-219,400-419)
* flow conv5 k=5 vs depth-motion conv5 k=3      (v2/blocks.py:196 vs 397)
* DM expanding part starts from conv5_1 (NOT conv5_1_dense5), while
  motion_conv5b reads conv5_1_dense5            (v2/blocks.py:424-468)
* motion tower: motion_conv3/4/5a from conv2_1 (5,5,3 kernels s2) concat
  motion_conv5b, NCHW flatten, FC 1024/128/7    (v2/blocks.py:421-459)
* flow_to_depth2 conditioning clipped to [0,50] (v2/blocks.py:363-381)
* refinement block predicts normals (intermediate 16) and nearest-upsamples
  depth2 with TF1 align_corners=False           (v2/blocks.py:505-562)

Weight layout conventions are identical to golden_tf_v1 (TF conv kernels
[kh,kw,in,out], transpose-conv [kh,kw,out,in], dense [in,out]).
Data format: channels_first (NCHW), the reference default.
"""

from __future__ import annotations

import numpy as np

from golden_tf_v1 import (
    lrelu,
    conv2d_valid_nchw,
    conv2d_transpose_nchw,
    resize_nearest_tf1,
    warp2d_nchw,
    depth_to_flow_nchw,
    _ops,
    _nchw_to_nhwc,
    _nhwc_to_nchw,
)


def _same_pads(size, k, s):
    """TF 'SAME': pad_total = max((ceil(size/s)-1)*s + k - size, 0),
    before = total//2 (v2/helpers.py uses tf.layers.conv2d padding='same')."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def conv2d_same_nchw(x, w, b, stride=(1, 1)):
    kh, kw = w.shape[0], w.shape[1]
    sy, sx = stride
    _, _, H, W = x.shape
    pt, pb = _same_pads(H, kh, sy)
    pl, pr = _same_pads(W, kw, sx)
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    return conv2d_valid_nchw(xp, w, b, stride)


def convrelu_same(v, scope, name, x, k, stride=1):
    """v2 convrelu (v2/helpers.py:38-44)."""
    return lrelu(conv2d_same_nchw(
        x, v[f"{scope}/{name}/kernel"], v[f"{scope}/{name}/bias"],
        (stride, stride)))


def convrelu2_same(v, scope, name, x, k, stride):
    """v2 convrelu2: SAME conv (k,1) stride (s,1) + lrelu -> SAME conv
    (1,k) stride (1,s) + lrelu (v2/helpers.py:46-91)."""
    t = lrelu(conv2d_same_nchw(
        x, v[f"{scope}/{name}y/kernel"], v[f"{scope}/{name}y/bias"],
        (stride, 1)))
    return lrelu(conv2d_same_nchw(
        t, v[f"{scope}/{name}x/kernel"], v[f"{scope}/{name}x/bias"],
        (1, stride)))


def predict_flow(v, scope, x):
    """v2 _predict_flow with confidence (v2/blocks.py:24-52)."""
    t = convrelu_same(v, scope, "conv1", x, 3)
    return conv2d_same_nchw(
        t, v[f"{scope}/conv2/kernel"], v[f"{scope}/conv2/bias"])


def upsample_prediction(v, scope, x):
    """v2 _upsample_prediction: transpose conv 4x4 s2 SAME, linear
    (v2/blocks.py:55-76)."""
    return conv2d_transpose_nchw(
        x, v[f"{scope}/upconv/kernel"], v[f"{scope}/upconv/bias"],
        stride=2, padding="SAME")


def refine(v, scope, inp, features_direct, upsampled_prediction=None):
    """v2 _refine: transpose conv 4x4 s2 SAME + lrelu, concat
    [up, skip, pred] (v2/blocks.py:79-117)."""
    up = lrelu(conv2d_transpose_nchw(
        inp, v[f"{scope}/upconv/kernel"], v[f"{scope}/upconv/bias"],
        stride=2, padding="SAME"))
    parts = [up, features_direct]
    if upsampled_prediction is not None:
        parts.append(upsampled_prediction)
    return np.concatenate(parts, axis=1)


def dense_bottleneck(v, scope, x):
    """dense5: slice first 96 channels, NCHW flatten, dense to the same
    size + lrelu, reshape back, concat (v2/blocks.py:200-219)."""
    B, _, h, w = x.shape
    flat = x[:, :96].reshape(B, -1)          # NCHW row-major = (C,H,W)
    d = lrelu(flat @ v[f"{scope}/dense5/kernel"]
              + v[f"{scope}/dense5/bias"])
    return np.concatenate([x, d.reshape(B, 96, h, w)], axis=1)


def predict_depthnormal(v, scope, x, scale=None, intermediate=24):
    """v2 _predict_depthnormal, always with normals (v2/blocks.py:257-314)."""
    t = convrelu_same(v, scope, "conv1", x, 3)
    t2 = conv2d_same_nchw(
        t, v[f"{scope}/conv2/kernel"], v[f"{scope}/conv2/bias"])
    depth, normal = t2[:, :1], t2[:, 1:]
    if scale is not None:
        depth = scale.reshape(-1, 1, 1, 1) * depth
    return depth, normal


def flow_to_depth2_nchw(flow, intrinsics, rotation, translation):
    out = _ops().flow_to_depth2(
        _nchw_to_nhwc(flow), intrinsics, rotation, translation,
        normalized_flow=True, inverse_depth=True)
    return _nhwc_to_nchw(np.asarray(out))


# ---------------------------------------------------------------------------
# the three v2 blocks (v2/blocks.py:120-562)
# ---------------------------------------------------------------------------

def flow_block(v, scope, image_pair, image2_2=None, intrinsics=None,
               prev_predictions=None):
    """v2 flow_block (v2/blocks.py:120-255). All tensors NCHW."""
    conv1 = convrelu2_same(v, scope, "conv1", image_pair, 9, 2)
    if prev_predictions is None:
        conv2 = convrelu2_same(v, scope, "conv2", conv1, 7, 2)
        conv2_1 = convrelu2_same(v, scope, "conv2_1", conv2, 3, 1)
    else:
        conv2 = convrelu2_same(v, scope, "conv2", conv1, 7, 2)
        flow_dm = depth_to_flow_nchw(
            intrinsics, prev_predictions["predict_depth2"],
            prev_predictions["predict_rotation"],
            prev_predictions["predict_translation"])
        norm = np.sqrt(flow_dm[:, :1] ** 2 + flow_dm[:, 1:] ** 2)
        with np.errstate(invalid="ignore"):
            keep = norm < 1.0
        flow_dm = np.where(np.concatenate([keep, keep], axis=1), flow_dm, 0.0)
        image2_2_warped = warp2d_nchw(image2_2, flow_dm)
        extra = np.concatenate(
            [image2_2_warped, flow_dm, prev_predictions["predict_depth2"],
             prev_predictions["predict_normal2"]], axis=1)
        conv_extra = convrelu2_same(v, scope, "conv2_extra_inputs", extra, 3, 1)
        conv2_concat = np.concatenate([conv2, conv_extra], axis=1)
        conv2_1 = convrelu2_same(v, scope, "conv2_1", conv2_concat, 3, 1)

    conv3 = convrelu2_same(v, scope, "conv3", conv2_1, 5, 2)
    conv3_1 = convrelu2_same(v, scope, "conv3_1", conv3, 3, 1)
    conv4 = convrelu2_same(v, scope, "conv4", conv3_1, 5, 2)
    conv4_1 = convrelu2_same(v, scope, "conv4_1", conv4, 3, 1)
    conv5 = convrelu2_same(v, scope, "conv5", conv4_1, 5, 2)
    conv5_1 = convrelu2_same(v, scope, "conv5_1", conv5, 3, 1)
    top = dense_bottleneck(v, scope, conv5_1)

    flowconf5 = predict_flow(v, f"{scope}/predict_flow5", top)
    flowconf5to4 = upsample_prediction(v, f"{scope}/upsample_flow5to4",
                                       flowconf5)
    concat4 = refine(v, f"{scope}/refine4", top, conv4_1, flowconf5to4)
    concat3 = refine(v, f"{scope}/refine3", concat4, conv3_1)
    concat2 = refine(v, f"{scope}/refine2", concat3, conv2_1)
    flowconf2 = predict_flow(v, f"{scope}/predict_flow2", concat2)
    return {"predict_flowconf5": flowconf5, "predict_flowconf2": flowconf2}


def depthmotion_block(v, scope, image_pair, image2_2, prev_flow2,
                      prev_flowconf2, prev_rotation=None,
                      prev_translation=None, intrinsics=None):
    """v2 depthmotion_block (v2/blocks.py:318-496)."""
    conv1 = convrelu2_same(v, scope, "conv1", image_pair, 9, 2)
    conv2 = convrelu2_same(v, scope, "conv2", conv1, 7, 2)

    image2_2_warped = warp2d_nchw(image2_2, prev_flow2)
    extra = [image2_2_warped, prev_flowconf2]
    if prev_rotation is not None and prev_translation is not None \
            and intrinsics is not None:
        dff = flow_to_depth2_nchw(
            prev_flow2, intrinsics, prev_rotation, prev_translation)
        extra.append(np.clip(dff, 0.0, 50.0))
    extra = np.concatenate(extra, axis=1)
    conv_extra = convrelu2_same(v, scope, "conv2_extra_inputs", extra, 3, 1)
    conv2_concat = np.concatenate([conv2, conv_extra], axis=1)
    conv2_1 = convrelu2_same(v, scope, "conv2_1", conv2_concat, 3, 1)

    conv3 = convrelu2_same(v, scope, "conv3", conv2_1, 5, 2)
    conv3_1 = convrelu2_same(v, scope, "conv3_1", conv3, 3, 1)
    conv4 = convrelu2_same(v, scope, "conv4", conv3_1, 5, 2)
    conv4_1 = convrelu2_same(v, scope, "conv4_1", conv4, 3, 1)
    # NOTE kernel 3 (not 5) for conv5 in the DM block (v2/blocks.py:397)
    conv5 = convrelu2_same(v, scope, "conv5", conv4_1, 3, 2)
    conv5_1 = convrelu2_same(v, scope, "conv5_1", conv5, 3, 1)
    top = dense_bottleneck(v, scope, conv5_1)

    # motion tower (v2/blocks.py:421-459)
    m3 = convrelu2_same(v, scope, "motion_conv3", conv2_1, 5, 2)
    m4 = convrelu2_same(v, scope, "motion_conv4", m3, 5, 2)
    m5a = convrelu2_same(v, scope, "motion_conv5a", m4, 3, 2)
    m5b = convrelu_same(v, scope, "motion_conv5b", top, 3, 1)
    m5 = np.concatenate([m5a, m5b], axis=1)
    B = m5.shape[0]
    flat = m5.reshape(B, -1)                 # NCHW flatten
    fc1 = lrelu(flat @ v[f"{scope}/motion_fc1/kernel"]
                + v[f"{scope}/motion_fc1/bias"])
    fc2 = lrelu(fc1 @ v[f"{scope}/motion_fc2/kernel"]
                + v[f"{scope}/motion_fc2/bias"])
    motion = fc2 @ v[f"{scope}/motion_fc3/kernel"] \
        + v[f"{scope}/motion_fc3/bias"]
    rotation, translation, scale = motion[:, :3], motion[:, 3:6], motion[:, 6:]

    # expanding part starts from conv5_1, NOT conv5_1_dense5 (v2/blocks.py:462)
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
    """v2 depth_refine_block (v2/blocks.py:499-562): predicts depth AND
    normals (intermediate 16)."""
    H, W = image1.shape[2], image1.shape[3]
    depth2_up = resize_nearest_tf1(depth2, H, W)
    x = np.concatenate([image1, depth2_up], axis=1)

    conv0 = convrelu_same(v, scope, "conv0", x, 3, 1)
    conv1 = convrelu_same(v, scope, "conv1", conv0, 3, 2)
    conv1_1 = convrelu_same(v, scope, "conv1_1", conv1, 3, 1)
    conv2 = convrelu_same(v, scope, "conv2", conv1_1, 3, 2)
    conv2_1 = convrelu_same(v, scope, "conv2_1", conv2, 3, 1)

    concat1 = refine(v, f"{scope}/refine1", conv2_1, conv1_1)
    concat0 = refine(v, f"{scope}/refine0", concat1, conv0)
    depth0, normal0 = predict_depthnormal(
        v, f"{scope}/predict_depth0", concat0, intermediate=16)
    return {"predict_depth0": depth0, "predict_normal0": normal0}
