"""Loss blocks — NHWC port of the reference v2/losses.py.

All losses are NaN-robust: ground truth carries NaN at invalid pixels
(reader NaN-poisons bad depth, GT flow rendering emits NaN), and
`replace_nonfinite` inside `pointwise_l2_loss` neutralizes them with zero
value AND zero gradient (reference v2/losses.py:23-104).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .. import ops

# scale-invariant-gradient parameter sets used throughout the reference
# (v2/losses.py:173,234,291,339)
SIG_PARAMS_FLOW = dict(deltas=(1, 2, 4, 8, 16), weights=(1.0,) * 5, epsilon=0.001)
SIG_PARAMS_DEPTH = dict(deltas=(1, 2, 4, 8, 16), weights=(1.0,) * 5, epsilon=0.01)


def l1_loss(x: jax.Array, epsilon: float) -> jax.Array:
    """sum(sqrt(x^2 + eps)) (reference v2/losses.py:23-29)."""
    return jnp.sum(jnp.sqrt(x * x + epsilon))


def pointwise_l2_loss(inp: jax.Array, gt: jax.Array, epsilon: float) -> jax.Array:
    """Pointwise unsquared L2 over the channel axis, mean over pixels,
    NaN-in-GT safe (reference v2/losses.py:32-53). NHWC: reduces channels."""
    gt = jax.lax.stop_gradient(gt)
    diff = ops.replace_nonfinite(inp - gt)
    return jnp.mean(jnp.sqrt(jnp.sum(diff * diff, axis=-1) + epsilon))


def scale_invariant_gradient_loss(inp: jax.Array, gt: jax.Array,
                                  epsilon: float) -> jax.Array:
    """Pointwise L2 between sig images, accumulated per (gx, gy) channel
    pair (reference v2/losses.py:83-104)."""
    c = inp.shape[-1]
    assert c % 2 == 0 and c == gt.shape[-1]
    total = 0.0
    for i in range(c // 2):
        total = total + pointwise_l2_loss(
            inp[..., 2 * i : 2 * i + 2], gt[..., 2 * i : 2 * i + 2], epsilon
        )
    return total


def compute_confidence_map(pred_flow: jax.Array, gt_flow: jax.Array,
                           scale: float = 1.0) -> jax.Array:
    """GT confidence c = exp(-s * |f_pr - f_gt|) (reference v2/losses.py:360-373)."""
    return jnp.exp(-scale * jnp.abs(pred_flow - jax.lax.stop_gradient(gt_flow)))


def flow_loss_block(
    gt_flow2, gt_flow5, gt_flow2_sig,
    pr_flow2, pr_flow5, pr_conf2, pr_conf5,
    flow_weight, conf_weight, flow_sig_weight, conf_sig_weight,
    conf_diff_scale=1.0, level5_factor=0.5, loss_prefix="",
) -> Dict[str, jax.Array]:
    """Losses on the flow network outputs (reference v2/losses.py:109-191)."""
    losses = {}
    eps = 1e-5

    losses["loss_flow5"] = (level5_factor * flow_weight) * pointwise_l2_loss(
        pr_flow5, gt_flow5, eps)
    losses["loss_flow2"] = flow_weight * pointwise_l2_loss(pr_flow2, gt_flow2, eps)
    losses["loss_flow5_unscaled"] = pointwise_l2_loss(pr_flow5, gt_flow5, 0.0)
    losses["loss_flow2_unscaled"] = pointwise_l2_loss(pr_flow2, gt_flow2, 0.0)

    conf2 = compute_confidence_map(pr_flow2, gt_flow2, conf_diff_scale)
    conf5 = compute_confidence_map(pr_flow5, gt_flow5, conf_diff_scale)

    if pr_conf5 is not None:
        losses["loss_conf5"] = (level5_factor * conf_weight) * pointwise_l2_loss(
            pr_conf5, conf5, eps)
        losses["loss_conf5_unscaled"] = pointwise_l2_loss(pr_conf5, conf5, 0.0)
    if pr_conf2 is not None:
        losses["loss_conf2"] = conf_weight * pointwise_l2_loss(pr_conf2, conf2, eps)
        losses["loss_conf2_unscaled"] = pointwise_l2_loss(pr_conf2, conf2, 0.0)

    if flow_sig_weight is not None:
        pr_sig = ops.scale_invariant_gradient(pr_flow2, **SIG_PARAMS_FLOW)
        losses["loss_flow2_sig"] = flow_sig_weight * pointwise_l2_loss(
            pr_sig, gt_flow2_sig, eps)
        losses["loss_flow2_sig_unscaled"] = pointwise_l2_loss(pr_sig, gt_flow2_sig, 0.0)

    if conf_sig_weight is not None and pr_conf2 is not None:
        pr_conf_sig = ops.scale_invariant_gradient(pr_conf2, **SIG_PARAMS_FLOW)
        conf2_sig = ops.scale_invariant_gradient(conf2, **SIG_PARAMS_FLOW)
        losses["loss_conf2_sig"] = conf_sig_weight * pointwise_l2_loss(
            pr_conf_sig, conf2_sig, eps)
        losses["loss_conf2_sig_unscaled"] = pointwise_l2_loss(pr_conf_sig, conf2_sig, 0.0)

    return {loss_prefix + k: v for k, v in losses.items()}


# losses that enter the training objective (the rest are telemetry),
# reference training.py:228-229,274-275,375,427-428,457-458
FLOW_SELECTED = ("loss_flow5", "loss_flow2", "loss_flow2_sig",
                 "loss_conf5", "loss_conf2", "loss_conf2_sig")
DEPTHNORMAL_SELECTED = ("loss_depth2", "loss_depth2_sig", "loss_normal2",
                        "loss_rotation", "loss_translation")
REFINE_SELECTED = ("loss_depth0", "loss_depth0_sig", "loss_normal0")


def depthnormal_loss_block(
    gt_depth2, gt_depth2_sig, gt_normal2, gt_rotation, gt_translation,
    pr_depth2, pr_normal2, pr_rotation, pr_translation,
    depth_weight, depth_sig_weight, normal_weight,
    rotation_weight, translation_weight, translation_factor=1.0,
    loss_prefix="",
) -> Dict[str, jax.Array]:
    """Losses on the depth/motion network (reference v2/losses.py:197-262)."""
    losses = {}
    eps = 1e-5
    batch = pr_depth2.shape[0]

    losses["loss_depth2"] = depth_weight * pointwise_l2_loss(pr_depth2, gt_depth2, eps)
    pr_sig = ops.scale_invariant_gradient(pr_depth2, **SIG_PARAMS_DEPTH)
    losses["loss_depth2_sig"] = depth_sig_weight * pointwise_l2_loss(
        pr_sig, gt_depth2_sig, eps)
    losses["loss_depth2_sig_unscaled"] = pointwise_l2_loss(pr_sig, gt_depth2_sig, 0.0)
    losses["loss_normal2"] = normal_weight * pointwise_l2_loss(pr_normal2, gt_normal2, eps)

    gt_rotation = jax.lax.stop_gradient(gt_rotation)
    gt_translation = jax.lax.stop_gradient(gt_translation)
    loss_rot = (rotation_weight / batch) * l1_loss(pr_rotation - gt_rotation, eps)
    loss_trans_nf = (translation_weight / batch) * l1_loss(
        pr_translation - gt_translation, eps)
    losses["loss_rotation"] = loss_rot
    losses["loss_translation"] = translation_factor * loss_trans_nf
    losses["loss_translation_no_factor"] = loss_trans_nf
    losses["rot_transl_loss_ratio"] = loss_rot / loss_trans_nf
    return {loss_prefix + k: v for k, v in losses.items()}


def depth_refine_loss_block(
    gt_depth0, gt_depth0_sig, gt_normal0,
    pr_depth0, pr_normal0,
    depth_weight, depth_sig_weight, normal_weight, loss_prefix="",
) -> Dict[str, jax.Array]:
    """Losses on the refinement network (reference v2/losses.py:265-308).

    pr_normal0 may be None (the v1 refinement block predicts depth only,
    models/blocks.py) — the normal loss is then omitted."""
    losses = {}
    eps = 1e-5
    losses["loss_depth0"] = depth_weight * pointwise_l2_loss(pr_depth0, gt_depth0, eps)
    pr_sig = ops.scale_invariant_gradient(pr_depth0, **SIG_PARAMS_DEPTH)
    losses["loss_depth0_sig"] = depth_sig_weight * pointwise_l2_loss(
        pr_sig, gt_depth0_sig, eps)
    losses["loss_depth0_sig_unscaled"] = pointwise_l2_loss(pr_sig, gt_depth0_sig, 0.0)
    if pr_normal0 is not None:
        losses["loss_normal0"] = normal_weight * pointwise_l2_loss(
            pr_normal0, gt_normal0, eps)
    return {loss_prefix + k: v for k, v in losses.items()}


def prepare_ground_truth_tensors(
    depth: jax.Array,
    rotation: jax.Array,
    translation: jax.Array,
    intrinsics: jax.Array,
) -> Dict[str, jax.Array]:
    """Derive multi-resolution GT (depth pyramid via 3x3-median downsampling,
    rendered flow at levels 0/2/5, normals, sig images) from the reader's
    inverse-depth GT (reference v2/losses.py:312-356).

    depth: [B, H, W, 1] inverse depth (NaN at invalid pixels).
    """
    d1 = ops.median3x3_downsample(depth)
    d2 = ops.median3x3_downsample(d1)
    d3 = ops.median3x3_downsample(d2)
    d4 = ops.median3x3_downsample(d3)
    d5 = ops.median3x3_downsample(d4)

    kw = dict(inverse_depth=True, normalize_flow=True)
    flow0 = ops.depth_to_flow(intrinsics, depth, rotation, translation, **kw)
    flow2 = ops.depth_to_flow(intrinsics, d2, rotation, translation, **kw)
    flow5 = ops.depth_to_flow(intrinsics, d5, rotation, translation, **kw)

    normal0 = ops.depth_to_normals(depth, intrinsics, inverse_depth=True)
    normal2 = ops.depth_to_normals(d2, intrinsics, inverse_depth=True)

    return {
        "depth0": depth,
        # GT depth sig images use the FLOW epsilon (0.001) while the
        # prediction side uses 0.01 — the reference has the same mismatch
        # (v2/losses.py:340 vs :234,:291), which leaves a small nonzero
        # sig-loss floor even for perfect predictions; reproduced for
        # training parity
        "depth0_sig": ops.scale_invariant_gradient(depth, **SIG_PARAMS_FLOW),
        "depth2": d2,
        "depth2_sig": ops.scale_invariant_gradient(d2, **SIG_PARAMS_FLOW),
        "flow0": flow0,
        "flow2": flow2,
        "flow2_sig": ops.scale_invariant_gradient(flow2, **SIG_PARAMS_FLOW),
        "flow5": flow5,
        "normal0": normal0,
        "normal2": normal2,
        "rotation": rotation,
        "translation": translation,
    }
