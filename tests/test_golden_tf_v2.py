"""TF-semantics golden cross-check for the v2 (trainable) path.

Same method as test_golden_tf_v1: a numpy forward model transcribed from
the REFERENCE v2 source (tests/golden_tf_v2.py) runs on random TF-layout
weights; the same weights go through tools/converter into the flax v2
modules. Agreement to fp32 tolerance fails if any SAME-padding, dense5
flatten/slice, motion-tower concat, conv5 kernel-size, or
refine-from-conv5_1 convention is wrong.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demon_tpu.models import (
    BootstrapNet, IterativeNet, RefinementNet, DemonPrediction,
)

import golden_tf_v2 as golden
from test_golden_tf_v1 import _nhwc, _nchw, _flax_to_tf_vars, _check

H, W = 64, 96
B = 2


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(7)
    return {
        "image_pair": (rng.rand(B, 6, H, W).astype(np.float32) - 0.5),
        "image2_2": (rng.rand(B, 3, H // 4, W // 4).astype(np.float32) - 0.5),
        "intrinsics": np.tile(
            np.array([[0.89115971, 1.18821287, 0.5, 0.5]], np.float32),
            (B, 1)),
    }


@pytest.fixture(scope="module")
def rand_prev():
    rng = np.random.RandomState(13)
    h2, w2 = H // 4, W // 4
    return {
        "depth2": rng.uniform(0.5, 2.0, (B, 1, h2, w2)).astype(np.float32),
        "normal2": rng.randn(B, 3, h2, w2).astype(np.float32) * 0.5,
        "rotation": (rng.randn(B, 3) * 0.05).astype(np.float32),
        "translation": np.tile(np.array([[0.6, 0.0, -0.8]], np.float32),
                               (B, 1)),
        "flow2": (rng.randn(B, 2, h2, w2) * 0.02).astype(np.float32),
        "conf2": rng.rand(B, 2, h2, w2).astype(np.float32),
    }


def _init_params(module, *args):
    return jax.jit(module.init)(jax.random.key(0), *args)


def test_bootstrap_v2_matches_tf_golden(inputs):
    net = BootstrapNet(variant="v2")
    ip = jnp.asarray(_nhwc(inputs["image_pair"]))
    i22 = jnp.asarray(_nhwc(inputs["image2_2"]))
    params = _init_params(net, ip, i22)
    pred = jax.jit(net.apply)(params, ip, i22)

    v = _flax_to_tf_vars(params)
    flow_out = golden.flow_block(v, "netFlow1", inputs["image_pair"])
    flow2 = flow_out["predict_flowconf2"][:, :2]
    dm_out = golden.depthmotion_block(
        v, "netDM1", inputs["image_pair"], inputs["image2_2"],
        prev_flow2=flow2, prev_flowconf2=flow_out["predict_flowconf2"])

    _check(jnp.concatenate([pred.flow5, pred.conf5], -1),
           flow_out["predict_flowconf5"], "flowconf5")
    _check(jnp.concatenate([pred.flow2, pred.conf2], -1),
           flow_out["predict_flowconf2"], "flowconf2")
    _check(pred.depth2, dm_out["predict_depth2"], "depth2")
    _check(pred.normal2, dm_out["predict_normal2"], "normal2")
    np.testing.assert_allclose(pred.rotation, dm_out["predict_rotation"],
                               atol=5e-4)
    np.testing.assert_allclose(pred.translation,
                               dm_out["predict_translation"], atol=5e-4)
    np.testing.assert_allclose(pred.scale, dm_out["predict_scale"], atol=5e-4)


def test_iterative_v2_matches_tf_golden(inputs, rand_prev):
    net = IterativeNet(variant="v2")
    ip = jnp.asarray(_nhwc(inputs["image_pair"]))
    i22 = jnp.asarray(_nhwc(inputs["image2_2"]))
    intr = jnp.asarray(inputs["intrinsics"])
    h5, w5 = H // 32, W // 32
    prev = DemonPrediction(
        flow2=jnp.asarray(_nhwc(rand_prev["flow2"])),
        conf2=jnp.asarray(_nhwc(rand_prev["conf2"])),
        flow5=jnp.zeros((B, h5, w5, 2)),
        conf5=jnp.zeros((B, h5, w5, 2)),
        depth2=jnp.asarray(_nhwc(rand_prev["depth2"])),
        normal2=jnp.asarray(_nhwc(rand_prev["normal2"])),
        rotation=jnp.asarray(rand_prev["rotation"]),
        translation=jnp.asarray(rand_prev["translation"]),
        scale=jnp.ones((B, 1)),
    )
    params = _init_params(net, ip, i22, intr, prev)
    pred = jax.jit(net.apply)(params, ip, i22, intr, prev)

    v = _flax_to_tf_vars(params)
    flow_out = golden.flow_block(
        v, "netFlow2", inputs["image_pair"],
        image2_2=inputs["image2_2"], intrinsics=inputs["intrinsics"],
        prev_predictions={
            "predict_depth2": rand_prev["depth2"],
            "predict_normal2": rand_prev["normal2"],
            "predict_rotation": rand_prev["rotation"],
            "predict_translation": rand_prev["translation"],
        })
    flow2 = flow_out["predict_flowconf2"][:, :2]
    dm_out = golden.depthmotion_block(
        v, "netDM2", inputs["image_pair"], inputs["image2_2"],
        prev_flow2=flow2, prev_flowconf2=flow_out["predict_flowconf2"],
        prev_rotation=rand_prev["rotation"],
        prev_translation=rand_prev["translation"],
        intrinsics=inputs["intrinsics"])

    _check(jnp.concatenate([pred.flow2, pred.conf2], -1),
           flow_out["predict_flowconf2"], "flowconf2")
    _check(pred.depth2, dm_out["predict_depth2"], "depth2")
    _check(pred.normal2, dm_out["predict_normal2"], "normal2")
    np.testing.assert_allclose(pred.rotation, dm_out["predict_rotation"],
                               atol=5e-4)


def test_refinement_v2_matches_tf_golden(inputs, rand_prev):
    net = RefinementNet(variant="v2")
    img1 = jnp.asarray(_nhwc(inputs["image_pair"][:, :3]))
    d2 = jnp.asarray(_nhwc(rand_prev["depth2"]))
    params = _init_params(net, img1, d2)
    out = jax.jit(net.apply)(params, img1, d2)

    v = _flax_to_tf_vars(params)
    gold = golden.depth_refine_block(
        v, "netRefine", inputs["image_pair"][:, :3], rand_prev["depth2"])
    _check(out["predict_depth0"], gold["predict_depth0"], "depth0")
    _check(out["predict_normal0"], gold["predict_normal0"], "normal0")
