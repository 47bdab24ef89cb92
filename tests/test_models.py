"""Model block shape/semantics tests for both variants.

Uses a reduced input resolution (96x128) to keep CPU test time sane; all
spatial relations (level 2 = /4, level 5 = /32) are resolution-independent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demon_tpu.models import BootstrapNet, IterativeNet, RefinementNet
from demon_tpu.models.networks import DEMON_INTRINSICS

H, W = 96, 128
B = 1


def _inputs(rng):
    image_pair = jnp.asarray(rng.rand(B, H, W, 6).astype(np.float32) - 0.5)
    image2_2 = jnp.asarray(rng.rand(B, H // 4, W // 4, 3).astype(np.float32) - 0.5)
    intr = jnp.broadcast_to(jnp.asarray(DEMON_INTRINSICS), (B, 4))
    return image_pair, image2_2, intr


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_full_stack_shapes(rng, variant):
    image_pair, image2_2, intr = _inputs(rng)
    key = jax.random.key(0)

    boot = BootstrapNet(variant=variant)
    bparams = boot.init(key, image_pair, image2_2)
    pred = boot.apply(bparams, image_pair, image2_2)

    assert pred.flow2.shape == (B, H // 4, W // 4, 2)
    assert pred.conf2.shape == (B, H // 4, W // 4, 2)
    assert pred.flow5.shape == (B, H // 32, W // 32, 2)
    assert pred.depth2.shape == (B, H // 4, W // 4, 1)
    assert pred.normal2.shape == (B, H // 4, W // 4, 3)
    assert pred.rotation.shape == (B, 3)
    assert pred.translation.shape == (B, 3)
    assert pred.scale.shape == (B, 1)

    it = IterativeNet(variant=variant)
    iparams = it.init(key, image_pair, image2_2, intr, pred)
    pred2 = it.apply(iparams, image_pair, image2_2, intr, pred)
    assert pred2.depth2.shape == pred.depth2.shape
    assert np.isfinite(np.asarray(pred2.depth2)).all()

    ref = RefinementNet(variant=variant)
    rparams = ref.init(key, image_pair[..., :3], pred2.depth2)
    rout = ref.apply(rparams, image_pair[..., :3], pred2.depth2)
    assert rout["predict_depth0"].shape == (B, H, W, 1)
    if variant == "v2":
        assert rout["predict_normal0"].shape == (B, H, W, 3)
    else:
        assert "predict_normal0" not in rout

    # all outputs finite
    for leaf in jax.tree.leaves(pred._asdict()):
        assert np.isfinite(np.asarray(leaf)).all()


def test_v1_param_names_match_reference_manifest(rng):
    """The de-facto weight manifest is the TF variable scope naming
    (reference networks_original.py:44-57, example.py:82-83). Check the key
    layer names exist so the checkpoint converter has a stable target."""
    image_pair, image2_2, intr = _inputs(rng)
    boot = BootstrapNet(variant="v1")
    params = boot.init(jax.random.key(0), image_pair, image2_2)["params"]

    flow = params["netFlow1"]
    for name in ["conv1y", "conv1x", "conv2y", "conv2_1y", "conv5_1x"]:
        assert name in flow, sorted(flow.keys())
    assert "conv1" in flow["predict_flow5"]
    assert "upconv" in flow["upsample_flow5to4"]
    assert "upconv" in flow["refine4"]

    dm = params["netDM1"]
    for name in ["motion_fc1", "motion_fc2", "motion_fc3", "motion_conv1",
                 "conv2_extra_inputs" + "y"]:
        assert name in dm, sorted(dm.keys())
    assert "conv1" in dm["predict_depthnormal2"]


def test_v1_caffe_conv_channels(rng):
    """v1 uses uniform channel counts in the factored pairs; v2 uses
    (smaller, larger) tuples (blocks_original.py:141 vs v2/blocks.py:140)."""
    image_pair, image2_2, _ = _inputs(rng)
    p1 = BootstrapNet(variant="v1").init(jax.random.key(0), image_pair, image2_2)
    p2 = BootstrapNet(variant="v2").init(jax.random.key(0), image_pair, image2_2)
    k1 = p1["params"]["netFlow1"]["conv1y"]["kernel"]
    k2 = p2["params"]["netFlow1"]["conv1y"]["kernel"]
    assert k1.shape == (9, 1, 6, 32)
    assert k2.shape == (9, 1, 6, 24)
    # v2 has the dense bottleneck, v1 does not
    assert "dense5" in p2["params"]["netFlow1"]
    assert "dense5" not in p1["params"]["netFlow1"]


def test_caffe_padding_differs_from_same(rng):
    """Caffe pad-then-VALID vs SAME differ by a one-pixel shift for stride-2
    odd kernels — the load-bearing detail for v1 weight parity."""
    from demon_tpu.models.layers import convrelu2
    import flax.linen as nn

    class M(nn.Module):
        pad_mode: str

        @nn.compact
        def __call__(self, x):
            return convrelu2(x, 4, 7, name="c", stride=2, pad_mode=self.pad_mode)

    x = jnp.asarray(rng.rand(1, 16, 16, 2).astype(np.float32))
    m1, m2 = M("caffe"), M("same")
    p = m1.init(jax.random.key(0), x)
    a = m1.apply(p, x)
    b = m2.apply(p, x)
    assert a.shape == b.shape == (1, 8, 8, 4)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_phase_upconv_matches_conv_transpose(rng):
    """The phase-decomposed upconv (one dense 2x2 conv over the four output
    phases + interleave) must equal flax's nn.ConvTranspose bit-for-bit up to
    fp32 roundoff, for both padding geometries (VALID full output and SAME ==
    VALID[1:1+2H]). Exactness matters: the converter maps TF conv2d_transpose
    weights onto this parameter tree (tools/converter.py:46-75)."""
    import flax.linen as nn
    from demon_tpu.models.layers import PhaseUpconv

    B, H, W, Cin, Cout = 2, 6, 9, 5, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 4, Cin, Cout).astype(np.float32))
    b = jnp.asarray(rng.randn(Cout).astype(np.float32))
    params = {"params": {"kernel": k, "bias": b}}

    ref_valid = nn.ConvTranspose(
        features=Cout, kernel_size=(4, 4), strides=(2, 2), padding="VALID"
    ).apply(params, x)
    ref_same = nn.ConvTranspose(
        features=Cout, kernel_size=(4, 4), strides=(2, 2), padding="SAME"
    ).apply(params, x)
    got = PhaseUpconv(features=Cout).apply(params, x)

    assert got.shape == (B, 2 * H + 2, 2 * W + 2, Cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_valid),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got[:, 1 : 1 + 2 * H, 1 : 1 + 2 * W, :]),
        np.asarray(ref_same), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_pallas_conv_path_matches_xla(rng, variant):
    """FlowBlock with pallas=True (VMEM-fused factored-conv pairs) must
    produce the same outputs and the same parameter tree as the XLA path.
    On CPU the pallas kernel runs in interpreter mode — identical math."""
    from demon_tpu.models.blocks import FlowBlock

    x = jnp.asarray(rng.rand(1, 64, 96, 6).astype(np.float32) - 0.5)
    ref_block = FlowBlock(variant=variant, pallas=False)
    pal_block = FlowBlock(variant=variant, pallas=True)
    params = jax.jit(ref_block.init)(jax.random.key(0), x)
    params_p = jax.eval_shape(pal_block.init, jax.random.key(0), x)
    assert jax.tree.map(lambda a: (a.shape, a.dtype), params) == \
        jax.tree.map(lambda a: (a.shape, a.dtype), params_p)

    ref = ref_block.apply(params, x)
    got = pal_block.apply(params, x)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=5e-4, rtol=1e-3, err_msg=k)


def test_pallas_engine_matches_xla(rng):
    """Full engine (bootstrap + iterative + refinement) with use_pallas=True
    must match the XLA engine — covers the fused conv pairs AND the packed
    prediction-head kernel in every block, both padding geometries."""
    from demon_tpu.engine.inference import DemonEngine

    H = W = 64
    ip = jnp.asarray(rng.rand(1, H, W, 6).astype(np.float32) - 0.5)
    i22 = jnp.asarray(rng.rand(1, H // 4, W // 4, 3).astype(np.float32) - 0.5)
    intr = jnp.asarray([[0.89, 1.19, 0.5, 0.5]], np.float32)

    ref_eng = DemonEngine(variant="v1", iterations=1)
    pal_eng = DemonEngine(variant="v1", iterations=1, use_pallas=True)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    boot = jax.jit(ref_eng.bootstrap.init)(k1, ip, i22)
    prev = jax.jit(ref_eng.bootstrap.apply)(boot, ip, i22)
    itp = jax.jit(ref_eng.iterative.init)(k2, ip, i22, intr, prev)
    refp = jax.jit(ref_eng.refinement.init)(k3, ip[..., :3], prev.depth2)
    params = {"bootstrap": boot, "iterative": itp, "refinement": refp}

    a = jax.jit(ref_eng._predict)(params, ip, i22, intr)
    b = jax.jit(pal_eng._predict)(params, ip, i22, intr)
    np.testing.assert_allclose(np.asarray(b.depth_refined),
                               np.asarray(a.depth_refined),
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(b.prediction.rotation),
                               np.asarray(a.prediction.rotation), atol=1e-3)
