"""Pallas warp kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demon_tpu import ops


def _pallas_warp_interpret(image, flow, normalized=True):
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from demon_tpu.ops.pallas_warp import _warp_kernel

    B, H, W, C = image.shape
    hw = H * W
    block_out, block_src = 256, 512
    out = pl.pallas_call(
        functools.partial(_warp_kernel, h=H, w=W, c=C, block_out=block_out,
                          block_src=block_src, normalized=normalized,
                          border_value=0.0),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), image.dtype),
        grid=(B, hw // block_out),
        in_specs=[
            pl.BlockSpec((1, block_out, 2), lambda b, p: (b, p, 0)),
            pl.BlockSpec((1, hw, C), lambda b, p: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_out, C), lambda b, p: (b, p, 0)),
        interpret=True,
    )(flow.reshape(B, hw, 2), image.reshape(B, hw, C))
    return out.reshape(B, H, W, C)


def test_pallas_warp_matches_jnp():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 16, 32, 3  # H*W = 512
    image = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    flow = jnp.asarray((rng.rand(B, H, W, 2).astype(np.float32) - 0.5) * 0.2)
    # some NaN displacements
    flow = flow.at[0, 3, 4].set(jnp.nan)

    want = ops.warp2d(image, flow, normalized=True, border_mode="value")
    got = _pallas_warp_interpret(image, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_warp_zero_flow_identity():
    rng = np.random.RandomState(1)
    B, H, W, C = 1, 16, 16, 4  # H*W = 256
    image = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    flow = jnp.zeros((B, H, W, 2), jnp.float32)
    import functools

    got = _pallas_warp_interpret_small(image, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(image), atol=1e-6)


def _pallas_warp_interpret_small(image, flow):
    import functools

    from jax.experimental import pallas as pl

    from demon_tpu.ops.pallas_warp import _warp_kernel

    B, H, W, C = image.shape
    hw = H * W
    block_out = block_src = 128
    out = pl.pallas_call(
        functools.partial(_warp_kernel, h=H, w=W, c=C, block_out=block_out,
                          block_src=block_src, normalized=True,
                          border_value=0.0),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), image.dtype),
        grid=(B, hw // block_out),
        in_specs=[
            pl.BlockSpec((1, block_out, 2), lambda b, p: (b, p, 0)),
            pl.BlockSpec((1, hw, C), lambda b, p: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_out, C), lambda b, p: (b, p, 0)),
        interpret=True,
    )(flow.reshape(B, hw, 2), image.reshape(B, hw, C))
    return out.reshape(B, H, W, C)


def test_fused_convrelu2_matches_xla():
    """Pallas fused factored-conv pair vs flax convs (interpret mode)."""
    import flax.linen as nn

    from demon_tpu.ops import leaky_relu
    from demon_tpu.ops.pallas_conv import fused_convrelu2_s1

    rng = np.random.RandomState(0)
    B, H, W, Cin, Cmid, Cout, k = 2, 16, 32, 8, 16, 24, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32) * 0.3)
    wy = jnp.asarray(rng.randn(k, 1, Cin, Cmid).astype(np.float32) * 0.2)
    by = jnp.asarray(rng.randn(Cmid).astype(np.float32) * 0.1)
    wx = jnp.asarray(rng.randn(1, k, Cmid, Cout).astype(np.float32) * 0.2)
    bx = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1)

    cy = nn.Conv(Cmid, (k, 1), padding="SAME")
    cx = nn.Conv(Cout, (1, k), padding="SAME")
    mid = leaky_relu(cy.apply({"params": {"kernel": wy, "bias": by}}, x))
    ref = leaky_relu(cx.apply({"params": {"kernel": wx, "bias": bx}}, mid))

    got = fused_convrelu2_s1(x, wy, by, wx, bx, k=k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
