"""The three DeMoN networks (bootstrap / iterative / refinement) as flax
modules, plus the prediction structure shared across the stack.

Unlike the reference (networks_original.py / v2/networks.py), these are
stateless modules evaluated inside a single jitted program — the engine
fuses bootstrap + N iterative applications + refinement with lax.scan
(see engine/inference.py) instead of 5 host round-trips
(reference examples/example.py:87-99).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .blocks import FlowBlock, DepthMotionBlock, RefinementBlock

# The normalized intrinsics DeMoN was trained for
# (reference examples/example.py:51-62, networks_original.py:108).
DEMON_INTRINSICS = np.array([0.89115971, 1.18821287, 0.5, 0.5], dtype=np.float32)


class DemonPrediction(NamedTuple):
    """Per-iteration network state/output (NHWC, level-2 resolution)."""

    flow2: jax.Array        # [B, H/4, W/4, 2]
    conf2: jax.Array        # [B, H/4, W/4, 2]
    flow5: jax.Array        # [B, H/32, W/32, 2]
    conf5: jax.Array        # [B, H/32, W/32, 2]
    depth2: jax.Array       # [B, H/4, W/4, 1] inverse depth
    normal2: jax.Array      # [B, H/4, W/4, 3]
    rotation: jax.Array     # [B, 3] angle-axis
    translation: jax.Array  # [B, 3]
    scale: jax.Array        # [B, 1]


def _split_flowconf(fc):
    return fc[..., :2], fc[..., 2:]


class BootstrapNet(nn.Module):
    """netFlow1 + netDM1: first estimate from the image pair alone
    (reference networks_original.py:22-88)."""

    variant: str = "v1"
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False
    pallas_head: Optional[bool] = None

    @nn.compact
    def __call__(self, image_pair: jax.Array, image2_2: jax.Array) -> DemonPrediction:
        flow_out = FlowBlock(self.variant, self.dtype, self.pallas, self.pallas_head, name="netFlow1")(image_pair)
        flow5, conf5 = _split_flowconf(flow_out["predict_flowconf5"])
        flow2, conf2 = _split_flowconf(flow_out["predict_flowconf2"])
        dm = DepthMotionBlock(self.variant, self.dtype, self.pallas, self.pallas_head, name="netDM1")(
            image_pair=image_pair,
            image2_2=image2_2,
            prev_flow2=flow2,
            prev_flowconf2=flow_out["predict_flowconf2"],
        )
        return DemonPrediction(
            flow2=flow2,
            conf2=conf2,
            flow5=flow5,
            conf5=conf5,
            depth2=dm["predict_depth2"],
            normal2=dm["predict_normal2"],
            rotation=dm["predict_rotation"],
            translation=dm["predict_translation"],
            scale=dm["predict_scale"],
        )


class IterativeNet(nn.Module):
    """netFlow2 + netDM2: refine the previous prediction; applied N times
    with shared weights (reference networks_original.py:92-198)."""

    variant: str = "v1"
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False
    pallas_head: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        image_pair: jax.Array,
        image2_2: jax.Array,
        intrinsics: jax.Array,
        prev: DemonPrediction,
    ) -> DemonPrediction:
        flow_out = FlowBlock(self.variant, self.dtype, self.pallas, self.pallas_head, name="netFlow2")(
            image_pair,
            image2_2=image2_2,
            intrinsics=intrinsics,
            prev={
                "depth2": prev.depth2,
                "normal2": prev.normal2,
                "rotation": prev.rotation,
                "translation": prev.translation,
            },
        )
        flow5, conf5 = _split_flowconf(flow_out["predict_flowconf5"])
        flow2, conf2 = _split_flowconf(flow_out["predict_flowconf2"])
        dm = DepthMotionBlock(self.variant, self.dtype, self.pallas, self.pallas_head, name="netDM2")(
            image_pair=image_pair,
            image2_2=image2_2,
            prev_flow2=flow2,
            prev_flowconf2=flow_out["predict_flowconf2"],
            prev_rotation=prev.rotation,
            prev_translation=prev.translation,
            intrinsics=intrinsics,
        )
        return DemonPrediction(
            flow2=flow2,
            conf2=conf2,
            flow5=flow5,
            conf5=conf5,
            depth2=dm["predict_depth2"],
            normal2=dm["predict_normal2"],
            rotation=dm["predict_rotation"],
            translation=dm["predict_translation"],
            scale=dm["predict_scale"],
        )


class RefinementNet(nn.Module):
    """netRefine: upsample the level-2 depth to full resolution guided by
    image 1 (reference networks_original.py:202-255).

    `normal2` is accepted but unused — the reference v2 eval() feeds a
    normal2 placeholder the block never reads (v2/networks.py:204-227);
    the quirk is preserved at the API level only."""

    variant: str = "v1"
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False
    pallas_head: Optional[bool] = None

    @nn.compact
    def __call__(self, image1: jax.Array, depth2: jax.Array,
                 normal2: jax.Array = None):
        del normal2
        return RefinementBlock(self.variant, self.dtype, self.pallas, self.pallas_head, name="netRefine")(
            image1, depth2
        )
