"""DeMoN network blocks and networks as flax.linen modules (NHWC).

Two variants, mirroring the reference:
* ``v1`` — architecture of the released weights (caffe-style explicit
  padding, 512-wide encoder, conv-tower motion head); reference
  blocks_original.py.
* ``v2`` — the trainable TF re-design (SAME padding, 384-wide encoder with
  a dense bottleneck, separate strided motion tower, flow_to_depth2 with
  [0, 50] clip, refinement net that also predicts normals); reference
  v2/blocks.py.
"""

from .blocks import FlowBlock, DepthMotionBlock, RefinementBlock
from .networks import (
    BootstrapNet,
    IterativeNet,
    RefinementNet,
    DemonPrediction,
    DEMON_INTRINSICS,
)

__all__ = [
    "FlowBlock",
    "DepthMotionBlock",
    "RefinementBlock",
    "BootstrapNet",
    "IterativeNet",
    "RefinementNet",
    "DemonPrediction",
    "DEMON_INTRINSICS",
]
