"""demon_tpu — a TPU-native two-view structure-from-motion framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
lmb-freiburg/demon (DeMoN, CVPR 2017): joint depth + egomotion estimation
for image pairs via a bootstrap / iterative / refinement ConvNet stack,
plus the surrounding framework (geometry op library, data pipeline,
training driver with evolutions, evaluation harness, dataset tools).

Package layout
--------------
ops/     Geometry + image kernel library (the ``lmbspecialops`` equivalent):
         depth_to_flow, flow_to_depth, depth_to_normals, warp2d,
         median3x3_downsample, scale_invariant_gradient, ... as batched
         NHWC jnp ops with Pallas kernels for the hot paths.
models/  The DeMoN network blocks (v1 weights-compatible + v2 trainable)
         as flax.linen modules in NHWC layout.
engine/  Fused jitted inference (bootstrap -> scan(iterative) -> refine)
         and jax.sharding based multi-chip execution.
data/    TPU-native input pipeline: threaded HDF5 sample reader with the
         reference's schema, decode (WebP/LZ4-fp16), augmentation, motion
         encodings, deterministic test mode, device prefetch.
train/   Loss blocks, LR schedules, the 6-evolution training driver,
         orbax checkpointing.
eval/    Depth/motion/flow metrics and the evaluation harness.
tools/   Dataset tools (View geometry, SUN3D ingestion), weight converter.
sfm/     Sequence-level SfM: pose graph, Schur-complement bundle
         adjustment (mesh-distributable), scale propagation, ATE.
vis/     Point clouds, camera glyphs, PLY export.
utils/   Profiling/tracing and small shared helpers.

Conventions (load-bearing; see ops/__init__.py for details)
-----------------------------------------------------------
* Image layout is NHWC everywhere (TPU native).
* Intrinsics are the normalized 4-vector [fx, fy, cx, cy] (units of
  image width/height).
* Pixel centers sit at (x+0.5, y+0.5); normalized image coords are in
  (0, 1).
* Flow is stored channel-last as [dx, dy]; "normalized flow" is in units
  of image width/height.
* Depth is inverse depth at API boundaries unless stated otherwise.
* Rotations are angle-axis 3-vectors (angle = |aa|); relative motion
  (R12, t12) maps cam1-frame points to cam2: X2 = R12 @ X1 + t12.
* Invalid pixels are NaN at API boundaries; losses/metrics mask them.
"""

__version__ = "0.1.0"
