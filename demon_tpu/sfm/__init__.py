"""Sequence-level structure from motion — chaining DeMoN's pairwise
predictions into trajectories.

This subsystem is a new capability with no reference counterpart
(BASELINE.json north-star): pose-graph optimization over chained pairwise
(R, t) predictions, bundle adjustment with a Schur-complement reduction
that runs as one jitted XLA program (and distributes its point reduction
over a mesh with psum), and trajectory metrics (ATE with Umeyama
alignment).
"""

from .lie import so3_exp, so3_log, se3_exp, se3_log
from .pose_graph import PoseGraphEdge, optimize_pose_graph, chain_relative_poses
from .ba import bundle_adjust, bundle_adjust_sparse, BAProblem
from .trajectory import align_umeyama, absolute_trajectory_error

__all__ = [
    "so3_exp", "so3_log", "se3_exp", "se3_log",
    "PoseGraphEdge", "optimize_pose_graph", "chain_relative_poses",
    "bundle_adjust", "bundle_adjust_sparse", "BAProblem",
    "align_umeyama", "absolute_trajectory_error",
]
