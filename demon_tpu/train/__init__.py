"""Training subsystem: losses, schedules, the evolution trainer."""

from .losses import (
    l1_loss,
    pointwise_l2_loss,
    scale_invariant_gradient_loss,
    compute_confidence_map,
    flow_loss_block,
    depthnormal_loss_block,
    depth_refine_loss_block,
    prepare_ground_truth_tensors,
    SIG_PARAMS_FLOW,
    SIG_PARAMS_DEPTH,
)
from .schedules import ease_in_quad, ease_out_quad, demon_lr_schedule
from .trainer import EvolutionTrainer, TrainConfig, EVOLUTIONS
from .driver import TrainingDriver
from .checkpoint import EvolutionCheckpointer, check_numerics
from .distributed import initialize_distributed, global_data_mesh, host_reader_params

__all__ = [
    "l1_loss",
    "pointwise_l2_loss",
    "scale_invariant_gradient_loss",
    "compute_confidence_map",
    "flow_loss_block",
    "depthnormal_loss_block",
    "depth_refine_loss_block",
    "prepare_ground_truth_tensors",
    "SIG_PARAMS_FLOW",
    "SIG_PARAMS_DEPTH",
    "ease_in_quad",
    "ease_out_quad",
    "demon_lr_schedule",
    "EvolutionTrainer",
    "TrainConfig",
    "EVOLUTIONS",
    "TrainingDriver",
    "EvolutionCheckpointer",
    "check_numerics",
    "initialize_distributed",
    "global_data_mesh",
    "host_reader_params",
]
