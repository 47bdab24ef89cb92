"""Execution engine: fused jitted inference and mesh/sharding utilities."""

from .inference import DemonEngine, prepare_input_pair
from .server import DemonServer
from .sharding import make_mesh, shard_pytree, data_parallel_sharding

__all__ = [
    "DemonEngine",
    "DemonServer",
    "prepare_input_pair",
    "make_mesh",
    "shard_pytree",
    "data_parallel_sharding",
]
