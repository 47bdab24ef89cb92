"""Execution engine: fused jitted inference and mesh/sharding utilities."""

from .inference import DemonEngine, prepare_input_pair
from .server import DemonServer
from .rpc import DemonRpcServer, DemonRpcClient
from .sharding import make_mesh, shard_pytree, data_parallel_sharding

__all__ = [
    "DemonEngine",
    "DemonServer",
    "DemonRpcServer",
    "DemonRpcClient",
    "prepare_input_pair",
    "make_mesh",
    "shard_pytree",
    "data_parallel_sharding",
]
