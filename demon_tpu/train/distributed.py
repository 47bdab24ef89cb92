"""Multi-host training setup helpers.

The reference has no distributed story (its multi-GPU towers are
single-host and disabled, training.py:33-34). On a TPU pod slice the
recipe is: initialize the jax distributed runtime, build one global mesh
over all chips, shard the batch over 'data', and give every host its own
reader over a disjoint sample shard (ReaderParams.host_id/num_hosts).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on a single process). On TPU
    pods the arguments are discovered from the environment."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def global_data_mesh(axis_names: Sequence[str] = ("data", "model")):
    """All-devices mesh with every chip on the data axis (DCN between
    hosts, ICI within); pair with per-host readers:

        from demon_tpu.engine.sharding import make_mesh
        mesh = global_data_mesh()
        reader_params.update(host_id=jax.process_index(),
                             num_hosts=jax.process_count())
    """
    from ..engine.sharding import make_mesh

    return make_mesh(None, axis_names)


def host_reader_params(params: dict) -> dict:
    """Stamp this process's input shard onto reader params."""
    out = dict(params)
    out["host_id"] = jax.process_index()
    out["num_hosts"] = jax.process_count()
    return out
