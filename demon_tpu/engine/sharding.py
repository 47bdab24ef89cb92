"""Mesh and sharding utilities — the TPU-native replacement for the
reference's single-host multi-GPU tower loop (training/v2/training.py:137-161,
which splits the batch in Python and averages gradients on the host).

Here parallelism is declarative: build a Mesh, annotate batch-dim shardings
with NamedSharding, and jit — XLA inserts the all-reduces over ICI/DCN.
DeMoN is a ~45M-param ConvNet, so pure data parallelism is the right
layout; the mesh still carries a 'model' axis for the BA/pose-graph
extensions and for oversized batches per chip.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a device mesh. Default: all devices on the 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_parallel_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Sharding that splits dim 0 (batch) across `axis`, replicating the
    rest; 0-d leaves (scalar metadata) replicate."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, ndim: int, data_axis: str = "data",
                     space_axis: str = "space") -> NamedSharding:
    """Batch over `data_axis` AND image height (dim 1, NHWC) over
    `space_axis` — spatial partitioning for resolutions whose activations
    outgrow one chip. Under jit, GSPMD inserts the halo exchanges every
    convolution needs at the height seams automatically."""
    if space_axis not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{space_axis}' axis")
    data = data_axis if data_axis in mesh.axis_names else None
    return NamedSharding(mesh, P(data, space_axis, *([None] * (ndim - 2))))


def shard_pytree(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device_put a pytree of batch-major arrays with batch-dim sharding."""

    def _put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        return jax.device_put(x, data_parallel_sharding(mesh, x.ndim, axis))

    return jax.tree.map(_put, tree)


def replicate_pytree(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def model_parallel_param_shardings(mesh: Mesh, params: Any,
                                   axis: str = "model") -> Any:
    """Pytree of NamedShardings: tensor parallelism for the parameter-
    dominant layers.

    DeMoN's parameter mass concentrates in the dense layers (v2 dense5 is
    96*h/32*w/32 squared — ~21M params at 192x256 — and motion_fc1 another
    ~6M; reference v2/blocks.py:198-215, blocks_original.py:388-394): their
    [in, out] kernels shard column-wise over `axis` and the matching biases
    shard to the same output partition, so each chip holds and trains a
    slice; GSPMD inserts the activation all-gathers/reduce-scatters. Conv
    kernels stay replicated (they're small; dp gradients already ride ICI).

    Works for both the trainer's flat {net: tree} params and the engine's
    {bootstrap/iterative/refinement: ...} trees. Returns shardings usable
    with jax.device_put(params, shardings).
    """
    tp = mesh.shape[axis] if axis in mesh.axis_names else 1
    big = ("dense5", "motion_fc1", "motion_fc2")

    def _one(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if tp > 1 and any(b in names for b in big):
            if names[-1] == "kernel" and leaf.ndim == 2 and \
                    leaf.shape[1] % tp == 0:
                return NamedSharding(mesh, P(None, axis))
            if names[-1] == "bias" and leaf.shape[0] % tp == 0:
                return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [_one(p, l) for p, l in flat])
