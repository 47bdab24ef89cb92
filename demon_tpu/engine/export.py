"""AOT deployment artifacts for the fused inference pipeline.

`jax.export` serializes the traced-and-lowered StableHLO of the whole
bootstrap -> scan(iterative) -> refinement program into one portable,
version-stable blob. A serving process deserializes and calls it without
the model code (or flax) on its import path — compile once, deploy many.
This is the TPU-native analog of the reference's deployment story, which
rebuilds the TF1 graph and loads the released snapshot in each consumer
process (the 5-`session.run` graph of examples/example.py:60-99 plus the
checkpoint restored at examples/example.py:73-81).

Weights stay OUT of the artifact (they are call arguments), so the blob
is a few MB of program, weights ship via orbax (`tools/converter.py`
save_params/load_params), and a new checkpoint never forces re-export.

The batch dimension is exported symbolically by default; if the
installed jax cannot trace the pipeline's gather/scan internals with a
symbolic batch, export with a fixed int batch instead and keep one
artifact per `DemonServer` power-of-two bucket.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp

from jax import export as jax_export


def export_predict(engine, params, batch: Union[int, str] = "b",
                   height: Optional[int] = None,
                   width: Optional[int] = None,
                   path: Optional[str] = None) -> bytes:
    """Serialize `engine._predict` (the single fused program) to bytes.

    batch  — an int for a fixed-batch artifact, or a symbolic dimension
             name (default "b") for a batch-polymorphic one.
    params — a real parameter tree or a matching tree of
             jax.ShapeDtypeStruct; only shapes/dtypes are read. Cast to
             bf16 first (DemonEngine.cast_params) to pin serving dtype.
    path   — optionally also write the blob to this file (atomic).
    """
    H = height or engine.HEIGHT
    W = width or engine.WIDTH
    if isinstance(batch, str):
        (b,) = jax_export.symbolic_shape(batch)
    else:
        b = int(batch)
    p_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), params)
    args = (
        p_specs,
        jax.ShapeDtypeStruct((b, H, W, 6), jnp.float32),
        jax.ShapeDtypeStruct((b, H // 4, W // 4, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, 4), jnp.float32),
    )
    exported = jax_export.export(jax.jit(engine._predict))(*args)
    blob = exported.serialize()
    if path:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    return blob


def load_exported(src: Union[str, bytes]) -> Callable[..., Any]:
    """Rehydrate an artifact written by export_predict.

    Returns a callable `(params, image_pair, image2_2, intrinsics) ->
    DemonOutput-pytree` that jit-compiles for the local backend on first
    use. `src` is the blob or a path to it.
    """
    if isinstance(src, (bytes, bytearray)):
        blob = bytes(src)
    else:
        with open(src, "rb") as f:
            blob = f.read()
    exported = jax_export.deserialize(blob)
    return jax.jit(exported.call)
