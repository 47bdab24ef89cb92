"""Data subsystem — the TPU-native replacement for the reference's
``multivih5datareaderop`` (C++ TF op) and ``depthmotionnet/dataset_tools``.

Layers:

* codecs: LZ4 (ctypes over liblz4) and WebP (PIL, with a libwebp ctypes
  encoder for parity with the reference's container format).
* view/view_io: the ``View`` abstraction and the multi-view HDF5 schema
  (reference multivih5datareaderop/README.md:161-236).
* reader: ``MultiViH5DataReader`` — threaded scene-pool batch pipeline with
  the reference's augmentation, motion-encoding and NaN semantics
  (reference multivih5datareader.cpp), emitting NHWC numpy batches.
* pipeline: host->device prefetch onto a jax.sharding mesh (per-host batch
  sharding instead of the reference's single reader feeding one GPU).
"""

from .view import View
from .view_io import (
    read_view,
    write_view,
    read_camera_params,
    write_camera_params,
    read_webp_image,
    write_webp_image,
    read_lz4half_depth,
    write_lz4half_depth,
)
from .reader import MultiViH5DataReader, ReaderParams, SourceParams
from .mp_reader import MultiProcessReader
from .pipeline import device_prefetch
from .helpers import add_sources

__all__ = [
    "View",
    "read_view",
    "write_view",
    "read_camera_params",
    "write_camera_params",
    "read_webp_image",
    "write_webp_image",
    "read_lz4half_depth",
    "write_lz4half_depth",
    "MultiViH5DataReader",
    "MultiProcessReader",
    "ReaderParams",
    "SourceParams",
    "device_prefetch",
    "add_sources",
]
