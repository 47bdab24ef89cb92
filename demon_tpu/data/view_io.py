"""Multi-view HDF5 schema IO.

Implements the container format of the reference
(multivih5datareaderop/README.md:161-236, dataset_tools/view_io.py):

* ``image``  — webp bytes, attr format='webp'
* ``depth``  — float16 LZ4 block, attrs format='lz4half',
               depth_metric in {'camera_z','ray_length'}, extents=[H, W]
* ``camera`` — 17 doubles [fx fy skew cx cy r11 r21 r31 r12 r22 r32
               r13 r23 r33 tx ty tz] (R stored column-major),
               attr format='pinhole'
"""

from __future__ import annotations

import numpy as np

from .lz4 import lz4_compress_hc, lz4_uncompress
from .webp import webp_decode, webp_encode
from .view import View


def read_webp_image(h5_dataset) -> np.ndarray:
    """Decode an image dataset to an RGB uint8 array
    (reference view_io.py:27-37 returns a PIL image; we return the array)."""
    return webp_decode(np.asarray(h5_dataset[...]).tobytes())


def write_webp_image(h5_group, image: np.ndarray, dsname: str = "image"):
    """(reference view_io.py:40-56)"""
    data = np.frombuffer(webp_encode(np.asarray(image)), dtype=np.int8)
    ds = h5_group.create_dataset(dsname, data=data)
    ds.attrs["format"] = np.bytes_(b"webp")


def read_lz4half_depth(h5_dataset) -> np.ndarray:
    """Decode an 'lz4half' depth dataset to float32 [H, W]
    (reference view_io.py:59-75)."""
    extents = h5_dataset.attrs["extents"]
    h, w = int(extents[0]), int(extents[1])
    raw = lz4_uncompress(np.asarray(h5_dataset[...]).tobytes(), h * w * 2)
    return np.frombuffer(raw, dtype=np.float16).astype(np.float32).reshape(h, w)


def write_lz4half_depth(h5_group, depth: np.ndarray, depth_metric: str,
                        dsname: str = "depth"):
    """(reference view_io.py:77-99)"""
    if depth_metric not in ("camera_z", "ray_length"):
        raise ValueError(f"bad depth_metric {depth_metric!r}")
    d16 = np.ascontiguousarray(depth, dtype=np.float16)
    comp = np.frombuffer(lz4_compress_hc(d16.tobytes()), dtype=np.int8)
    ds = h5_group.create_dataset(dsname, data=comp)
    ds.attrs["format"] = np.bytes_(b"lz4half")
    ds.attrs["depth_metric"] = np.bytes_(depth_metric.encode())
    ds.attrs["extents"] = np.array(depth.shape[:2], dtype=np.int32)


def read_camera_params(h5_dataset):
    """17-double pinhole layout -> (K, R, t) (reference view_io.py:101-121)."""
    p = np.asarray(h5_dataset[...], dtype=np.float64)
    K = np.array([
        [p[0], p[2], p[3]],
        [0.0, p[1], p[4]],
        [0.0, 0.0, 1.0],
    ])
    R = p[5:14].reshape(3, 3).T  # stored column-major
    t = p[14:17]
    return K, R, t


def write_camera_params(h5_group, K, R, t, dsname: str = "camera"):
    """(reference view_io.py:123-136)"""
    K = np.asarray(K, np.float64)
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)
    p = np.empty(17, np.float64)
    p[0], p[1], p[2], p[3], p[4] = K[0, 0], K[1, 1], K[0, 1], K[0, 2], K[1, 2]
    p[5:14] = R.T.reshape(-1)  # column-major
    p[14:17] = t
    ds = h5_group.create_dataset(dsname, data=p)
    ds.attrs["format"] = np.bytes_(b"pinhole")


def read_view(h5_group) -> View:
    """Read image/depth/camera from a viewpoint group
    (reference view_io.py:138-151)."""
    image = read_webp_image(h5_group["image"]) if "image" in h5_group else None
    depth = None
    depth_metric = "camera_z"
    if "depth" in h5_group:
        ds = h5_group["depth"]
        depth = read_lz4half_depth(ds)
        depth_metric = _attr_str(ds.attrs["depth_metric"])
    K, R, t = read_camera_params(h5_group["camera"])
    return View(R=R, t=t, K=K, image=image, depth=depth,
                depth_metric=depth_metric)


def write_view(h5_group, view: View):
    """(reference view_io.py:153-166)"""
    if view.image is not None:
        write_webp_image(h5_group, np.asarray(view.image))
    if view.depth is not None:
        write_lz4half_depth(h5_group, view.depth, view.depth_metric)
    write_camera_params(h5_group, view.K, view.R, view.t)


def _attr_str(v) -> str:
    if isinstance(v, bytes):
        return v.decode()
    if isinstance(v, np.ndarray):
        v = v.item()
        return v.decode() if isinstance(v, bytes) else str(v)
    return str(v)
