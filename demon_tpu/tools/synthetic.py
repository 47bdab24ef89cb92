"""Synthetic two-view dataset generator — geometrically consistent pairs
with known depth and motion, in the reader's h5 format.

Fills the gap the reference leaves for egress-less environments: its
datasets are multi-GB downloads (datasets/download_traindata.sh), so
convergence and accuracy can only be demonstrated here on self-generated
scenes. Construction: a smooth random texture is the view-2 image; depth
and relative motion are sampled; the view-1 image is the texture
backward-warped by the ground-truth flow (ops.warp2d), which makes
(image1, image2, depth1, R12, t12) consistent up to occlusion and the
container's lossy WebP encoding (write_view, quality 90 — a small
photometric noise floor on the stored images).

Scenes are written with data.view_io.write_view (WebP + LZ4-fp16, the
reference container, multivih5datareaderop/README.md:161-236), so the
full production path — reader, cache, augmentation — runs unchanged.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..data.view import View
from ..data import host_geometry as hg

# the DeMoN operating intrinsics (examples/example.py:51-62)
_INTR = np.array([0.89115971, 1.18821287, 0.5, 0.5])


def _smooth_noise(rng, h, w, channels, base=8, octaves=3, amp=1.0):
    """Multi-octave smooth random field in [0,1], [h,w,channels]."""
    from PIL import Image

    out = np.zeros((h, w, channels), np.float32)
    total = 0.0
    for o in range(octaves):
        gh, gw = base * (2 ** o), int(base * (2 ** o) * w / h)
        weight = amp / (2 ** o)
        for c in range(channels):
            g = rng.rand(gh, gw).astype(np.float32)
            up = np.asarray(Image.fromarray(g, "F").resize(
                (w, h), Image.BICUBIC))
            out[..., c] += weight * up
        total += weight
    out /= total
    return np.clip(out, 0.0, 1.0)


def _bilinear_warp_np(image: np.ndarray, flow_px: np.ndarray) -> np.ndarray:
    """Numpy backward warp (clamp border): out(x) = image(x + flow(x)).
    Host-side twin of ops.warp2d for the generator — scene synthesis must
    not dispatch device ops (pathological over a remote TPU transport)."""
    h, w = image.shape[:2]
    xs = np.arange(w)[None, :] + flow_px[..., 0]
    ys = np.arange(h)[:, None] + flow_px[..., 1]
    xs = np.clip(xs, 0, w - 1)
    ys = np.clip(ys, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 2)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 2)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    im = image if image.ndim == 3 else image[..., None]
    v00 = im[y0, x0]
    v01 = im[y0, x0 + 1]
    v10 = im[y0 + 1, x0]
    v11 = im[y0 + 1, x0 + 1]
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return out if image.ndim == 3 else out[..., 0]


def make_scene(rng: np.random.RandomState, height: int = 192,
               width: int = 256,
               max_rotation: float = 0.08,
               baseline_range: Tuple[float, float] = (0.05, 0.25)
               ) -> Tuple[View, View]:
    """One consistent two-view scene: returns (view1, view2)."""
    h, w = height, width
    K = np.array([[_INTR[0] * w, 0, _INTR[2] * w],
                  [0, _INTR[1] * h, _INTR[3] * h],
                  [0, 0, 1.0]])

    # view-2 texture and view-1 depth
    tex2 = (_smooth_noise(rng, h, w, 3, base=6, octaves=4) * 255).astype(
        np.uint8)
    depth1 = (1.2 + 2.0 * _smooth_noise(rng, h, w, 1, base=4, octaves=2)
              )[..., 0].astype(np.float32)

    # relative motion: modest rotation, baseline scaled to keep flow local
    aa = rng.randn(3)
    aa = aa / (np.linalg.norm(aa) + 1e-12) * rng.uniform(0.2, 1.0) \
        * max_rotation
    R12 = hg.angleaxis_to_rotation_matrix(aa)
    t12 = rng.randn(3)
    t12 = t12 / np.linalg.norm(t12) * rng.uniform(*baseline_range)

    # cameras: view1 at origin; world == cam1 frame
    R1, t1 = np.eye(3), np.zeros(3)
    R2, t2 = R12, t12.copy()

    Kn = K.copy()
    Kn[0] /= w
    Kn[1] /= h
    flow_px = hg.compute_flow(depth1, Kn, R1, t1, Kn, R2, t2)  # [h,w,2] px

    # image1 = texture (view-2 image) backward-warped by the GT flow
    img2_f = tex2.astype(np.float32) / 255.0
    img1_f = _bilinear_warp_np(img2_f, flow_px)
    img1 = np.clip(img1_f * 255.0 + 0.5, 0, 255).astype(np.uint8)

    # view-2 depth: z of the transformed points, resampled into frame 2
    # (valid geometry; only needed to satisfy the container format)
    rays = np.stack(np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5),
                    axis=-1)
    X1 = np.concatenate([
        (rays[..., :1] / w - _INTR[2]) / _INTR[0],
        (rays[..., 1:] / h - _INTR[3]) / _INTR[1],
        np.ones((h, w, 1))], axis=-1) * depth1[..., None]
    z2 = (X1 @ R12.T + t12)[..., 2].astype(np.float32)
    depth2 = np.maximum(_bilinear_warp_np(z2, -flow_px), 0.1)

    v1 = View(R=R1, t=t1, K=K, image=img1, depth=depth1,
              depth_metric="camera_z")
    v2 = View(R=R2, t=t2, K=K, image=tex2, depth=depth2,
              depth_metric="camera_z")
    return v1, v2


def write_dataset(path: str, n_scenes: int, seed: int = 0,
                  height: int = 192, width: int = 256,
                  verbose: bool = False,
                  max_rotation: float = 0.08,
                  baseline_range: Tuple[float, float] = (0.05, 0.25)) -> str:
    """Write an h5 source of `n_scenes` synthetic scenes (pair (v0, v1)
    each). Idempotent: returns immediately if the file exists.

    baseline_range controls the translation-direction conditioning: after
    the reader's ||t||=1 normalization the baseline/depth ratio is the
    parallax per unit translation, so larger baselines make translation
    direction better observable (the classic two-view degeneracy as
    baseline -> 0)."""
    import h5py

    from ..data.view_io import write_view

    if os.path.isfile(path):
        return path
    rng = np.random.RandomState(seed)
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        for s in range(n_scenes):
            v1, v2 = make_scene(rng, height, width,
                                max_rotation=max_rotation,
                                baseline_range=baseline_range)
            g = f"scene{s:05d}/frames/t0"
            write_view(f.require_group(f"{g}/v0"), v1)
            write_view(f.require_group(f"{g}/v1"), v2)
            f[g].attrs["viewpoint_pairs"] = np.array([0, 1], np.int32)
            if verbose and (s + 1) % 100 == 0:
                print(f"  {s + 1}/{n_scenes} scenes", flush=True)
    os.replace(tmp, path)
    return path
