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
from typing import List, Optional, Tuple

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


# ---------------------------------------------------------------------------
# Layered ray-cast scenes
#
# The smooth-noise scenes above are occlusion-free by construction (image1
# is a warp of image2), which leaves depth discontinuities, occlusion
# boundaries and sharp texture — the cues real SfM data is full of —
# unrepresented. The layered generator renders BOTH views of a true 3D
# scene (textured planar patches over a background plane) by ray casting,
# so each view gets exact depth with hard discontinuities and genuinely
# occluded regions, and the textures carry strong high-frequency content
# (checkers/stripes) that conditions translation direction far better than
# smooth noise.
# ---------------------------------------------------------------------------


def _patch_texture(rng: np.random.RandomState, res: int = 160) -> np.ndarray:
    """Procedural [res,res,3] float texture in [0,1]: base color + smooth
    noise + randomly mixed checker/stripe layers (high-frequency content)."""
    base = rng.uniform(0.15, 0.85, size=3).astype(np.float32)
    tex = np.broadcast_to(base, (res, res, 3)).copy()
    tex += (_smooth_noise(rng, res, res, 3, base=5, octaves=3) - 0.5) \
        * rng.uniform(0.2, 0.5)
    u = (np.arange(res, dtype=np.float32) + 0.5) / res
    uu, vv = np.meshgrid(u, u)
    if rng.rand() < 0.75:  # checker
        f1, f2 = rng.randint(2, 13), rng.randint(2, 13)
        checker = ((np.floor(uu * f1) + np.floor(vv * f2)) % 2.0) - 0.5
        tex += checker[..., None] * rng.uniform(0.15, 0.45, size=3)
    if rng.rand() < 0.6:  # oriented stripes
        th = rng.uniform(0, np.pi)
        f = rng.uniform(3.0, 16.0)
        stripes = np.sin(2 * np.pi * f * (uu * np.cos(th) + vv * np.sin(th)))
        if rng.rand() < 0.5:
            stripes = np.sign(stripes)
        tex += (stripes * 0.5)[..., None] * rng.uniform(0.1, 0.35, size=3)
    return np.clip(tex, 0.0, 1.0)


def _sample_texture(tex: np.ndarray, u: np.ndarray, v: np.ndarray
                    ) -> np.ndarray:
    """Bilinear texture lookup; u, v in [0,1] arrays -> [..., 3]."""
    res = tex.shape[0]
    x = np.clip(u * res - 0.5, 0, res - 1)
    y = np.clip(v * res - 0.5, 0, res - 1)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, res - 2)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, res - 2)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    return (tex[y0, x0] * (1 - wx) * (1 - wy) + tex[y0, x0 + 1] * wx * (1 - wy)
            + tex[y0 + 1, x0] * (1 - wx) * wy + tex[y0 + 1, x0 + 1] * wx * wy)


def _make_patch(center: np.ndarray, normal: np.ndarray, size_u: float,
                size_v: float, rng: np.random.RandomState) -> dict:
    """Planar patch p(u,v) = p0 + u*eu + v*ev, u,v in [0,1]."""
    n = normal / (np.linalg.norm(normal) + 1e-12)
    # in-plane basis with a random roll
    a = np.array([1.0, 0.0, 0.0])
    if abs(n[0]) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    e1 = np.cross(n, a)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(n, e1)
    roll = rng.uniform(0, 2 * np.pi)
    eu = (np.cos(roll) * e1 + np.sin(roll) * e2) * size_u
    ev = (-np.sin(roll) * e1 + np.cos(roll) * e2) * size_v
    p0 = center - 0.5 * eu - 0.5 * ev
    return {"p0": p0, "eu": eu, "ev": ev, "n": np.cross(eu, ev),
            "tex": _patch_texture(rng)}


class _EmptyRender(Exception):
    """Raised by _raycast when every ray misses the scene."""


def _raycast(patches: List[dict], R: np.ndarray, t: np.ndarray,
             height: int, width: int, ss: int = 1, want_image: bool = True
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Render (image [H,W,3] float, depth [H,W] camera-z) of the patch list
    from a camera with x_cam = R @ x_world + t, at `ss`x supersampling
    (image is box-filtered back to [height,width]; depth is rendered at
    native resolution semantics when ss == 1)."""
    h, w = height * ss, width * ss
    xs = ((np.arange(w, dtype=np.float32) + 0.5) / w - _INTR[2]) / _INTR[0]
    ys = ((np.arange(h, dtype=np.float32) + 0.5) / h - _INTR[3]) / _INTR[1]
    C = (-R.T @ t).astype(np.float32)  # camera center in world
    Rf = R.astype(np.float32)
    best_z = np.full((h, w), np.inf, np.float32)
    img = np.zeros((h, w, 3), np.float32)
    # precompute world-frame ray components: d_w = R.T @ [dx, dy, 1]
    row_dir = ys[:, None] * Rf[1, :]                 # [h,3]
    col_dir = xs[:, None] * Rf[0, :] + Rf[2, :]      # [w,3]
    for p in patches:
        # projected-bbox cull: restrict to the patch's pixel footprint
        corners = np.stack([p["p0"], p["p0"] + p["eu"], p["p0"] + p["ev"],
                            p["p0"] + p["eu"] + p["ev"]])
        cc = corners @ R.T + t
        if (cc[:, 2] <= 0.05).all():
            continue
        if (cc[:, 2] > 0.05).all():
            px = (cc[:, 0] / cc[:, 2] * _INTR[0] + _INTR[2]) * w
            py = (cc[:, 1] / cc[:, 2] * _INTR[1] + _INTR[3]) * h
            x0 = max(0, int(np.floor(px.min())) - 1)
            x1 = min(w, int(np.ceil(px.max())) + 1)
            y0 = max(0, int(np.floor(py.min())) - 1)
            y1 = min(h, int(np.ceil(py.max())) + 1)
            if x0 >= x1 or y0 >= y1:
                continue
        else:  # straddles the image plane — no safe bbox
            x0, x1, y0, y1 = 0, w, 0, h
        d_w = row_dir[y0:y1, None, :] + col_dir[None, x0:x1, :]  # [bh,bw,3]
        n = p["n"].astype(np.float32)
        denom = d_w @ n
        denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        z = ((p["p0"].astype(np.float32) - C) @ n) / denom  # camera-z
        hit = C + z[..., None] * d_w - p["p0"].astype(np.float32)
        # solve [u,v] against the (eu, ev) Gram system
        g11 = p["eu"] @ p["eu"]
        g12 = p["eu"] @ p["ev"]
        g22 = p["ev"] @ p["ev"]
        inv_det = 1.0 / (g11 * g22 - g12 * g12)
        hu = hit @ p["eu"].astype(np.float32)
        hv = hit @ p["ev"].astype(np.float32)
        u = (g22 * hu - g12 * hv) * inv_det
        v = (g11 * hv - g12 * hu) * inv_det
        ok = (z > 0.05) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) \
            & (z < best_z[y0:y1, x0:x1])
        if not ok.any():
            continue
        if want_image:
            img[y0:y1, x0:x1][ok] = _sample_texture(p["tex"], u[ok], v[ok])
        best_z[y0:y1, x0:x1][ok] = z[ok]
    depth = best_z
    if ss > 1:
        img = img.reshape(height, ss, width, ss, 3).mean(axis=(1, 3))
        depth = depth[ss // 2::ss, ss // 2::ss]
    # rays that missed everything (numerical slivers): far background
    miss = ~np.isfinite(depth)
    if miss.all():
        # a camera that sees no geometry (possible with extreme
        # --max-rotation chains) — let the caller redraw the scene
        # instead of silently writing an all-NaN depth map
        raise _EmptyRender()
    if miss.any():
        depth = np.where(miss, depth[~miss].max(), depth)
    return img.astype(np.float32), depth.astype(np.float32)


def make_scene_layered(rng: np.random.RandomState, height: int = 192,
                       width: int = 256, n_views: int = 2,
                       max_rotation: float = 0.08,
                       baseline_range: Tuple[float, float] = (0.08, 0.45),
                       n_patches_range: Tuple[int, int] = (6, 14),
                       depth_range: Tuple[float, float] = (1.0, 3.5),
                       bg_depth_range: Tuple[float, float] = (4.0, 7.0),
                       supersample: int = 2) -> List[View]:
    """A true 3D layered scene rendered from a chain of `n_views` cameras.

    Foreground: textured planar patches at depths `depth_range` facing
    roughly toward camera 1; background: a large tilted textured plane at
    `bg_depth_range`. Consecutive cameras differ by a rotation of up to
    `max_rotation` rad and a baseline drawn from `baseline_range` — so
    both occlusion (patches sliding over the background) and translation
    direction (strong texture gradients at many depths) are represented.

    If an extreme motion chain points a camera entirely away from the
    scene (all rays miss), the whole scene is redrawn — every returned
    view has full depth coverage.
    """
    for _ in range(32):
        try:
            return _make_scene_layered_once(
                rng, height, width, n_views, max_rotation, baseline_range,
                n_patches_range, depth_range, bg_depth_range, supersample)
        except _EmptyRender:
            continue
    raise RuntimeError(
        "make_scene_layered: 32 consecutive empty renders — "
        "max_rotation/baseline_range leave cameras facing no geometry")


def _patch_field(rng: np.random.RandomState,
                 n_patches_range: Tuple[int, int],
                 depth_range: Tuple[float, float],
                 bg_depth_range: Tuple[float, float],
                 spread: float = 0.85) -> List[dict]:
    """Textured background plane + foreground patches; `spread` widens
    the patch-center footprint relative to the reference frustum."""
    z_bg = rng.uniform(*bg_depth_range)
    bg_n = np.array([rng.uniform(-0.25, 0.25), rng.uniform(-0.25, 0.25),
                     -1.0])
    patches = [_make_patch(np.array([0.0, 0.0, z_bg]), bg_n,
                           8.0 * z_bg, 8.0 * z_bg, rng)]
    for _ in range(rng.randint(*n_patches_range)):
        z = rng.uniform(*depth_range)
        half_x = 0.5 / _INTR[0] * z * spread
        half_y = 0.5 / _INTR[1] * z * spread
        c = np.array([rng.uniform(-half_x, half_x),
                      rng.uniform(-half_y, half_y), z])
        n = np.array([rng.uniform(-0.4, 0.4), rng.uniform(-0.4, 0.4), -1.0])
        size = rng.uniform(0.18, 0.55) * z
        patches.append(_make_patch(c, n, size,
                                   size * rng.uniform(0.6, 1.6), rng))
    return patches


def _make_scene_layered_once(rng, height, width, n_views, max_rotation,
                             baseline_range, n_patches_range, depth_range,
                             bg_depth_range, supersample) -> List[View]:
    # background plane + foreground patches in camera-1's frustum
    patches = _patch_field(rng, n_patches_range, depth_range,
                           bg_depth_range)

    # camera chain: view 0 at identity; each next view = small motion
    Rs, ts = [np.eye(3)], [np.zeros(3)]
    for _ in range(1, n_views):
        aa = rng.randn(3)
        aa = aa / (np.linalg.norm(aa) + 1e-12) \
            * rng.uniform(0.2, 1.0) * max_rotation
        R_step = hg.angleaxis_to_rotation_matrix(aa)
        t_step = rng.randn(3)
        t_step = t_step / np.linalg.norm(t_step) \
            * rng.uniform(*baseline_range)
        Rs.append(R_step @ Rs[-1])
        ts.append(R_step @ ts[-1] + t_step)

    K = np.array([[_INTR[0] * width, 0, _INTR[2] * width],
                  [0, _INTR[1] * height, _INTR[3] * height],
                  [0, 0, 1.0]])
    views = []
    for R, t in zip(Rs, ts):
        img, _ = _raycast(patches, R, t, height, width, ss=supersample)
        _, depth = _raycast(patches, R, t, height, width, ss=1,
                            want_image=False)
        views.append(View(
            R=R, t=t, K=K,
            image=np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8),
            depth=depth, depth_metric="camera_z"))
    return views


def _chain_pairs(n_views: int) -> np.ndarray:
    """Both directions of consecutive and skip-one pairs along the chain."""
    pairs = []
    for i in range(n_views - 1):
        pairs += [(i, i + 1), (i + 1, i)]
    for i in range(n_views - 2):
        pairs += [(i, i + 2), (i + 2, i)]
    return np.asarray(pairs, np.int32).reshape(-1)


def write_dataset(path: str, n_scenes: int, seed: int = 0,
                  height: int = 192, width: int = 256,
                  verbose: bool = False,
                  max_rotation: float = 0.08,
                  baseline_range: Tuple[float, float] = (0.05, 0.25),
                  style: str = "smooth", n_views: int = 2) -> str:
    """Write an h5 source of `n_scenes` synthetic scenes. Idempotent:
    returns immediately if the file exists.

    style="smooth": the original occlusion-free warped-noise pairs.
    style="layered": ray-cast 3D scenes (make_scene_layered) with true
    occlusion, hard depth discontinuities, high-frequency texture, and
    `n_views` cameras per scene (pairs via the viewpoint_pairs attr,
    multivih5datareaderop/README.md:219-224 semantics).

    baseline_range controls the translation-direction conditioning: after
    the reader's ||t||=1 normalization the baseline/depth ratio is the
    parallax per unit translation, so larger baselines make translation
    direction better observable (the classic two-view degeneracy as
    baseline -> 0)."""
    import h5py

    from ..data.view_io import write_view

    if os.path.isfile(path):
        return path
    if style not in ("smooth", "layered"):
        raise ValueError(f"unknown style {style!r}")
    rng = np.random.RandomState(seed)
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        for s in range(n_scenes):
            if style == "layered":
                views = make_scene_layered(
                    rng, height, width, n_views=n_views,
                    max_rotation=max_rotation,
                    baseline_range=baseline_range)
                pairs = _chain_pairs(len(views))
            else:
                views = make_scene(rng, height, width,
                                   max_rotation=max_rotation,
                                   baseline_range=baseline_range)
                pairs = np.array([0, 1], np.int32)
            g = f"scene{s:05d}/frames/t0"
            for i, v in enumerate(views):
                write_view(f.require_group(f"{g}/v{i}"), v)
            f[g].attrs["viewpoint_pairs"] = pairs
            if verbose and (s + 1) % 100 == 0:
                print(f"  {s + 1}/{n_scenes} scenes", flush=True)
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# Trajectory rendering (frames + ground-truth poses for examples/trajectory.py)
# ---------------------------------------------------------------------------


def _look_at(C: np.ndarray, target: np.ndarray) -> np.ndarray:
    """World-to-camera rotation for a camera at `C` looking at `target`
    (+z forward, +x right, +y down-ish; world up = +y)."""
    fwd = target - C
    fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
    right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
    nr = np.linalg.norm(right)
    if nr < 1e-6:  # looking straight along world up
        right = np.array([1.0, 0.0, 0.0])
    else:
        right = right / nr
    down = np.cross(fwd, right)
    return np.stack([right, down, fwd])  # rows; det = +1


def make_trajectory_views(rng: np.random.RandomState, n_frames: int = 40,
                          height: int = 192, width: int = 256,
                          baseline_range: Tuple[float, float] = (0.10, 0.22),
                          lateral_extent: float = 1.6,
                          rotation_jitter: float = 0.02,
                          n_patches_range: Tuple[int, int] = (10, 18),
                          depth_range: Tuple[float, float] = (1.2, 3.5),
                          bg_depth_range: Tuple[float, float] = (4.5, 7.0),
                          supersample: int = 2) -> List[View]:
    """A long smooth camera trajectory over one layered scene.

    Unlike make_scene_layered's free random walk (which would drift out
    of the patch field over tens of frames), the camera slides along a
    smoothed lateral path of per-step baselines drawn from
    `baseline_range`, always re-aimed at the scene center with a small
    rotation jitter — every frame sees geometry, consecutive frames have
    stereo baselines DeMoN can triangulate, and loop-scale drift is what
    the pose graph / BA downstream must correct."""
    patches = _patch_field(rng, n_patches_range, depth_range,
                           bg_depth_range, spread=1.3)
    z_mid = 0.5 * (depth_range[0] + depth_range[1])
    target = np.array([0.0, 0.0, z_mid])

    # smoothed random-walk directions -> positions with mean reversion
    steps = rng.randn(n_frames - 1, 3) * np.array([1.0, 0.6, 0.45])
    k = min(7, max(1, n_frames // 6)) if n_frames > 2 else 1
    kernel = np.ones(k) / k
    for c in range(3):
        steps[:, c] = np.convolve(steps[:, c], kernel, mode="same")
    C = np.zeros((n_frames, 3))
    for i in range(1, n_frames):
        d = steps[i - 1]
        d = d / (np.linalg.norm(d) + 1e-12) \
            * rng.uniform(*baseline_range)
        c_next = C[i - 1] + d
        # mean-revert so the path stays inside the patch field's view
        c_next[:2] = np.clip(c_next[:2], -lateral_extent, lateral_extent)
        c_next[2] = np.clip(c_next[2], -0.8, depth_range[0] * 0.45)
        C[i] = c_next

    views = []
    K = np.array([[_INTR[0] * width, 0, _INTR[2] * width],
                  [0, _INTR[1] * height, _INTR[3] * height],
                  [0, 0, 1.0]])
    for i in range(n_frames):
        R = _look_at(C[i], target)
        if rotation_jitter > 0:
            aa = rng.randn(3)
            aa = aa / (np.linalg.norm(aa) + 1e-12) \
                * rng.uniform(0, rotation_jitter)
            R = hg.angleaxis_to_rotation_matrix(aa) @ R
        t = -R @ C[i]
        img, _ = _raycast(patches, R, t, height, width, ss=supersample)
        _, depth = _raycast(patches, R, t, height, width, ss=1,
                            want_image=False)
        views.append(View(
            R=R, t=t, K=K,
            image=np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8),
            depth=depth, depth_metric="camera_z"))
    return views


def write_trajectory_frames(out_dir: str, n_frames: int = 40, seed: int = 0,
                            height: int = 192, width: int = 256,
                            **kwargs) -> str:
    """Render a synthetic trajectory into `out_dir`: frame_%04d.png plus
    poses.txt (Nx12 rows of world-to-camera [R|t], the --gt format of
    examples/trajectory.py). Idempotent; returns out_dir."""
    from PIL import Image

    poses_path = os.path.join(out_dir, "poses.txt")
    if os.path.isfile(poses_path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    views = make_trajectory_views(rng, n_frames, height, width, **kwargs)
    rows = []
    for i, v in enumerate(views):
        Image.fromarray(v.image).save(
            os.path.join(out_dir, f"frame_{i:04d}.png"))
        rows.append(np.hstack([v.R, v.t[:, None]]).reshape(12))
    np.savetxt(poses_path + ".tmp", np.asarray(rows))
    os.replace(poses_path + ".tmp", poses_path)
    return out_dir
