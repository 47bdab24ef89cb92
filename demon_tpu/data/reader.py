"""MultiViH5DataReader — threaded multi-view HDF5 batch pipeline.

Behavioral re-implementation of the reference C++ TF op
(multivih5datareaderop/multivih5datareader.{h,cpp}): a single IO thread
walks the h5 sources and hands raw scenes to N builder threads, which
decode (WebP / LZ4-fp16), resize, normalize intrinsics, convert ray-length
depth to camera-z, maintain a scene pool with pair-combination exhaustion,
apply geometric + photometric augmentation with consistent camera fixups,
encode pair motion, render ground-truth flow and depth-visibility masks,
and emit NHWC numpy batches through a bounded queue.

Differences from the reference (on purpose):
* NHWC output (TPU layout) instead of NCHW.
* Thread RNGs are seeded deterministically from a user seed instead of the
  wall clock (reference hazard noted at multivih5datareader.cpp:1296-1299).
* h5py + vectorized numpy instead of SimpleH5File + per-pixel C++ loops;
  an optional C++ decode path lives in demon_tpu/data/_native.

Deterministic test phase contract preserved (multivih5datareader.cpp:
1286-1288, 2026-2054): exactly one source, sorted groups, first pair only,
single builder thread, and a hard error unless num_samples % batch_size == 0
so every sample is seen exactly once in `test_iterations` batches.
"""

from __future__ import annotations

import dataclasses
import json
import queue
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import _native as native
from . import host_geometry as hg
from .lz4 import lz4_uncompress
from .webp import webp_decode

MAX_PRELOADED_BATCHES = 4  # reference multivih5datareader.cpp:39
MAX_VIEWPOINTS = 6         # reference multivih5datareader.cpp:843

_malloc_tuned = False


def _tune_malloc():
    """Keep glibc from mmap/munmap-cycling the per-batch tensor buffers.

    A 192x256 batch-32 IMAGE_PAIR buffer is ~38 MB; above glibc's default
    M_MMAP_THRESHOLD (128 KB) every np.empty maps fresh pages and every
    free returns them to the kernel, so each batch pays page faults +
    kernel zeroing (~12 ms measured, 3x the actual assembly work). Raising
    the mmap/trim thresholds makes malloc recycle the hot buffers. Process-
    global and glibc-specific; silently skipped elsewhere."""
    global _malloc_tuned
    if _malloc_tuned:
        return
    _malloc_tuned = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD, M_TRIM_THRESHOLD = -3, -1
        libc.mallopt(M_MMAP_THRESHOLD, 256 * 1024 * 1024)
        libc.mallopt(M_TRIM_THRESHOLD, 256 * 1024 * 1024)
    except Exception:
        pass

MOTION_FORMATS = ("ANGLEAXIS6", "ANGLEAXIS7", "QUATERNION", "FMATRIX")
ALL_OUTPUTS = ("IMAGE_PAIR", "MOTION", "FLOW", "DEPTH", "INTRINSICS",
               "DEPTHMASKS", "SAMPLE_IDS")


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SourceParams:
    """One h5 source (reference MultiViH5Params::Source).

    path: one or more h5 files joined with ';'.
    weight: keyframes [(iteration, value)] linearly interpolated
            (reference Source::weight, multivih5datareader.cpp:1030-1056).
    """

    path: str
    weight: Sequence[Tuple[int, float]] = ((0, 1.0),)
    aug: hg.PhotometricAugParams = dataclasses.field(
        default_factory=hg.PhotometricAugParams)

    @staticmethod
    def from_json(obj: dict) -> "SourceParams":
        known = {"path", "weight", "aug_hsv_hue", "aug_hsv_sat", "aug_hsv_val",
                 "aug_contrast", "aug_brightness", "aug_gamma"}
        unknown = set(obj) - known
        if unknown:
            raise ValueError(f"unknown source keys {sorted(unknown)}")
        w = obj.get("weight", [])
        if isinstance(w, (int, float)):
            # scalar weight shorthand (reference add_sources emits floats,
            # datareader/helpers.py:55)
            weight = [(0, float(w))]
        else:
            weight = [(int(kf["t"]), float(kf["v"])) for kf in w]
        if not weight:
            weight = [(0, 1.0)]
        aug = hg.PhotometricAugParams(
            hue=hg.RandomDist.from_json(obj.get("aug_hsv_hue")),
            sat=hg.RandomDist.from_json(obj.get("aug_hsv_sat")),
            val=hg.RandomDist.from_json(obj.get("aug_hsv_val")),
            contrast=hg.RandomDist.from_json(obj.get("aug_contrast")),
            brightness=hg.RandomDist.from_json(obj.get("aug_brightness")),
            gamma=hg.RandomDist.from_json(obj.get("aug_gamma")),
        )
        return SourceParams(path=obj["path"], weight=weight, aug=aug)

    def interpolated_weight(self, iteration: int) -> float:
        kfs = sorted(self.weight)
        if iteration <= kfs[0][0]:
            return kfs[0][1]
        for (t1, v1), (t2, v2) in zip(kfs[:-1], kfs[1:]):
            if iteration < t2:
                a = (iteration - t1) / float(t2 - t1)
                return (1 - a) * v1 + a * v2
        return kfs[-1][1]


@dataclasses.dataclass
class ReaderParams:
    """Reader configuration (reference MultiViH5Params,
    multivih5datareader.h:91-170; defaults at :109-132). Strictly
    validated: unknown keys raise (reference returns -1, :593-597)."""

    source: List[SourceParams] = dataclasses.field(default_factory=list)
    batch_size: int = 32
    test_phase: bool = False
    builder_threads: int = 4
    inverse_depth: bool = False
    motion_format: str = "ANGLEAXIS6"
    norm_trans_scale_depth: bool = False
    scaled_height: Optional[int] = None
    scaled_width: Optional[int] = None
    scene_pool_size: int = 64
    top_output: Sequence[str] = ("IMAGE_PAIR", "MOTION", "DEPTH", "INTRINSICS")
    augment_rot180: float = 0.0
    augment_mirror_x: float = 0.0
    image_range_min: float = -0.5
    image_range_max: float = 0.5
    convert_to_gray_values: bool = False
    depth_pair: bool = False
    min_depth: float = -1.0
    max_depth: float = -1.0
    depthmask_border1: int = 3
    depthmask_border2: int = 5
    seed: int = 0
    # multi-host input sharding: this reader serves shard `host_id` of
    # `num_hosts`, taking every num_hosts-th sample group. The reference
    # has one reader per (single-GPU) process; on a TPU pod each host runs
    # its own reader over a disjoint shard.
    host_id: int = 0
    num_hosts: int = 1
    # deterministic-test sharding rule: False = the training stride rule
    # (every num_hosts-th group per file); True = contiguous blocks of
    # `batch_size` groups over the GLOBAL sorted group sequence, so shard
    # s owns exactly the batches with index ≡ s (mod num_hosts) of the
    # unsharded single-reader batch stream. This is what lets W parallel
    # test readers reproduce the reference's exact one-pass coverage
    # (multivih5datareader.cpp:2026-2054) when their outputs are
    # interleaved round-robin (MultiProcessReader test phase).
    shard_batch_blocks: bool = False
    # pre-decoded scene cache (data/cache.py): when set, sources that have
    # been cached with build_scene_cache are served from memmapped raw
    # arrays, skipping WebP/LZ4 decode entirely
    cache_dir: Optional[str] = None

    @staticmethod
    def from_json(param_json) -> "ReaderParams":
        obj = json.loads(param_json) if isinstance(param_json, str) else dict(param_json)
        fields = {f.name for f in dataclasses.fields(ReaderParams)}
        unknown = set(obj) - fields
        if unknown:
            raise ValueError(f"unknown reader params {sorted(unknown)}")
        sources = [
            s if isinstance(s, SourceParams) else SourceParams.from_json(s)
            for s in obj.pop("source", [])
        ]
        p = ReaderParams(source=sources, **obj)
        p.validate()
        return p

    def validate(self):
        if not self.source:
            raise ValueError("at least one source required")
        if self.motion_format not in MOTION_FORMATS:
            raise ValueError(f"bad motion_format {self.motion_format!r}")
        bad = set(self.top_output) - set(ALL_OUTPUTS)
        if bad:
            raise ValueError(f"unknown top_output {sorted(bad)}")
        if self.test_phase and len(self.source) != 1:
            raise ValueError("test_phase requires exactly one source "
                             "(reference multivih5datareaderop README:114)")
        if not (0 <= self.host_id < self.num_hosts):
            raise ValueError(f"host_id {self.host_id} out of range for "
                             f"{self.num_hosts} hosts")
        if self.shard_batch_blocks and not self.test_phase:
            raise ValueError("shard_batch_blocks is a deterministic-test "
                             "sharding rule; training uses the stride rule")


# ---------------------------------------------------------------------------
# scene structures
# ---------------------------------------------------------------------------

class _Camera:
    __slots__ = ("K", "R", "t", "width", "height", "image", "image_u8",
                 "depth", "depth_metric", "image_bytes", "depth_bytes")

    def __init__(self):
        self.K = None          # normalized 3x3 after prepare
        self.R = None
        self.t = None
        self.width = 0
        self.height = 0
        self.image = None      # float32 [H,W,3] in [range_min, range_max]
        self.image_u8 = None   # uint8 [H,W,3] (cache path; assembled in C)
        self.depth = None      # float32 [H,W] camera_z
        self.depth_metric = "camera_z"
        self.image_bytes = None
        self.depth_bytes = None


class _Scene:
    __slots__ = ("scene_id", "source_id", "cameras", "combinations",
                 "prepared", "file_idx")

    def __init__(self, scene_id: str, source_id: int):
        self.scene_id = scene_id
        self.source_id = source_id
        self.cameras: List[List[_Camera]] = []
        self.combinations: List[Tuple[int, int]] = []
        self.prepared = False  # True when served pre-decoded from cache
        self.file_idx = 0      # index of the h5 file within its source


def _nearest_resize(a: np.ndarray, h: int, w: int) -> np.ndarray:
    """cv2 INTER_NEAREST semantics: src index = floor(dst * scale).
    Keep in sync with view_tools._nearest_resize2d /
    harness._nearest_resize / ops resize_nearest."""
    H, W = a.shape[:2]
    ys = np.minimum((np.arange(h) * (H / h)).astype(np.int64), H - 1)
    xs = np.minimum((np.arange(w) * (W / w)).astype(np.int64), W - 1)
    return a[ys][:, xs]


def _area_resize_uint8(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """cv2 INTER_AREA-like box resize via PIL (C speed)."""
    from PIL import Image

    if img.shape[0] == h and img.shape[1] == w:
        return img
    return np.asarray(Image.fromarray(img).resize((w, h), Image.BOX))


def _block_shard_count(total_before: int, n_groups: int, host_id: int,
                       num_hosts: int, block_size: int) -> int:
    """How many of this file's `n_groups` groups (global indices
    total_before..total_before+n_groups) fall in shard `host_id` under
    the batch-block rule (g // block_size) % num_hosts == host_id."""
    return sum(
        1 for g in range(total_before, total_before + n_groups)
        if (g // block_size) % num_hosts == host_id)


def count_sample_groups(h5_paths: Sequence[str], host_id: int = 0,
                        num_hosts: int = 1, block_size: int = 0) -> int:
    """Number of non-reserved root groups over all files — for this
    host's shard when num_hosts > 1 (reference countSampleGroups,
    multivih5datareader.cpp:1070-1081). block_size > 0 selects by the
    batch-block rule over the global group sequence instead of the
    per-file stride rule (ReaderParams.shard_batch_blocks)."""
    import h5py

    n = total = 0
    for path in h5_paths:
        with h5py.File(path, "r") as f:
            groups = sorted(k for k in f.keys() if not k.startswith("."))
        if num_hosts <= 1:
            n += len(groups)
        elif block_size > 0:
            n += _block_shard_count(total, len(groups), host_id,
                                    num_hosts, block_size)
        else:
            n += len(groups[host_id::num_hosts])
        total += len(groups)
    return n


# ---------------------------------------------------------------------------
# the scene producer (reference DataReader thread + Source)
# ---------------------------------------------------------------------------

class _SceneProducer(threading.Thread):
    """Single IO thread: walks sources, loads raw scene bytes from h5,
    pushes unprepared scenes into a bounded queue
    (reference DataReader::run, multivih5datareader.cpp:1083-1230)."""

    def __init__(self, params: ReaderParams, out_queue: "queue.Queue",
                 need_images: bool, need_depth: bool):
        super().__init__(daemon=True, name="demon-scene-producer")
        self.params = params
        self.out = out_queue
        self.need_images = need_images
        self.need_depth = need_depth
        self.rng = np.random.RandomState(params.seed ^ 0x5EED)
        self.quit = threading.Event()
        self.error: Optional[BaseException] = None
        self.iteration = 0
        # build_scene_cache sets this: keep viewpoint_pairs in attribute
        # order so the cache stores a deterministic pair list (the reader
        # re-shuffles per visit when serving; test phase takes pairs[:1])
        self.deterministic_pairs = False
        # per-source iteration state
        self._h5_paths = [s.path.split(";") for s in params.source]
        self._caches = [self._open_cache(s) for s in params.source]
        self._group_iters = [self._group_iter(i) for i in range(len(params.source))]
        self._cache_iters = [
            self._cache_iter(i) if self._caches[i] is not None else None
            for i in range(len(params.source))
        ]

    def _open_cache(self, src):
        if self.params.cache_dir is None:
            return None
        import os

        from .cache import SceneCache, cache_key

        key = cache_key(src.path, self.params.scaled_height,
                        self.params.scaled_width, False)
        subdir = os.path.join(self.params.cache_dir, key)
        if not os.path.isfile(os.path.join(subdir, "index.json")):
            return None
        return SceneCache(subdir)

    def _cache_iter(self, src_idx: int):
        """Infinite iterator over cached scene entries; shuffled in train,
        sorted in test; sharded per host."""
        cache = self._caches[src_idx]
        p = self.params
        entries = sorted(cache.scenes,
                         key=lambda e: (e.get("file", 0), e["id"]))
        if p.num_hosts > 1:
            if p.shard_batch_blocks:
                # batch-block rule over the global sorted sequence — the
                # same selection _group_iter makes for deterministic test
                entries = [
                    e for i, e in enumerate(entries)
                    if (i // p.batch_size) % p.num_hosts == p.host_id]
            else:
                # shard per FILE with the same stable rule as _group_iter
                # / count_sample_groups, so cached and non-cached serving
                # agree on which host owns which sample
                byfile: Dict[int, list] = {}
                for e in entries:
                    byfile.setdefault(e.get("file", 0), []).append(e)
                entries = [e for fi in sorted(byfile)
                           for e in byfile[fi][p.host_id :: p.num_hosts]]
        while True:
            if not entries:
                # empty shard (block-sharded test worker with fewer
                # blocks than shards): idle instead of busy-spinning
                if self.quit.wait(0.2):
                    return
                continue
            order = list(entries)
            if not p.test_phase:
                self.rng.shuffle(order)
            for e in order:
                yield e

    def _group_iter(self, src_idx: int):
        """Infinite (file_idx, file, group) generator for one source;
        shuffled in train, sorted in test (reference Source::advance,
        multivih5datareader.cpp:803-838). Yields the per-OCCURRENCE file
        index (a ';'-joined source may repeat a path for deliberate
        oversampling — each occurrence is its own shard unit, matching
        count_sample_groups and the cached path)."""
        import h5py

        order = list(range(len(self._h5_paths[src_idx])))
        if not self.params.test_phase:
            self.rng.shuffle(order)
        p = self.params
        while True:
            yielded = False
            global_idx = 0  # over the source's concatenated group sequence
            for fi in order:
                path = self._h5_paths[src_idx][fi]
                with h5py.File(path, "r") as f:
                    groups = sorted(k for k in f.keys()
                                    if not k.startswith("."))
                    n_file = len(groups)
                    # stable per-host shard before any shuffling
                    if p.num_hosts > 1:
                        if p.shard_batch_blocks:
                            groups = [
                                g for i, g in enumerate(groups, global_idx)
                                if (i // p.batch_size) % p.num_hosts
                                == p.host_id]
                        else:
                            groups = groups[p.host_id :: p.num_hosts]
                    if not p.test_phase:
                        self.rng.shuffle(groups)
                    for g in groups:
                        yielded = True
                        yield fi, f, g
                global_idx += n_file
            if not yielded:
                # empty shard — idle instead of re-scanning files hot
                if self.quit.wait(0.2):
                    return

    def run(self):
        try:
            while not self.quit.is_set():
                src_idx = self._pick_source()
                scene = self._load_scene(src_idx)
                if scene is None:
                    continue
                while not self.quit.is_set():
                    try:
                        self.out.put(scene, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced by the reader main thread
            self.error = e

    def _pick_source(self) -> int:
        if len(self.params.source) == 1:
            return 0
        w = np.array([s.interpolated_weight(self.iteration)
                      for s in self.params.source], np.float64)
        total = w.sum()
        if total <= 0:
            # a curriculum gap where every source's keyframe weight is 0
            # would otherwise yield NaN probabilities and kill the
            # producer thread — fall back to uniform
            w = np.full(len(w), 1.0 / len(w))
        else:
            w = w / total
        return int(self.rng.choice(len(w), p=w))

    def _load_scene(self, src_idx: int) -> Optional[_Scene]:
        params = self.params
        if self._cache_iters[src_idx] is not None:
            entry = next(self._cache_iters[src_idx])
            self.iteration += 1
            scene = self._caches[src_idx].load(entry, params)
            # the cache stores the attribute-order pair list; apply the
            # same per-visit policy as the h5 path (reader test contract /
            # reference create_scene): first pair only in test phase,
            # fresh random order in train
            if params.test_phase:
                scene.combinations = scene.combinations[:1]
            else:
                self.rng.shuffle(scene.combinations)
            scene.source_id = src_idx
            scene.prepared = True
            return scene
        file_idx, f, group = next(self._group_iters[src_idx])
        self.iteration += 1
        scene = _Scene(group, src_idx)
        scene.file_idx = file_idx
        path = self._h5_paths[src_idx][file_idx]

        t0 = f[group]["frames"]["t0"]
        vp_names = sorted(t0.keys(), key=lambda s: int(s[1:]))
        if len(vp_names) < 2:
            raise RuntimeError(f"not enough viewpoints in {path}:{group}")

        # pair combinations (reference create_scene,
        # multivih5datareader.cpp:862-910)
        if "viewpoint_pairs" in t0.attrs:
            vp = np.asarray(t0.attrs["viewpoint_pairs"]).reshape(-1, 2)
            pairs = [tuple(map(int, p)) for p in vp]
            if params.test_phase:
                pairs = pairs[:1]
        elif params.test_phase:
            pairs = [(0, 1)]
        else:
            n = len(vp_names)
            pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
        if not params.test_phase and not self.deterministic_pairs:
            self.rng.shuffle(pairs)

        viewpoint_ids: List[int] = []
        combos: List[Tuple[int, int]] = []
        for a, b in pairs:
            new = int(a not in viewpoint_ids) + int(b not in viewpoint_ids)
            if len(viewpoint_ids) + new <= MAX_VIEWPOINTS:
                if a not in viewpoint_ids:
                    viewpoint_ids.append(a)
                if b not in viewpoint_ids:
                    viewpoint_ids.append(b)
                combos.append((a, b))
            if len(viewpoint_ids) >= MAX_VIEWPOINTS:
                break
        viewpoint_ids = sorted(viewpoint_ids)
        # combinations (and hence sample_ids) use the REMAPPED camera-vector
        # indices, not the original v<i> names — reference parity: the C++
        # reader remaps exactly the same way before building sample ids
        # (multivih5datareader.cpp:913-925, :1946)
        remap = {v: i for i, v in enumerate(viewpoint_ids)}
        scene.combinations = [(remap[a], remap[b]) for a, b in combos]

        for vid in viewpoint_ids:
            vgroup = t0[f"v{vid}"]
            sub_views = int(vgroup.attrs.get("sub_views", 1))
            camvec = []
            for sub in range(sub_views):
                cam = _Camera()
                if self.need_images:
                    ds = vgroup["image"] if sub_views == 1 else vgroup["image"][str(sub)]
                    if _attr(ds, "format") != "webp":
                        raise RuntimeError(f"bad image format in {group}/v{vid}")
                    cam.image_bytes = np.asarray(ds[...]).tobytes()
                if self.need_depth:
                    ds = vgroup["depth"] if sub_views == 1 else vgroup["depth"][str(sub)]
                    if _attr(ds, "format") != "lz4half":
                        raise RuntimeError(f"bad depth format in {group}/v{vid}")
                    cam.depth_metric = _attr(ds, "depth_metric")
                    if cam.depth_metric not in ("camera_z", "ray_length"):
                        raise RuntimeError(f"bad depth metric {cam.depth_metric}")
                    cam.depth_bytes = np.asarray(ds[...]).tobytes()
                    ext = ds.attrs["extents"]
                    cam.height, cam.width = int(ext[0]), int(ext[1])
                if not self.need_images and not self.need_depth:
                    # K normalization still needs the original image size;
                    # read the depth extents attr (no payload decode)
                    ds = vgroup["depth"] if sub_views == 1 \
                        else vgroup["depth"][str(sub)]
                    ext = ds.attrs["extents"]
                    cam.height, cam.width = int(ext[0]), int(ext[1])
                cds = vgroup["camera"] if sub_views == 1 else vgroup["camera"][str(sub)]
                if _attr(cds, "format") != "pinhole":
                    raise RuntimeError(f"bad camera format in {group}/v{vid}")
                p = np.asarray(cds[...], np.float64)
                K = np.array([[p[0], p[2], p[3]], [0, p[1], p[4]], [0, 0, 1]])
                cam.K = K
                cam.R = p[5:14].reshape(3, 3).T
                cam.t = p[14:17]
                camvec.append(cam)
            scene.cameras.append(camvec)
        return scene


def _attr(ds, name) -> str:
    v = ds.attrs[name]
    if isinstance(v, bytes):
        return v.decode()
    if isinstance(v, np.ndarray):
        v = v.item()
        return v.decode() if isinstance(v, bytes) else str(v)
    return str(v)


# ---------------------------------------------------------------------------
# the batch builder (reference BatchBuilder)
# ---------------------------------------------------------------------------

class _BatchBuilder(threading.Thread):
    def __init__(self, reader: "MultiViH5DataReader", thread_idx: int):
        super().__init__(daemon=True, name=f"demon-batch-builder-{thread_idx}")
        self.r = reader
        self.rng = np.random.RandomState(reader.params.seed + 7919 * thread_idx)
        self.scene_idx = -1
        self.error: Optional[BaseException] = None

    # -- scene preparation (decode/resize/normalize), reference
    # BatchBuilder::prepareScene, multivih5datareader.cpp:1384-1520
    def _prepare_scene(self, scene: _Scene):
        p = self.r.params
        use_native = native.available()
        for camvec in scene.cameras:
            for cam in camvec:
                if cam.image_bytes is not None:
                    img = (native.webp_decode_rgb(cam.image_bytes)
                           if use_native else webp_decode(cam.image_bytes))
                    cam.height, cam.width = img.shape[:2]
                    cam.image_bytes = None
                else:
                    img = None
                # normalize intrinsics by the ORIGINAL image size
                K = cam.K.copy()
                K[0, 0] /= cam.width
                K[1, 1] /= cam.height
                K[0, 2] /= cam.width
                K[1, 2] /= cam.height
                cam.K = K
                sw = p.scaled_width or cam.width
                sh = p.scaled_height or cam.height
                if img is not None:
                    if use_native and (sh, sw) != img.shape[:2]:
                        img = native.resize_area_rgb8(img, sh, sw)
                    else:
                        img = _area_resize_uint8(img, sh, sw)
                    rng = p.image_range_max - p.image_range_min
                    imgf = img.astype(np.float32) * (rng / 255.0) + p.image_range_min
                    if p.convert_to_gray_values:
                        # reference's BGR gray weights 5/32, 16/32, 11/32
                        # (convertBGRToFloatGray, multivih5datareader.cpp:
                        # 317-339); in RGB order: r*11/32 + g*16/32 + b*5/32
                        imgf = (imgf[..., 0:1] * (11 / 32)
                                + imgf[..., 1:2] * (16 / 32)
                                + imgf[..., 2:3] * (5 / 32))
                    cam.image = imgf
                if cam.depth_bytes is not None:
                    count = cam.height * cam.width
                    if use_native:
                        d = native.lz4half_to_float(cam.depth_bytes, count)
                        d = d.reshape(cam.height, cam.width)
                    else:
                        raw = lz4_uncompress(cam.depth_bytes, count * 2)
                        d = np.frombuffer(raw, np.float16).astype(np.float32)
                        d = d.reshape(cam.height, cam.width)
                    cam.depth_bytes = None
                    if (sh, sw) != (cam.height, cam.width):
                        d = (native.resize_nearest_f32(d, sh, sw)
                             if use_native else _nearest_resize(d, sh, sw))
                    if cam.depth_metric == "ray_length":
                        if use_native:
                            d = native.ray_length_to_z(d, cam.K)
                        else:
                            d = hg.ray_length_to_camera_z(
                                d, hg._pixel_K(cam.K, sw, sh))
                        cam.depth_metric = "camera_z"
                    cam.depth = d
                cam.width, cam.height = sw, sh

    # -- batch assembly, reference BatchBuilder::run,
    # multivih5datareader.cpp:1522-1973
    def run(self):
        try:
            self._run()
        except BaseException as e:
            self.error = e

    def _run(self):
        r = self.r
        p = r.params
        prepared_scene: Optional[_Scene] = None

        while not r.quit.is_set():
            if prepared_scene is None:
                prepared_scene = self._next_prepared_scene()
                if prepared_scene is None:
                    return

            # --- selection phase: cheap python (pool pick, motion encode,
            # degenerate-pair rejection); heavy tensors come later ---------
            metas: List[Dict] = []
            while len(metas) < p.batch_size and not r.quit.is_set():
                if prepared_scene is None:
                    prepared_scene = self._next_prepared_scene()
                    if prepared_scene is None:
                        return
                with r.pool_lock:
                    if p.test_phase:
                        self.scene_idx = (self.scene_idx + 1) % len(r.pool)
                    else:
                        self.scene_idx = self.rng.randint(len(r.pool))
                    scene, used = r.pool[self.scene_idx]
                    pair = scene.combinations[used]
                    used += 1
                    if used == len(scene.combinations):
                        r.pool[self.scene_idx] = (prepared_scene, 0)
                        prepared_scene = None
                    else:
                        r.pool[self.scene_idx] = (scene, used)

                batch_idx = len(metas)
                if not p.test_phase:
                    rotate180 = self.rng.rand() < p.augment_rot180
                    mirror_x = self.rng.rand() < p.augment_mirror_x
                else:
                    rotate180 = batch_idx < p.augment_rot180 * p.batch_size
                    mirror_x = batch_idx < p.augment_mirror_x * p.batch_size

                camvec1 = scene.cameras[pair[0]]
                camvec2 = scene.cameras[pair[1]]
                for cam1, cam2 in zip(camvec1, camvec2):
                    if len(metas) >= p.batch_size:
                        break
                    meta = self._item_meta(scene, pair, cam1, cam2,
                                           rotate180, mirror_x)
                    if meta is None:
                        continue  # degenerate pair skipped
                    metas.append(meta)

            if r.quit.is_set():
                return
            batch = self._assemble_batch(metas)
            while not r.quit.is_set():
                try:
                    r.batch_queue.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    # -- whole-batch tensor assembly: ONE GIL-released native call fills
    # every item's IMAGE_PAIR + DEPTH with an OpenMP team (native
    # demon_build_batch); python handles the leftovers (photometric aug,
    # gray, depth_pair, FLOW, DEPTHMASKS). Batch granularity is the
    # difference between builder threads convoying on the GIL (~0.3 ms C
    # sections) and scaling with host cores.
    def _assemble_batch(self, metas: List[Dict]) -> Dict[str, np.ndarray]:
        p = self.r.params
        n = len(metas)
        out: Dict[str, np.ndarray] = {}
        if "MOTION" in p.top_output:
            out["MOTION"] = np.stack([m["MOTION"] for m in metas])
        if "INTRINSICS" in p.top_output:
            out["INTRINSICS"] = np.stack([m["INTRINSICS"] for m in metas])

        cam0 = metas[0]["cam1"]
        h, w = cam0.height, cam0.width
        img_buf = dep_buf = None
        if "IMAGE_PAIR" in p.top_output:
            ch = 2 if p.convert_to_gray_values else 6
            img_buf = np.empty((n, h, w, ch), np.float32)
        if "DEPTH" in p.top_output:
            dch = 2 if p.depth_pair else 1
            dep_buf = np.empty((n, h, w, dch), np.float32)

        span = p.image_range_max - p.image_range_min
        use_native = native.available()
        img_native = img_buf is not None and use_native \
            and not p.convert_to_gray_values
        dep_native = dep_buf is not None and use_native and not p.depth_pair
        img_filled = [False] * n
        dep_filled = [False] * n
        if img_native or dep_native:
            img1s = [m["cam1"].image_u8 if img_native else None
                     for m in metas]
            img2s = [m["cam2"].image_u8 if img_native else None
                     for m in metas]
            deps = [m["cam1"].depth if dep_native else None for m in metas]
            ok = native.build_batch(
                img1s, img2s, deps, h, w, p.image_range_min, span,
                np.array([m["depth_scale"] for m in metas], np.float32),
                p.inverse_depth, p.min_depth, p.max_depth,
                np.array([m["rot180"] for m in metas], np.uint8),
                np.array([m["mirror_x"] for m in metas], np.uint8),
                img_buf if img_native else None,
                dep_buf if dep_native else None)
            if ok:
                img_filled = [a is not None and b is not None
                              for a, b in zip(img1s, img2s)]
                dep_filled = [d is not None for d in deps]

        flows = []
        masks = []
        for i, m in enumerate(metas):
            self._item_tensors(
                m,
                img_slot=None if img_buf is None else img_buf[i],
                dep_slot=None if dep_buf is None else dep_buf[i],
                img_filled=img_filled[i], dep_filled=dep_filled[i],
                flows=flows, masks=masks)
        if img_buf is not None:
            out["IMAGE_PAIR"] = img_buf
        if dep_buf is not None:
            out["DEPTH"] = dep_buf
        if flows:
            out["FLOW"] = np.stack(flows)
        if masks:
            out["DEPTHMASKS"] = np.stack(masks)
        out["SAMPLE_IDS"] = [m["sample_id"] for m in metas]
        return out

    def _next_prepared_scene(self) -> Optional[_Scene]:
        while not self.r.quit.is_set():
            try:
                scene = self.r.scene_queue.get(timeout=0.1)
            except queue.Empty:
                continue
            if not scene.prepared:
                self._prepare_scene(scene)
                scene.prepared = True
            return scene
        return None

    def _item_meta(self, scene, pair, cam1: _Camera, cam2: _Camera,
                   rotate180: bool, mirror_x: bool) -> Optional[Dict]:
        """Selection-time item state: pair motion (with augmentation
        fixups, reference :1652-1786), intrinsics (:1784-1815), flags.
        Returns None for degenerate pairs."""
        p = self.r.params
        meta: Dict = {"cam1": cam1, "cam2": cam2, "rot180": rotate180,
                      "mirror_x": mirror_x, "scene": scene,
                      "sample_id":
                          f"{scene.scene_id}/frames/t0/v{pair[0]},v{pair[1]}"}

        R1, t1 = cam1.R.copy(), cam1.t.copy()
        R2, t2 = cam2.R.copy(), cam2.t.copy()
        if rotate180:
            R1, t1 = hg.rotate_camera_180_around_z(R1, t1)
            R2, t2 = hg.rotate_camera_180_around_z(R2, t2)
        R12 = R2 @ R1.T
        t12 = t2 - R12 @ t1
        if mirror_x:
            C2 = -R12.T @ t12
            C2[0] = -C2[0]
            R12 = R12.copy()
            R12[:, 0] *= -1
            R12[0, :] *= -1
            t12 = -R12 @ C2
        tnorm = np.linalg.norm(t12)
        if tnorm < 1e-6:
            return None  # unpredictable pure-rotation pair, skip
        depth_scale_factor = 1.0
        if p.norm_trans_scale_depth:
            depth_scale_factor = 1.0 / tnorm
            t12 = t12 / tnorm
        meta["depth_scale"] = depth_scale_factor

        if "MOTION" in p.top_output:
            meta["MOTION"] = _encode_motion(
                p.motion_format, R12, t12, R1, t1, R2, t2, cam1.K, cam2.K)
            if meta["MOTION"] is None:
                return None

        if "INTRINSICS" in p.top_output:
            fx, fy = cam1.K[0, 0], cam1.K[1, 1]
            cx, cy = cam1.K[0, 2], cam1.K[1, 2]
            if rotate180:
                cx, cy = 1 - cx, 1 - cy
            if mirror_x:
                cx = 1 - cx
            meta["INTRINSICS"] = np.array([fx, fy, cx, cy], np.float32)
        return meta

    def _item_tensors(self, meta: Dict, img_slot, dep_slot,
                      img_filled: bool, dep_filled: bool,
                      flows: List, masks: List) -> None:
        """Per-item tensor work the batch-native call didn't cover:
        python image/depth fallbacks, photometric augmentation, FLOW
        (reference :1817-1843), DEPTHMASKS (:1908-1941)."""
        p = self.r.params
        cam1, cam2 = meta["cam1"], meta["cam2"]
        rotate180, mirror_x = meta["rot180"], meta["mirror_x"]
        depth_scale_factor = meta["depth_scale"]

        if img_slot is not None:
            span = p.image_range_max - p.image_range_min
            if not img_filled:
                if cam1.image_u8 is not None and native.available():
                    native.assemble_image_pair(
                        cam1.image_u8, cam2.image_u8, p.image_range_min,
                        span, rotate180, mirror_x, out=img_slot)
                else:
                    im1, im2 = cam1.image, cam2.image
                    if im1 is None:  # cached u8 without native library
                        im1 = cam1.image_u8.astype(np.float32) \
                            * (span / 255.0) + p.image_range_min
                        im2 = cam2.image_u8.astype(np.float32) \
                            * (span / 255.0) + p.image_range_min
                    img = np.concatenate([im1, im2], axis=-1)
                    if rotate180:
                        img = img[::-1, ::-1]
                    if mirror_x:
                        img = img[:, ::-1]
                    img_slot[...] = img
            src = p.source[meta["scene"].source_id]
            # photometric augmentation is color-only (reference
            # augmentImage asserts 6 channels, multivih5datareader.cpp:646).
            # Like the reference (:1642-1647) it applies whenever the source
            # configures aug params — including test phase, where the single
            # seeded builder thread keeps it deterministic; test configs
            # simply don't set aug params.
            if src.aug.any() and img_slot.shape[-1] == 6:
                img_slot[...] = hg.augment_image_pair(
                    np.ascontiguousarray(img_slot), src.aug, self.rng)

        # ---- flow (pixel units) with sign fixups, reference :1817-1843 ----
        if "FLOW" in p.top_output:
            flow = native.compute_flow(cam1.depth, cam1.K, cam1.R, cam1.t,
                                       cam2.K, cam2.R, cam2.t) \
                if native.available() else \
                hg.compute_flow(cam1.depth, cam1.K, cam1.R, cam1.t,
                                cam2.K, cam2.R, cam2.t)
            if rotate180:
                flow = -flow[::-1, ::-1]
            if mirror_x:
                flow = flow[:, ::-1].copy()
                flow[..., 0] = -flow[..., 0]
            flows.append(np.ascontiguousarray(flow))

        # ---- depth with NaN rules, reference :1845-1906 ----
        if dep_slot is not None and not dep_filled:
            ds = [cam1.depth] + ([cam2.depth] if p.depth_pair else [])
            chans = []
            for d in ds:
                if native.available():
                    d = native.prepare_depth(
                        d, depth_scale_factor, p.inverse_depth,
                        p.min_depth, p.max_depth, rotate180, mirror_x)
                else:
                    d = d.copy()
                    invalid = (d == 0) | ~np.isfinite(d)
                    if p.max_depth > 0:
                        invalid |= d > p.max_depth
                    if p.min_depth > 0:
                        invalid |= d < p.min_depth
                    d *= depth_scale_factor
                    if p.inverse_depth:
                        with np.errstate(divide="ignore"):
                            d = 1.0 / d
                    d[invalid] = np.nan
                    if rotate180:
                        d = d[::-1, ::-1]
                    if mirror_x:
                        d = d[:, ::-1]
                chans.append(d)
            dep_slot[...] = np.stack(chans, axis=-1)

        # ---- depth-visibility masks, reference :1908-1941 ----
        if "DEPTHMASKS" in p.top_output:
            b1, b2 = p.depthmask_border1, p.depthmask_border2

            def _mask(ca, cb):
                if native.available():
                    return native.compute_depthmask(
                        ca.depth, ca.K, ca.R, ca.t, cb.K, cb.R, cb.t, b1, b2)
                return hg.compute_depthmask(
                    ca.depth, ca.K, ca.R, ca.t, cb.K, cb.R, cb.t, b1, b2)

            m = [_mask(cam1, cam2)]
            if p.depth_pair:
                m.append(_mask(cam2, cam1))
            m = np.stack(m, axis=-1)
            if rotate180:
                m = m[::-1, ::-1]
            if mirror_x:
                m = m[:, ::-1]
            masks.append(np.ascontiguousarray(m))


def _encode_motion(fmt, R12, t12, R1, t1, R2, t2, K1, K2):
    """The four motion encodings (reference multivih5datareader.cpp:
    1689-1780). Translation always occupies the last 3 elements (except
    FMATRIX)."""
    if fmt == "ANGLEAXIS6":
        aa = hg.rotation_matrix_to_angleaxis(R12)
        return np.concatenate([aa, t12]).astype(np.float32)
    if fmt == "ANGLEAXIS7":
        aa = hg.rotation_matrix_to_angleaxis(R12)
        mag = np.linalg.norm(aa)
        axis = np.zeros(3) if mag < 1e-6 else aa / mag
        return np.concatenate([[mag], axis, t12]).astype(np.float32)
    if fmt == "QUATERNION":
        q = hg.rotation_matrix_to_quaternion(R12)
        return np.concatenate([q, t12]).astype(np.float32)
    if fmt == "FMATRIX":
        P1 = K1 @ np.hstack([R1, t1.reshape(3, 1)])
        P2 = K2 @ np.hstack([R2, t2.reshape(3, 1)])
        F = hg.compute_fundamental_from_cameras(P1, P2)
        if abs(F[2, 2]) < 1e-6:
            return None  # reference skips the batch item
        Fn = (F / F[2, 2]).T.reshape(-1)[:8]  # column-major, drop last
        return Fn.astype(np.float32)
    raise ValueError(fmt)


# ---------------------------------------------------------------------------
# the reader facade
# ---------------------------------------------------------------------------

class MultiViH5DataReader:
    """Threaded batch reader over multi-view h5 files.

    Usage::

        reader = MultiViH5DataReader(params_dict_or_json)
        info = reader.info          # [test_iters, bq_cur, bq_max, sq_cur, sq_max]
        batch = reader.get_batch()  # dict of NHWC numpy arrays + SAMPLE_IDS
        reader.close()

    Iterating yields batches; in test phase iteration stops after exactly
    `test_iterations` batches (one pass over every sample).
    """

    def __init__(self, params):
        _tune_malloc()
        self.params = params if isinstance(params, ReaderParams) \
            else ReaderParams.from_json(params)
        p = self.params
        p.validate()

        self.test_iterations = -1
        if p.test_phase:
            paths = p.source[0].path.split(";")
            n = count_sample_groups(
                paths, p.host_id, p.num_hosts,
                block_size=p.batch_size if p.shard_batch_blocks else 0)
            if n % p.batch_size != 0:
                raise ValueError(
                    f"test phase requires num_samples % batch_size == 0, "
                    f"got {n} % {p.batch_size} != 0 (reference "
                    f"multivih5datareader.cpp:2039-2052)")
            self.test_iterations = n // p.batch_size

        need_images = bool({"IMAGE_PAIR", "INTRINSICS"} & set(p.top_output))
        need_depth = bool({"DEPTH", "FLOW", "DEPTHMASKS"} & set(p.top_output))

        self.quit = threading.Event()
        self.scene_queue: "queue.Queue" = queue.Queue(maxsize=max(p.batch_size, 2))
        self.batch_queue: "queue.Queue" = queue.Queue(maxsize=MAX_PRELOADED_BATCHES)
        self.pool: List[Tuple[_Scene, int]] = []
        self.pool_lock = threading.Lock()

        self.producer = _SceneProducer(p, self.scene_queue, need_images, need_depth)
        self.producer.start()

        # fill the scene pool before starting builders (reference
        # PrivateData::init, multivih5datareader.cpp:1258-1268)
        n_threads = 1 if p.test_phase else max(1, p.builder_threads)
        # an empty test shard (block-sharded reader with fewer batch
        # blocks than shards) must not block waiting for scenes
        pool_size = p.scene_pool_size if not p.test_phase else min(
            p.scene_pool_size, self.test_iterations * p.batch_size)
        bootstrap_builder = _BatchBuilder(self, 0)
        while len(self.pool) < pool_size:
            self._raise_thread_errors()
            try:
                scene = self.scene_queue.get(timeout=0.5)
            except queue.Empty:
                continue
            if not scene.prepared:
                bootstrap_builder._prepare_scene(scene)
                scene.prepared = True
            self.pool.append((scene, 0))

        self.builders = [_BatchBuilder(self, i) for i in range(n_threads)]
        for b in self.builders:
            b.start()

    # ------------------------------------------------------------------
    @property
    def info(self) -> np.ndarray:
        """[test_iterations, batch buf cur/max, scene buf cur/max]
        (reference op 'info' output, multivih5datareaderop.cc:297-309)."""
        return np.array([
            self.test_iterations,
            self.batch_queue.qsize(), MAX_PRELOADED_BATCHES,
            self.scene_queue.qsize(), self.scene_queue.maxsize,
        ], np.float32)

    def _raise_thread_errors(self):
        if self.producer.error is not None:
            raise RuntimeError("scene producer failed") from self.producer.error
        for b in getattr(self, "builders", []):
            if b.error is not None:
                raise RuntimeError("batch builder failed") from b.error

    def get_batch(self, timeout: Optional[float] = None) -> Dict[str, np.ndarray]:
        import time

        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            self._raise_thread_errors()
            try:
                return self.batch_queue.get(timeout=0.2)
            except queue.Empty:
                if deadline is not None and time.monotonic() > deadline:
                    raise TimeoutError("no batch produced in time")

    def __iter__(self):
        n = 0
        while self.test_iterations < 0 or n < self.test_iterations:
            yield self.get_batch()
            n += 1

    def close(self):
        self.quit.set()
        self.producer.join(timeout=5)
        for b in getattr(self, "builders", []):
            b.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
