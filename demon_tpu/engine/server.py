"""Micro-batching inference server.

Production-serving layer over the fused pipeline: callers submit single
image pairs from any thread and receive futures; a dispatcher thread
coalesces pending requests into batches padded to the next power-of-two
bucket (capped at max_batch), so the device runs one of log2(max_batch)
compiled programs and partial batches under low load don't pay the full
max_batch compute. The reference has no serving story at all — inference is 5 manual
session.run calls per pair (examples/example.py:87-99).

Usage::

    server = DemonServer(engine, params, max_batch=16)
    fut = server.submit(image_pair, image2_2)          # [H, W, 6], [h, w, 3]
    depth, rotation, translation = fut.result()
    server.close()
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import NamedTuple, Optional

import numpy as np


class _Request(NamedTuple):
    image_pair: np.ndarray
    image2_2: np.ndarray
    intrinsics: Optional[np.ndarray]
    future: Future


class DemonServer:
    """Dynamic micro-batching dispatcher for a DemonEngine.

    max_batch: the largest compiled batch size; pending requests are
    coalesced up to it, then padded to the next power-of-two bucket
    (1, 2, 4, ..., max_batch). Each bucket compiles once on first use
    (call warmup() to pre-compile all buckets before serving traffic).
    max_wait_ms: how long the dispatcher waits to fill a batch before
    dispatching a partial one.

    mesh: optional jax.sharding.Mesh with a 'data' axis for multi-chip
    data-parallel serving — params are replicated across the mesh once
    at construction and every dispatched batch is sharded over 'data',
    so one server saturates a whole slice (the TPU-native scale-out of
    the reference's single-GPU session). Buckets start at the data-axis
    size (each chip needs >=1 row) and max_batch must be a multiple of
    it.
    """

    def __init__(self, engine, params, max_batch: int = 16,
                 max_wait_ms: float = 5.0, mesh=None):
        import jax.numpy as jnp

        from ..models import DEMON_INTRINSICS

        self.engine = engine
        self.mesh = mesh
        self._min_bucket = 1
        if mesh is not None:
            from .sharding import replicate_pytree

            dp = int(mesh.shape["data"])
            if max_batch % dp or max_batch < dp:
                raise ValueError(
                    f"max_batch {max_batch} must be a positive multiple of "
                    f"the mesh 'data' axis ({dp})")
            self._min_bucket = dp
            params = replicate_pytree(params, mesh)
        self.params = params
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._default_intr = np.asarray(DEMON_INTRINSICS, np.float32)
        self._shapes = None  # (image_pair.shape, image2_2.shape) once seen
        self._shapes_confirmed = False
        self._shape_lock = threading.Lock()
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._closed = threading.Event()
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True,
                                        name="demon-server-dispatch")
        self._thread.start()

    # ------------------------------------------------------------------
    def submit(self, image_pair: np.ndarray, image2_2: np.ndarray,
               intrinsics: Optional[np.ndarray] = None) -> Future:
        """Enqueue one pair ([H, W, 6], [h, w, 3] in [-0.5, 0.5]); the
        future resolves to (inverse_depth [H, W], rotation [3],
        translation [3]).

        Shapes are validated HERE (against the first accepted request) so
        a malformed submission fails only its own caller — never the
        well-formed requests it would otherwise be co-batched with."""
        if self._closed.is_set():
            raise RuntimeError("server closed")
        image_pair = np.asarray(image_pair, np.float32)
        image2_2 = np.asarray(image2_2, np.float32)
        if image_pair.ndim != 3 or image_pair.shape[-1] != 6:
            raise ValueError(f"image_pair must be [H, W, 6], "
                             f"got {image_pair.shape}")
        if image2_2.ndim != 3 or image2_2.shape[-1] != 3:
            raise ValueError(f"image2_2 must be [h, w, 3], "
                             f"got {image2_2.shape}")
        if intrinsics is not None:
            intrinsics = np.asarray(intrinsics, np.float32)
            if intrinsics.shape != (4,):
                raise ValueError(f"intrinsics must be [4], "
                                 f"got {intrinsics.shape}")
        with self._shape_lock:
            if self._shapes is None:
                # tentative pin — confirmed by the first SUCCESSFUL batch
                # (_run_batch), rolled back if that batch fails, so a bad
                # first request can't wedge the server for everyone else
                self._shapes = (image_pair.shape, image2_2.shape)
            elif self._shapes != (image_pair.shape, image2_2.shape):
                raise ValueError(
                    f"shape mismatch with this server's batch shapes: "
                    f"got {(image_pair.shape, image2_2.shape)}, serving "
                    f"{self._shapes}")
        fut: Future = Future()
        self._queue.put(_Request(image_pair, image2_2, intrinsics, fut))
        return fut

    # ------------------------------------------------------------------
    def _dispatch_loop(self):
        import time

        stashed: list = []  # shape stragglers, lead the next batch
        while not self._closed.is_set():
            if stashed:
                first = stashed.pop(0)
            else:
                try:
                    first = self._queue.get(timeout=0.05)
                except queue.Empty:
                    continue
            batch = [first]
            shapes = (first.image_pair.shape, first.image2_2.shape)
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    req = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                # co-batch only identical shapes: a stale request admitted
                # under a since-rolled-back tentative pin must fail alone,
                # never the well-formed batch it would be stacked with
                if (req.image_pair.shape, req.image2_2.shape) == shapes:
                    batch.append(req)
                else:
                    stashed.append(req)
            try:
                self._run_batch(batch)
                with self._shape_lock:
                    if self._shapes == shapes:
                        self._shapes_confirmed = True
            except BaseException as e:  # surface to callers
                with self._shape_lock:
                    if not self._shapes_confirmed and self._shapes == shapes:
                        # the pinning batch itself failed (e.g. resolution
                        # the engine can't run) — unpin so well-formed
                        # requests aren't rejected against a bad pin.
                        # (only if THIS batch carries the pinned shape: a
                        # stale-shape batch failing must not clear a good
                        # tentative pin)
                        self._shapes = None
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)
        for req in stashed:  # fail stragglers on close
            if not req.future.done():
                req.future.set_exception(RuntimeError("server closed"))

    def _bucket(self, n: int) -> int:
        b = self._min_bucket
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    def _to_device(self, arr):
        """Host batch -> device array; sharded over the mesh 'data' axis
        when serving multi-chip."""
        import jax
        import jax.numpy as jnp

        if self.mesh is None:
            return jnp.asarray(arr)
        from .sharding import data_parallel_sharding

        return jax.device_put(
            arr, data_parallel_sharding(self.mesh, arr.ndim))

    def warmup(self):
        """Pre-compile every bucket size (first compile of the fused
        pipeline is slow; serving traffic should never pay it)."""
        import numpy as np

        H, W = self.engine.HEIGHT, self.engine.WIDTH
        b = self._min_bucket
        while True:
            self.engine.predict(
                self.params,
                self._to_device(np.zeros((b, H, W, 6), np.float32)),
                self._to_device(np.zeros((b, H // 4, W // 4, 3), np.float32)),
                self._to_device(np.broadcast_to(self._default_intr, (b, 4))))
            if b >= self.max_batch:
                break
            # max_batch itself is a dispatchable bucket even when it is
            # not min_bucket * 2^k (_bucket caps at it) — compile it too
            b = min(b * 2, self.max_batch)

    def _run_batch(self, batch):
        n = len(batch)
        pad = self._bucket(n) - n
        image_pair = np.stack([r.image_pair for r in batch])
        image2_2 = np.stack([r.image2_2 for r in batch])
        intr = np.stack([r.intrinsics if r.intrinsics is not None
                         else self._default_intr for r in batch])
        if pad:
            image_pair = np.concatenate(
                [image_pair, np.repeat(image_pair[-1:], pad, 0)])
            image2_2 = np.concatenate(
                [image2_2, np.repeat(image2_2[-1:], pad, 0)])
            intr = np.concatenate([intr, np.repeat(intr[-1:], pad, 0)])

        out = self.engine.predict(self.params, self._to_device(image_pair),
                                  self._to_device(image2_2),
                                  self._to_device(intr))
        depth = np.asarray(out.depth_refined, np.float32)[..., 0]
        rot = np.asarray(out.prediction.rotation, np.float32)
        trans = np.asarray(out.prediction.translation, np.float32)
        for i, req in enumerate(batch):
            req.future.set_result((depth[i], rot[i], trans[i]))

    # ------------------------------------------------------------------
    def close(self):
        self._closed.set()
        self._thread.join(timeout=5)
        # fail any stragglers
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            req.future.set_exception(RuntimeError("server closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
