"""Multi-process input pipeline: N worker processes, each running a full
MultiViH5DataReader over a disjoint scene shard, delivering batches to the
training process through shared-memory ring buffers.

Why processes: the threaded reader's measured ceiling on small hosts is
the GIL convoy — past ~host-core builder threads the python selection
phase serializes (BENCHMARKS.md "input pipeline"). The reference solved
this with C++ threads (multivih5datareader.cpp:1234-1301); the
TPU-native answer keeps the whole existing reader (python orchestration +
native decode/assembly) and removes the shared GIL instead: each worker
process owns its own interpreter, its own memmapped cache shard view and
its own native OpenMP team.

Sharding reuses the reader's host-sharding rule: worker w of W serving
global host h of H reads shard (h*W + w) of (H*W) — the exact stable
per-file rule count_sample_groups/_group_iter/_cache_iter implement, so
multi-process and multi-host composition is one multiplication.

Transport: one POSIX shared-memory segment per worker, sliced into
`slots` batch-sized frames. A worker copies each assembled batch into a
free slot (one memcpy, parallel across workers) and posts (slot, layout)
on a queue; the parent materializes numpy arrays out of the slot (second
memcpy) and immediately recycles it. Two copies total — the same count a
multiprocessing.Queue pickle round trip pays in the pipe alone, without
the pipe's syscall traffic — and the parent-side copy is the only
serialized section (~1-2 ms/batch), so the design scales until that
memcpy saturates (>10k samples/s at 192x256 batch 16).

Deterministic test phase (round 4): exact one-pass coverage at W > 1 via
batch-block sharding. The global sorted group sequence is cut into
blocks of `batch_size`; worker w owns blocks ≡ w (mod W)
(ReaderParams.shard_batch_blocks), each worker serves exactly its own
blocks in order, and the parent interleaves workers round-robin — so the
emitted batch stream is a deterministic partition of the single-reader
stream with every sample seen exactly once, under the reference's
num_samples % batch_size == 0 contract (multivih5datareader.cpp:
2026-2054). Composes with multi-host sharding the same way training
does: host h's worker w serves block shard h*W+w of H*W.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import queue as queue_mod
import traceback
from multiprocessing import shared_memory
from typing import Dict, List, Optional

import numpy as np

from .reader import MAX_PRELOADED_BATCHES, ReaderParams

_ALIGN = 64


def _slot_bytes(p: ReaderParams) -> int:
    """Upper bound on one batch's payload for the configured outputs."""
    if not (p.scaled_height and p.scaled_width):
        raise ValueError("MultiProcessReader needs scaled_height/width "
                         "(slot sizing)")
    h, w, b = p.scaled_height, p.scaled_width, p.batch_size
    total = 0
    per_pix = {
        "IMAGE_PAIR": 2 if p.convert_to_gray_values else 6,
        "DEPTH": 2 if p.depth_pair else 1,
        "FLOW": 2,
        "DEPTHMASKS": 1,
    }
    for key in p.top_output:
        ch = per_pix.get(key)
        if ch is not None:
            total += b * h * w * ch * 4 + _ALIGN
        else:  # MOTION / INTRINSICS / misc vectors
            total += b * 32 * 4 + _ALIGN
    return total + _ALIGN


def _worker_main(params: ReaderParams, worker: int, total_workers: int,
                 shm_name: str, slot_bytes: int,
                 free_q, result_q, quit_ev, error_q):
    """Worker process: full reader over its pre-assigned shard; copies
    each batch into a free shared-memory slot."""
    reader = None
    shm = None
    try:
        import os

        # Each worker's native assembly runs an OpenMP team; left at the
        # default (all host cores) W workers oversubscribe W*cores threads
        # and convoy. Split the cores across workers unless the user set
        # an explicit team size. Must happen before the native lib loads.
        if "OMP_NUM_THREADS" not in os.environ:
            cores = os.cpu_count() or 1
            os.environ["OMP_NUM_THREADS"] = str(
                max(1, cores // max(1, total_workers)))

        from .reader import MultiViH5DataReader

        p = params
        shm = shared_memory.SharedMemory(name=shm_name)
        reader = MultiViH5DataReader(p)
        n_sent = 0
        while not quit_ev.is_set():
            # deterministic test shard: serve exactly this worker's
            # batches of the one-pass stream, then exit cleanly
            if reader.test_iterations >= 0 \
                    and n_sent >= reader.test_iterations:
                break
            try:
                batch = reader.get_batch(timeout=1.0)
            except TimeoutError:
                continue
            slot = None
            while slot is None and not quit_ev.is_set():
                try:
                    slot = free_q.get(timeout=0.2)
                except queue_mod.Empty:
                    continue
            if slot is None:
                break
            base = slot * slot_bytes
            off = 0
            layout = {}
            for k in sorted(batch):
                v = batch[k]
                if not isinstance(v, np.ndarray):
                    continue
                v = np.ascontiguousarray(v)
                off = (off + _ALIGN - 1) // _ALIGN * _ALIGN
                dst = np.ndarray(v.shape, v.dtype, buffer=shm.buf,
                                 offset=base + off)
                np.copyto(dst, v)
                layout[k] = (off, v.shape, v.dtype.str)
                off += v.nbytes
            result_q.put((worker, slot, layout,
                          [str(s) for s in batch.get("SAMPLE_IDS", [])]))
            n_sent += 1
    except BaseException:
        # dedicated error channel: the parent polls it on every queue-empty
        # wait, so a failure surfaces immediately even when the test-phase
        # round-robin is parked on a different worker's queue and even
        # though this worker exits 0 after catching its own exception
        try:
            error_q.put((worker, traceback.format_exc()))
        except Exception:
            pass
    finally:
        if reader is not None:
            reader.close()
        if shm is not None:
            shm.close()


class MultiProcessReader:
    """Drop-in batch source with the MultiViH5DataReader iteration/info
    interface, fed by `workers` reader processes over disjoint shards.

    Usage::

        with MultiProcessReader(params, workers=4) as reader:
            for batch in reader: ...
    """

    def __init__(self, params, workers: int = 2, slots: int = 4):
        p = params if isinstance(params, ReaderParams) \
            else ReaderParams.from_json(params)
        p.validate()
        if workers < 1:
            raise ValueError("workers must be >= 1")
        self.params = p
        self.workers = workers
        self.test_iterations = -1
        self._worker_iters = None
        if p.test_phase:
            # exact one-pass coverage at W > 1: batch-block sharding (see
            # module docstring). The reference's global contract first —
            # the whole source, not any one shard (cpp:2039-2052).
            from .reader import count_sample_groups

            paths = p.source[0].path.split(";")
            n_global = count_sample_groups(paths)
            if n_global % p.batch_size != 0:
                raise ValueError(
                    f"test phase requires num_samples % batch_size == 0, "
                    f"got {n_global} % {p.batch_size} != 0 (reference "
                    f"multivih5datareader.cpp:2039-2052)")
            self._worker_iters = [
                count_sample_groups(
                    paths, p.host_id * workers + w,
                    p.num_hosts * workers,
                    block_size=p.batch_size) // p.batch_size
                for w in range(workers)]
            self.test_iterations = sum(self._worker_iters)
            # global block order: round r serves worker w iff w still
            # owns a block at round r — the single-reader batch sequence
            self._test_order = [
                w for r in range(max(self._worker_iters, default=0))
                for w in range(workers) if r < self._worker_iters[w]]
            self._emitted = 0
        self._slot_bytes = _slot_bytes(p)
        self._slots = slots
        self._ctx = mp.get_context("spawn")
        self._quit = self._ctx.Event()
        self._error_q = self._ctx.Queue()
        self._result_q = self._ctx.Queue(maxsize=workers * slots)
        # test phase needs per-worker delivery order, not arrival order
        self._result_qs = ([self._ctx.Queue(maxsize=slots)
                            for _ in range(workers)]
                           if p.test_phase else None)
        self._free_qs = []
        self._shms = []
        self._procs = []
        for w in range(workers):
            # worker w serves shard (host_id*W + w) of (num_hosts*W) —
            # the reader's stable host-sharding rule (stride per file in
            # training, batch blocks in test), so multi-process x
            # multi-host composition is one multiplication
            wp = dataclasses.replace(
                p,
                host_id=p.host_id * workers + w,
                num_hosts=p.num_hosts * workers,
                shard_batch_blocks=p.test_phase,
                seed=(p.seed + 0x9E3779B1 * (w + 1)) % (1 << 31),
            )
            shm = shared_memory.SharedMemory(
                create=True, size=self._slot_bytes * slots)
            free_q = self._ctx.Queue()
            for s in range(slots):
                free_q.put(s)
            result_q = (self._result_qs[w] if self._result_qs is not None
                        else self._result_q)
            proc = self._ctx.Process(
                target=_worker_main,
                args=(wp, w, workers, shm.name, self._slot_bytes,
                      free_q, result_q, self._quit, self._error_q),
                daemon=True, name=f"demon-reader-worker-{w}")
            proc.start()
            self._shms.append(shm)
            self._free_qs.append(free_q)
            self._procs.append(proc)

    # ------------------------------------------------------------------
    @property
    def info(self) -> np.ndarray:
        """[test_iterations, batch buf cur/max, 0, 0] — queue gauges
        aggregated across workers (scene gauges live in the workers)."""
        try:
            qsize = (sum(q.qsize() for q in self._result_qs)
                     if self._result_qs is not None
                     else self._result_q.qsize())
        except NotImplementedError:  # macOS: Queue.qsize unsupported
            qsize = 0
        return np.array([
            float(self.test_iterations),
            qsize, self.workers * self._slots,
            0.0, float(MAX_PRELOADED_BATCHES),
        ], np.float32)

    def _check_alive(self):
        try:
            w, tb = self._error_q.get_nowait()
            raise RuntimeError(f"reader worker {w} failed:\n{tb}")
        except queue_mod.Empty:
            pass
        for w, proc in enumerate(self._procs):
            if not proc.is_alive() and proc.exitcode not in (0, None):
                raise RuntimeError(
                    f"reader worker {w} died (exit {proc.exitcode})")

    def get_batch(self, timeout: Optional[float] = None
                  ) -> Dict[str, np.ndarray]:
        import time

        deadline = None if timeout is None else time.monotonic() + timeout
        self._check_alive()
        if self.params.test_phase:
            # _test_order holds the full block-order worker sequence;
            # indexing by _emitted (which only advances on a successful
            # dequeue) keeps a timed-out call retryable without
            # desyncing the stream position
            if self._emitted >= self.test_iterations:
                raise RuntimeError(
                    "deterministic test pass exhausted "
                    f"({self.test_iterations} batches)")
            q = self._result_qs[self._test_order[self._emitted]]
        else:
            q = self._result_q
        while True:
            try:
                msg = q.get(timeout=0.2)
                break
            except queue_mod.Empty:
                self._check_alive()
                if deadline is not None and time.monotonic() > deadline:
                    raise TimeoutError("no batch produced in time")
        worker, slot, layout, sample_ids = msg
        shm = self._shms[worker]
        base = slot * self._slot_bytes
        out: Dict[str, np.ndarray] = {}
        # one memcpy out of the slot, then recycle it immediately
        for k, (off, shape, dtype) in layout.items():
            src = np.ndarray(shape, np.dtype(dtype), buffer=shm.buf,
                             offset=base + off)
            out[k] = src.copy()
        self._free_qs[worker].put(slot)
        out["SAMPLE_IDS"] = sample_ids
        if self.params.test_phase:
            self._emitted += 1
        return out

    def __iter__(self):
        n = 0
        while self.test_iterations < 0 or n < self.test_iterations:
            yield self.get_batch()
            n += 1

    def close(self):
        self._quit.set()
        for proc in self._procs:
            proc.join(timeout=5)
        for proc in self._procs:
            if proc.is_alive():
                proc.terminate()
                proc.join(timeout=2)
        for shm in self._shms:
            try:
                shm.close()
                shm.unlink()
            except FileNotFoundError:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
