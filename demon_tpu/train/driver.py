"""The training main loop — the TPU-native counterpart of
training/v2/training.py `main()` + the external tfutils EvolutionTrainer
mainloop.

Runs the six evolutions in sequence: each evolution builds its reader,
warm-starts from the previous evolution's snapshot, executes the jitted
train step over a sharded mesh, logs metrics as JSONL (the tf.summary
equivalent), checkpoints at `saver_interval` plus frequent recovery
snapshots, and guards numerics every `check_numerics_interval` steps.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import device_prefetch
from ..data.reader import MultiViH5DataReader
from .checkpoint import EvolutionCheckpointer, check_numerics
from .trainer import EVOLUTIONS, EvolutionTrainer, TrainConfig


def default_reader_params(cfg: TrainConfig, sources: Sequence[dict],
                          evo: str, seed: int = 0,
                          cache_dir: Optional[str] = None) -> dict:
    """Reader configuration used by the reference driver
    (training.py:96-116): inverse depth, ANGLEAXIS6, ||t||=1 with depth
    rescale, 192x256, rot180/mirror augmentation. Set `cache_dir` (after
    running data.cache.build_scene_cache on each source) to feed from the
    pre-decoded cache."""
    extra = {"cache_dir": cache_dir} if cache_dir else {}
    return {
        **extra,
        "batch_size": cfg.batch_for(evo),
        "test_phase": False,
        "builder_threads": 4,
        "inverse_depth": True,
        "motion_format": "ANGLEAXIS6",
        "norm_trans_scale_depth": True,
        "scaled_height": cfg.height,
        "scaled_width": cfg.width,
        "scene_pool_size": 500,
        "augment_rot180": 0.5,
        "augment_mirror_x": 0.5,
        "top_output": ("IMAGE_PAIR", "MOTION", "DEPTH", "INTRINSICS"),
        "source": list(sources),
        "seed": seed,
    }


class MetricsLogger:
    """JSONL metrics sink (stands in for tf.summary scalars,
    training.py:553-558)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._f = open(path, "a")

    def log(self, step: int, metrics: Dict[str, Any]):
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                pass
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class TrainingDriver:
    """Runs evolutions 0..5 end to end.

    Iteration counts default to the reference schedule (1000k/1000k/250k/
    250k/1500k/250k, training.py:47-54); pass `max_steps` to cap them for
    smoke runs.
    """

    def __init__(self, train_dir: str, sources: Sequence[dict],
                 config: TrainConfig = None, mesh=None,
                 max_steps: Optional[int] = None,
                 display_interval: int = 100,
                 saver_interval: int = 100_000,
                 recovery_interval: int = 5_000,
                 check_numerics_interval: int = 1_000,
                 seed: int = 0, cache_dir: Optional[str] = None,
                 reader_workers: int = 0):
        self.train_dir = train_dir
        self.sources = list(sources)
        self.config = config or TrainConfig()
        self.mesh = mesh
        self.max_steps = max_steps
        self.display_interval = display_interval
        self.saver_interval = saver_interval
        self.recovery_interval = recovery_interval
        self.check_numerics_interval = check_numerics_interval
        self.seed = seed
        self.cache_dir = cache_dir
        # >0: feed from reader_workers processes over disjoint scene
        # shards (data.mp_reader) instead of one threaded reader — the
        # host-side scale-out path past the GIL convoy
        self.reader_workers = reader_workers
        self.trainer = EvolutionTrainer(self.config, mesh=mesh)

    # ------------------------------------------------------------------
    def _initial_params(self, evo: str):
        """Warm-start chain: latest snapshot of this evolution (resume) or
        of the previous one, else fresh init."""
        params_like = self.trainer.init_params(jax.random.key(self.seed))
        idx = EVOLUTIONS.index(evo)
        # resume this evolution if it has checkpoints
        ck = EvolutionCheckpointer(self.train_dir, evo)
        try:
            if ck.latest_step() is not None:
                opt_like = self.trainer.init_opt_state(evo, params_like)
                step, restored = ck.restore(
                    {"params": params_like, "opt_state": opt_like})
                return restored["params"], restored.get("opt_state"), step
        finally:
            ck.close()
        # warm start from the previous evolution
        for prev in reversed(EVOLUTIONS[:idx]):
            ckp = EvolutionCheckpointer(self.train_dir, prev)
            try:
                if ckp.latest_step() is not None:
                    return ckp.restore_params(params_like), None, 0
            finally:
                ckp.close()
        return params_like, None, 0

    # ------------------------------------------------------------------
    def run_evolution(self, evo: str) -> Dict[str, Any]:
        cfg = self.config
        max_iter = cfg.max_iter[evo]
        if self.max_steps is not None:
            max_iter = min(max_iter, self.max_steps)
        # max_iter and the *_interval knobs count optimizer updates; with
        # gradient accumulation each update consumes accum_steps
        # micro-batches, so scale the micro-step loop bounds accordingly.
        # (Checkpoint step numbers and the displayed step remain
        # micro-steps — resume granularity — while metrics.jsonl also
        # logs the effective 'update'.)
        k = cfg.accum_steps
        max_iter *= k
        display_interval = self.display_interval * k
        saver_interval = self.saver_interval * k
        recovery_interval = self.recovery_interval * k
        check_numerics_interval = self.check_numerics_interval * k

        params, opt_state, start_step = self._initial_params(evo)
        params = self.trainer.shard_params(params)
        if opt_state is None:
            opt_state = self.trainer.init_opt_state(evo, params)
        step_fn = self.trainer.make_train_step(evo)
        ck = EvolutionCheckpointer(self.train_dir, evo,
                                   keep_period=saver_interval)
        logger = MetricsLogger(
            os.path.join(self.train_dir, evo, "metrics.jsonl"))

        reader_params = default_reader_params(
            cfg, self.sources, evo, seed=self.seed,
            cache_dir=self.cache_dir)
        if self.reader_workers > 0:
            from ..data.mp_reader import MultiProcessReader

            reader = MultiProcessReader(reader_params,
                                        workers=self.reader_workers)
        else:
            reader = MultiViH5DataReader(reader_params)
        batches = device_prefetch(iter(reader), mesh=self.mesh)

        replay = None
        if evo == "4_iterative":
            first = next(batches)
            replay = self.trainer.init_replay(evo, params, first)

        metrics = {}
        t_last = time.time()
        try:
            step = start_step
            while step < max_iter:
                # (SAMPLE_IDS never reaches here — device_prefetch drops it)
                batch = next(batches)
                params, opt_state, metrics, replay = step_fn(
                    params, opt_state, batch,
                    jnp.asarray(step, jnp.int32), replay)
                step += 1

                if step % display_interval == 0:
                    total = float(metrics["total_loss"])
                    dt = time.time() - t_last
                    t_last = time.time()
                    rate = display_interval * cfg.batch_for(evo) / dt
                    print(f"[{evo}] step {step}/{max_iter} "
                          f"loss={total:.4f} "
                          f"lr={float(metrics['learning_rate']):.2e} "
                          f"{rate:.1f} samples/s", flush=True)
                    # reader buffer gauges (the reference logs its info
                    # tensor as summary scalars, training.py:132-134)
                    info = reader.info
                    logger.log(step, {
                        **metrics,
                        **({"update": step // k} if k > 1 else {}),
                        "samples_per_s": rate,
                        "reader_batch_buffer": float(info[1]),
                        "reader_scene_buffer": float(info[3]),
                    })
                    if not np.isfinite(total):
                        raise FloatingPointError(
                            f"non-finite total loss at step {step}")
                if step % check_numerics_interval == 0:
                    check_numerics(params, f"params@{step}")
                if (step % saver_interval == 0
                        or step % recovery_interval == 0
                        or step == max_iter):
                    # one manager, two retention classes: steps at
                    # saver_interval multiples are kept forever
                    # (keep_period), recovery steps rotate (max_to_keep)
                    ck.save(step, params, opt_state)
        finally:
            reader.close()
            ck.wait()
            # a step interrupted mid-dispatch leaves params/opt_state
            # bound to buffers already DONATED to the step — saving those
            # would raise from the cleanup path and mask the original
            # error, so only force-save live trees
            alive = not any(
                getattr(leaf, "is_deleted", lambda: False)()
                for leaf in jax.tree.leaves((params, opt_state)))
            if ck.latest_step() != step and alive:
                ck.save(step, params, opt_state, force=True)
            ck.wait()
            ck.close()
            logger.close()
        return {"params": params, "opt_state": opt_state, "step": step,
                "metrics": {k: float(v) for k, v in metrics.items()}}

    # ------------------------------------------------------------------
    def run(self, evolutions: Sequence[str] = EVOLUTIONS) -> None:
        for evo in evolutions:
            print(f"=== evolution {evo} ===", flush=True)
            self.run_evolution(evo)
