"""Headline benchmark: image pairs/s/chip for the full DeMoN pipeline
(bootstrap + 3x iterative + refinement) fused into one jitted program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context: the reference runs this workload as 5 sequential
session.run calls per pair on a CUDA-8/TF-1.4 GPU (examples/example.py:
87-99) and publishes no numbers (BASELINE.md). We use an estimated 2.5
pairs/s for that setup (single pair per run, 5 host round trips) as the
denominator; the BASELINE.json target is >10x.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_PAIRS_PER_S = 2.5  # estimated TF1.4 GPU baseline (see docstring)


def _enable_compilation_cache():
    """Persist compiled executables across processes — the fused pipeline
    takes minutes to compile over the remote TPU transport, and the cache
    makes repeat bench runs start in seconds."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def bench_train():
    """BENCH_MODE=train: evolution-0 training step throughput (192x256,
    reference batch 32) on synthetic data."""
    import jax
    import jax.numpy as jnp

    from demon_tpu.train.trainer import EvolutionTrainer, TrainConfig

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    cfg = TrainConfig(batch_size=batch)
    trainer = EvolutionTrainer(cfg)
    shapes = jax.eval_shape(trainer.init_params, jax.random.key(0))
    host_rng = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            (host_rng.standard_normal(s.shape) * 0.05).astype(s.dtype)),
        shapes)
    evo = os.environ.get("BENCH_EVO", "0_flow1")
    opt_state = trainer.init_opt_state(evo, params)
    step_fn = trainer.make_train_step(evo)

    rng = np.random.RandomState(0)
    H, W = cfg.height, cfg.width
    batch_data = {
        "IMAGE_PAIR": jnp.asarray(rng.rand(batch, H, W, 6).astype(np.float32) - 0.5),
        "MOTION": jnp.asarray(rng.randn(batch, 6).astype(np.float32) * 0.1),
        "DEPTH": jnp.asarray(rng.uniform(0.3, 2.0, (batch, H, W, 1)).astype(np.float32)),
        "INTRINSICS": jnp.asarray(
            np.tile(np.array([[0.89, 1.19, 0.5, 0.5]], np.float32), (batch, 1))),
    }
    step = jnp.zeros((), jnp.int32)

    params, opt_state, metrics, _ = step_fn(params, opt_state, batch_data,
                                            step, None)
    float(metrics["total_loss"])  # compile fence
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, metrics, _ = step_fn(params, opt_state,
                                                batch_data, step, None)
    float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    samples_per_s = batch * iters / dt
    print(json.dumps({
        "metric": f"demon_train_{evo}_samples_per_s_per_chip",
        "value": round(samples_per_s, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / 30.0, 2),  # est. TF1.4 GPU
    }))


def main():
    _enable_compilation_cache()
    if os.environ.get("BENCH_MODE", "infer") == "train":
        return bench_train()
    import jax
    import jax.numpy as jnp

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.models import DEMON_INTRINSICS

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    # serving dtype: bfloat16 rides the MXU at full rate; geometry ops
    # inside the blocks stay fp32 (see models/blocks.py)
    dtype = jnp.bfloat16 if os.environ.get(
        "BENCH_DTYPE", "bfloat16") == "bfloat16" else jnp.float32

    engine = DemonEngine(variant="v1", iterations=3, dtype=dtype)
    # abstract-eval the init to get parameter shapes, then materialize
    # host-side — avoids compiling/running 4 init programs on the device
    # (for throughput the weight values are irrelevant)
    shapes = jax.eval_shape(engine.init, jax.random.key(0))
    host_rng = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            (host_rng.standard_normal(s.shape) * 0.05).astype(s.dtype)),
        shapes)
    if dtype == jnp.bfloat16:
        params = engine.cast_params(params)  # halves weight HBM traffic

    H, W = DemonEngine.HEIGHT, DemonEngine.WIDTH
    rng = np.random.RandomState(0)
    image_pair = jnp.asarray(rng.rand(batch, H, W, 6).astype(np.float32) - 0.5)
    image2_2 = jnp.asarray(
        rng.rand(batch, H // 4, W // 4, 3).astype(np.float32) - 0.5)
    intrinsics = jnp.broadcast_to(jnp.asarray(DEMON_INTRINSICS), (batch, 4))

    def run():
        out = engine.predict(params, image_pair, image2_2, intrinsics)
        return jnp.sum(out.depth_refined)

    # On the tunneled axon platform block_until_ready resolves before
    # device completion, so a host transfer is the only reliable fence.
    # Device execution is stream-ordered: queue all steps, fetch the last
    # result once — the fetch fences every preceding step without paying
    # tunnel round-trip latency per iteration.
    float(run())  # compile + settle
    float(run())
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = run()
    float(last)
    dt = time.perf_counter() - t0
    pairs_per_s = batch * iters / dt

    print(json.dumps({
        "metric": "demon_full_pipeline_pairs_per_s_per_chip",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / REFERENCE_PAIRS_PER_S, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
