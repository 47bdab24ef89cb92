"""Profile the evolution-4 train step on the chip and print the
kernel-bucket table (VERDICT round-2 item 5: evo-4 is ~9h of the ~18h
single-chip schedule and never got the kernel treatment round 2 gave
inference).

Captures a jax profiler trace around BENCH_SCAN-style steps of the real
evo-4 step (4 simulated iterations: fresh batch + 3 recycled rows,
GT-pyramid generation, replay carry) and feeds it to
demon_tpu.utils.trace_analysis.

Usage (chip must be free):
    python experiments/profile_evo4.py [--dtype bfloat16] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trace-dir", default="/tmp/demon_evo4_prof")
    ap.add_argument("--evo", default="4_iterative")
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from demon_tpu.train.trainer import EvolutionTrainer, TrainConfig
    from demon_tpu.utils import trace_analysis

    cfg = TrainConfig(batch_size_iterative=args.batch,
                      compute_dtype=args.dtype)
    trainer = EvolutionTrainer(cfg)
    shapes = jax.eval_shape(trainer.init_params, jax.random.key(0))
    host_rng = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            (host_rng.standard_normal(s.shape) * 0.05).astype(s.dtype)),
        shapes)
    evo = args.evo
    opt_state = trainer.init_opt_state(evo, params)
    step_fn = trainer.make_train_step(evo)

    rng = np.random.RandomState(0)
    H, W = cfg.height, cfg.width
    b = cfg.batch_for(evo)
    batch = {
        "IMAGE_PAIR": jnp.asarray(
            rng.rand(b, H, W, 6).astype(np.float32) - 0.5),
        "MOTION": jnp.asarray(rng.randn(b, 6).astype(np.float32) * 0.1),
        "DEPTH": jnp.asarray(
            rng.uniform(0.3, 2.0, (b, H, W, 1)).astype(np.float32)),
        "INTRINSICS": jnp.asarray(np.tile(
            np.array([[0.89, 1.19, 0.5, 0.5]], np.float32), (b, 1))),
    }
    step = jnp.zeros((), jnp.int32)
    replay = trainer.init_replay(evo, params, batch)

    # compile + settle
    params, opt_state, metrics, replay = step_fn(
        params, opt_state, batch, step, replay)
    print("compiled; loss:", float(metrics["total_loss"]), flush=True)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            params, opt_state, metrics, replay = step_fn(
                params, opt_state, batch, step, replay)
        fence = float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    rate = b * args.iters / dt
    print(f"{evo} {args.dtype}: {rate:.1f} samples/s "
          f"(host-fenced, incl. tunnel dispatch); loss {fence:.3f}",
          flush=True)

    trace_analysis.main([args.trace_dir, "--runs", str(args.iters)])


if __name__ == "__main__":
    main()
