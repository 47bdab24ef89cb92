"""Model-FLOPs MFU arithmetic for the headline workloads.

BENCHMARKS.md states inference/train throughput against an *estimated*
TF1.4 GPU baseline; this script states them against the hardware's own
peak instead. It counts the model FLOPs of each jitted program with
XLA's HLO cost analysis on an abstract lowering (no device, no compile —
shapes only, so it runs anywhere), then combines FLOPs/item with the
measured items/s to give achieved FLOP/s as a fraction of the chip's
bf16 peak (MFU).

The programs counted are exactly the benched ones:
  * inference: the fused v1 pipeline (bootstrap + 3x iterative + refine,
    bench.py main(), reference workload examples/example.py:87-99),
  * train: the evolution-0 and evolution-4 jitted train steps
    (bench.py bench_train, reference training/v2/training.py:586-596).

Usage:
    python experiments/mfu_table.py \
        [--infer-rate 2307] [--train0-rate 3921] [--train4-rate ...] \
        [--peak-tflops 197]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# TPU v5e (jax reports "TPU v5 lite") per-chip peak: 197 TFLOP/s bf16.
PEAK_BF16_TFLOPS = 197.0


def _flops(lowered) -> float:
    """Total FLOPs of a lowered jax program (XLA HLO cost analysis)."""
    ca = lowered.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax: one entry per device
        ca = ca[0]
    return float(ca["flops"])


def count_inference(batch: int, dtype_name: str) -> float:
    """FLOPs/pair of the fused pipeline at the bench operating point."""
    import jax
    import jax.numpy as jnp

    from demon_tpu.engine.inference import DemonEngine

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    engine = DemonEngine(variant="v1", iterations=3, dtype=dtype)
    shapes = jax.eval_shape(engine.init, jax.random.key(0))
    if dtype == jnp.bfloat16:
        shapes = jax.eval_shape(engine.cast_params, shapes)
    H, W = DemonEngine.HEIGHT, DemonEngine.WIDTH
    abstract = lambda *s, d=jnp.float32: jax.ShapeDtypeStruct(s, d)
    lowered = engine._jit_predict.lower(
        shapes, abstract(batch, H, W, 6), abstract(batch, H // 4, W // 4, 3),
        abstract(batch, 4))
    return _flops(lowered) / batch


def count_train(evo: str, batch: int, dtype_name: str) -> float:
    """FLOPs/sample of one jitted train step (fwd + bwd + optimizer)."""
    import jax
    import jax.numpy as jnp

    from demon_tpu.train.trainer import EvolutionTrainer, TrainConfig

    cfg = TrainConfig(batch_size=batch, batch_size_iterative=batch,
                      compute_dtype=dtype_name)
    tr = EvolutionTrainer(cfg)
    params = jax.eval_shape(tr.init_params, jax.random.key(0))
    opt_state = jax.eval_shape(lambda p: tr.init_opt_state(evo, p), params)
    H, W = cfg.height, cfg.width
    batch_abs = {
        "IMAGE_PAIR": jax.ShapeDtypeStruct((batch, H, W, 6), jnp.float32),
        "MOTION": jax.ShapeDtypeStruct((batch, 6), jnp.float32),
        "DEPTH": jax.ShapeDtypeStruct((batch, H, W, 1), jnp.float32),
        "INTRINSICS": jax.ShapeDtypeStruct((batch, 4), jnp.float32),
    }
    step = jax.ShapeDtypeStruct((), jnp.int32)
    replay = None
    if evo == "4_iterative":
        replay = jax.eval_shape(
            lambda p, b: tr.init_replay(evo, p, b), params, batch_abs)
    step_fn = tr.make_train_step(evo)
    lowered = step_fn.lower(params, opt_state, batch_abs, step, replay)
    return _flops(lowered) / batch


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--infer-rate", type=float, default=2307.0,
                    help="measured pairs/s (bench.py, bf16 batch 128)")
    ap.add_argument("--train0-rate", type=float, default=3921.0,
                    help="measured evo-0 samples/s (BENCH_MODE=train "
                         "BENCH_SCAN=1 BENCH_DTYPE=bfloat16, batch 32)")
    ap.add_argument("--train4-rate", type=float, default=None,
                    help="measured evo-4 samples/s (batch 8); omit to "
                         "skip the row")
    ap.add_argument("--peak-tflops", type=float, default=PEAK_BF16_TFLOPS)
    ap.add_argument("--out", default=None, help="optional json path")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    rows = []

    def add(workload, flops_per_item, rate, unit):
        achieved = flops_per_item * rate
        rows.append({
            "workload": workload,
            "gflops_per_item": flops_per_item / 1e9,
            "rate": rate,
            "unit": unit,
            "achieved_tflops": achieved / 1e12,
            "mfu_pct": 100.0 * achieved / (args.peak_tflops * 1e12),
        })

    add("inference pipeline (v1, bf16, batch 128)",
        count_inference(128, "bfloat16"), args.infer_rate, "pairs/s")
    add("train step evo-0 (bf16 mixed, batch 32)",
        count_train("0_flow1", 32, "bfloat16"), args.train0_rate,
        "samples/s")
    if args.train4_rate:
        add("train step evo-4 (bf16 mixed, batch 8)",
            count_train("4_iterative", 8, "bfloat16"), args.train4_rate,
            "samples/s")

    print(f"\nchip peak (bf16): {args.peak_tflops:.0f} TFLOP/s\n")
    print(f"{'workload':<44} {'GFLOP/item':>10} {'rate':>9} "
          f"{'TFLOP/s':>8} {'MFU %':>6}")
    for r in rows:
        print(f"{r['workload']:<44} {r['gflops_per_item']:>10.2f} "
              f"{r['rate']:>9.0f} {r['achieved_tflops']:>8.2f} "
              f"{r['mfu_pct']:>6.2f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"peak_tflops_bf16": args.peak_tflops,
                       "rows": rows}, f, indent=1)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
