"""Micro-bench: int8 vs bf16 conv/matmul rates on the v5e chip via XLA.

Decides whether a quantized serving path is worth building. Shapes are the
model's hot convs (BENCHMARKS.md kernel profile). Fencing per repo rule:
fetch a reduced scalar (block_until_ready does not fence on the tunnel).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.RandomState(0)


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x))


def time_op(f, *args, iters=30):
    f_j = jax.jit(f)
    out = f_j(*args)
    fence(out)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f_j(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def conv(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_i8(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


CASES = [
    # (B, H, W, Cin, Cout, k, stride)  — model hot convs at batch 128
    (128, 24, 32, 256, 256, 3, 1),   # conv4_1
    (128, 12, 16, 512, 512, 3, 1),   # conv5_1 v1
    (128, 48, 64, 128, 128, 3, 1),   # conv3_1
    (128, 192, 256, 32, 32, 3, 1),   # refine-class full-res small-ch
]

for (B, H, W, Ci, Co, k, s) in CASES:
    x32 = rng.rand(B, H, W, Ci).astype(np.float32) - 0.5
    k32 = (rng.rand(k, k, Ci, Co).astype(np.float32) - 0.5) * 0.1
    flops = 2 * B * (H // s) * (W // s) * k * k * Ci * Co

    x_bf, k_bf = jnp.asarray(x32, jnp.bfloat16), jnp.asarray(k32, jnp.bfloat16)
    t_bf = time_op(lambda a, b: conv(a, b, s), x_bf, k_bf)

    xi8 = jnp.asarray(np.clip(x32 * 254, -127, 127).astype(np.int8))
    ki8 = jnp.asarray(np.clip(k32 * 2540, -127, 127).astype(np.int8))
    try:
        t_i8 = time_op(lambda a, b: conv_i8(a, b, s), xi8, ki8)
    except Exception as e:  # noqa
        t_i8 = float("nan")
        print("int8 conv failed:", type(e).__name__, str(e)[:200])

    print(f"conv {B}x{H}x{W}x{Ci}->{Co} k{k}s{s}: "
          f"bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:6.1f} TF/s) | "
          f"int8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:6.1f} TF/s) | "
          f"speedup {t_bf/t_i8:4.2f}x")

# pure matmul rate check
for n in (4096, 8192):
    a32 = rng.rand(n, n).astype(np.float32) - 0.5
    b32 = rng.rand(n, n).astype(np.float32) - 0.5
    flops = 2 * n * n * n
    t_bf = time_op(lambda a, b: jnp.dot(a, b), jnp.asarray(a32, jnp.bfloat16),
                   jnp.asarray(b32, jnp.bfloat16))
    ai8 = jnp.asarray(np.clip(a32 * 127, -127, 127).astype(np.int8))
    bi8 = jnp.asarray(np.clip(b32 * 127, -127, 127).astype(np.int8))
    t_i8 = time_op(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32),
        ai8, bi8)
    print(f"matmul {n}: bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:6.1f} TF/s) | "
          f"int8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:6.1f} TOP/s) | "
          f"speedup {t_bf/t_i8:4.2f}x")
