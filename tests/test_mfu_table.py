"""The MFU arithmetic (experiments/mfu_table.py) counts model FLOPs via
XLA cost analysis on an abstract lowering. Guard the inference count: it
must be stable per pair (batch-invariant) and in the physically plausible
range for this conv stack — the BENCHMARKS.md MFU table is derived from
it."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments"))


def test_inference_flops_per_pair_plausible():
    from mfu_table import count_inference

    per_pair = count_inference(4, "bfloat16")
    # full pipeline (bootstrap + 3x iterative + refine) at 192x256:
    # O(10) GFLOP/pair. A 10x change in either direction means the count
    # or the pipeline changed materially — update BENCHMARKS.md.
    assert 2e9 < per_pair < 2e11, per_pair


def test_inference_flops_scale_with_batch():
    from mfu_table import count_inference

    a = count_inference(2, "bfloat16")
    b = count_inference(4, "bfloat16")
    # per-pair cost should be batch-invariant to within a few percent
    assert abs(a - b) / b < 0.05, (a, b)
