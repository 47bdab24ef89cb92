"""Profiling helpers: jax trace capture + a wall-clock timer with the
host-fetch fence that remote TPU transports require."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto:

        with trace('/tmp/demon-trace'):
            engine.predict(...)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that fences device work by fetching a value.

    On tunneled TPU platforms `block_until_ready` can resolve before
    device completion (see bench.py), so `stop(result)` reduces and
    fetches `result` to guarantee the timed region actually finished.
    """

    def __init__(self):
        self._t0: Optional[float] = None
        self.elapsed: float = 0.0

    def start(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def stop(self, result=None) -> float:
        if result is not None:
            import jax
            import jax.numpy as jnp

            leaves = jax.tree_util.tree_leaves(result)
            if leaves:
                float(jnp.sum(leaves[0]))
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed
