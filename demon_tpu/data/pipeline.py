"""Host -> device feeding: double-buffered, mesh-sharded prefetch.

The reference's throughput governor is the 4-deep batch queue feeding one
GPU (multivih5datareader.cpp:39,1955-1970). On TPU the equivalent is
keeping the next batch already resident in HBM, sharded over the mesh's
data axis, while the current step runs — jax dispatch is async, so a
1-batch lookahead suffices to overlap host decode with device compute.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator

import jax
import numpy as np

from ..engine.sharding import data_parallel_sharding


def device_prefetch(
    batches: Iterable[Dict[str, np.ndarray]],
    mesh=None,
    axis: str = "data",
    lookahead: int = 2,
    drop_keys: tuple = ("SAMPLE_IDS",),
) -> Iterator[Dict[str, jax.Array]]:
    """Move numpy batches onto devices ahead of consumption.

    Entries named in `drop_keys` are REMOVED (they are host-side strings a
    jitted consumer cannot take); other non-array entries pass through
    untouched. With a mesh, arrays are placed batch-sharded over `axis`;
    without, they go to the default device.
    """
    import collections

    buf = collections.deque()

    def _put(batch):
        out = {}
        for k, v in batch.items():
            if k in drop_keys:
                continue
            if not isinstance(v, np.ndarray):
                out[k] = v
            elif mesh is not None:
                out[k] = jax.device_put(
                    v, data_parallel_sharding(mesh, v.ndim, axis))
            else:
                out[k] = jax.device_put(v)
        return out

    it = iter(batches)
    try:
        for _ in range(lookahead):
            buf.append(_put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(_put(next(it)))
        except StopIteration:
            pass
        yield out
