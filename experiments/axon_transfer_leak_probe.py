"""Minimal reproducer for the dev-tunnel host-RSS transfer leak
(NOTES_NEXT_ROUND.md "environment quirks").

Uploads a fresh ~14.7 MB batch-16 array per iteration; on the tunneled
axon platform host RSS grows ~21.5 MB/iteration (~1.46x the payload) and
never returns — explicit Array.delete() does not help (companion probe).
The trainer and reader were separately proven leak-free (fixed-batch
probe flat at 1.28 GB over 1200 steps; reader probe flat at 0.43 GB over
1500 batches), so long training runs on THIS transport must be chunked
across processes (synthetic_convergence.py --steps-per-process).
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6

import jax, jax.numpy as jnp
x_host = np.random.rand(16, 192, 256, 7).astype(np.float32)  # ~14.7 MB
f = jax.jit(lambda a: jnp.sum(a))
print("start rss", round(rss_gb(), 2), flush=True)
for i in range(800):
    # mutate so no caching tricks apply
    x_host[0, 0, 0, 0] = i
    y = f(jnp.asarray(x_host))
    if i % 100 == 0:
        float(y)
        print(f"iter {i} rss {rss_gb():.2f} GB", flush=True)
float(y)
print("final rss", round(rss_gb(), 2), flush=True)
