#!/usr/bin/env python3
"""Serving example / load generator for DemonServer.

Runs the micro-batching inference server over the fused DeMoN pipeline and
drives it with concurrent client threads, reporting latency percentiles and
sustained throughput. This is the serving-deployment analog of the
reference's one-off inference script (examples/example.py) — there the
workload is 5 sequential session.run calls per pair; here requests from any
number of callers coalesce into fixed-size device batches.

Usage:
    python examples/serve.py                       # synthetic load test
    python examples/serve.py --checkpoint DIR      # converted weights
    python examples/serve.py --clients 8 --requests 64 --max-batch 32
    python examples/serve.py --listen 7100         # network daemon (TCP RPC)
    python examples/serve.py --connect host:7100   # drive a remote daemon
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint dir of converted weights "
                         "(weights/download_and_convert_weights.py); random "
                         "weights when omitted (throughput testing)")
    ap.add_argument("--variant", default="v1", choices=["v1", "v2"])
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=32,
                    help="requests per client")
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--data-parallel", type=int, default=None, metavar="N",
                    help="serve over the first N local devices (batches "
                         "shard across them; params replicate). Default: "
                         "single device.")
    ap.add_argument("--listen", type=int, default=None, metavar="PORT",
                    help="serve over TCP (demon_tpu.engine.rpc protocol) "
                         "instead of running the in-process load test")
    ap.add_argument("--connect", default=None, metavar="HOST:PORT",
                    help="run the load test against a remote --listen "
                         "daemon (no local device needed)")
    args = ap.parse_args()

    if args.connect:
        return run_remote_load(args)

    import jax
    import jax.numpy as jnp

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.engine.server import DemonServer

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    engine = DemonEngine(variant=args.variant, iterations=3, dtype=dtype)

    if args.checkpoint:
        from demon_tpu.tools.converter import load_params
        params = load_params(args.checkpoint)
        print(f"loaded weights from {args.checkpoint}")
    else:
        shapes = jax.eval_shape(engine.init, jax.random.key(0))
        host_rng = np.random.RandomState(0)
        params = jax.tree.map(
            lambda s: jnp.asarray(
                (host_rng.standard_normal(s.shape) * 0.05).astype(s.dtype)),
            shapes)
        print("using random weights (throughput test)")
    if dtype == jnp.bfloat16:
        params = engine.cast_params(params)

    H, W = DemonEngine.HEIGHT, DemonEngine.WIDTH
    rng = np.random.RandomState(0)

    latencies = []
    lat_lock = threading.Lock()

    def client(cid: int, server: DemonServer):
        crng = np.random.RandomState(cid)
        for _ in range(args.requests):
            pair = crng.rand(H, W, 6).astype(np.float32) - 0.5
            i22 = crng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5
            t0 = time.perf_counter()
            fut = server.submit(pair, i22)
            depth, rot, trans = fut.result(timeout=600)
            dt = time.perf_counter() - t0
            assert depth.shape == (H, W) and rot.shape == (3,)
            with lat_lock:
                latencies.append(dt)

    mesh = None
    if args.data_parallel:
        from demon_tpu.engine.sharding import make_mesh

        mesh = make_mesh((args.data_parallel,), ("data",),
                         devices=jax.devices()[: args.data_parallel])
        print(f"data-parallel serving over {args.data_parallel} devices")

    with DemonServer(engine, params, max_batch=args.max_batch,
                     max_wait_ms=args.max_wait_ms, mesh=mesh) as server:
        # warm-up request compiles the batch program once
        print("warming up (first compile)...")
        warm = server.submit(rng.rand(H, W, 6).astype(np.float32) - 0.5,
                             rng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5)
        warm.result(timeout=1200)
        print("warm; starting load")

        if args.listen is not None:
            from demon_tpu.engine.rpc import DemonRpcServer

            server.warmup()  # every bucket compiled before traffic
            with DemonRpcServer(server, port=args.listen) as rpc:
                print(f"serving on tcp port {rpc.address[1]} "
                      f"(ctrl-c to stop)")
                try:
                    rpc.serve_forever()
                except KeyboardInterrupt:
                    pass
            return

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i, server))
                   for i in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

    lat = np.sort(np.array(latencies))
    n = len(lat)
    print(f"\n{n} requests, {args.clients} clients, wall {wall:.2f}s "
          f"-> {n / wall:.1f} pairs/s")
    print(f"latency p50 {1e3 * lat[n // 2]:.1f} ms   "
          f"p90 {1e3 * lat[int(0.9 * n)]:.1f} ms   "
          f"p99 {1e3 * lat[min(n - 1, int(0.99 * n))]:.1f} ms")


def run_remote_load(args):
    """Closed-loop load test against a --listen daemon over TCP."""
    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.engine.rpc import DemonRpcClient

    host, _, port = args.connect.rpartition(":")
    H, W = DemonEngine.HEIGHT, DemonEngine.WIDTH
    latencies = []
    lat_lock = threading.Lock()

    def client(cid: int):
        crng = np.random.RandomState(cid)
        with DemonRpcClient(host or "127.0.0.1", int(port)) as c:
            for _ in range(args.requests):
                pair = crng.rand(H, W, 6).astype(np.float32) - 0.5
                i22 = crng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5
                t0 = time.perf_counter()
                out = c.predict(pair, i22)
                dt = time.perf_counter() - t0
                assert out["depth"].shape == (H, W)
                with lat_lock:
                    latencies.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat = np.sort(np.array(latencies))
    n = len(lat)
    print(f"{n} requests over TCP, {args.clients} clients, wall {wall:.2f}s "
          f"-> {n / wall:.1f} pairs/s")
    print(f"latency p50 {1e3 * lat[n // 2]:.1f} ms   "
          f"p90 {1e3 * lat[int(0.9 * n)]:.1f} ms   "
          f"p99 {1e3 * lat[min(n - 1, int(0.99 * n))]:.1f} ms")


if __name__ == "__main__":
    main()
