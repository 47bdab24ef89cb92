"""Micro-batching server tests (tiny engine, CPU)."""

import numpy as np
import pytest

from demon_tpu.engine.server import DemonServer


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.models import DEMON_INTRINSICS

    engine = DemonEngine(variant="v1", iterations=1)
    H, W, B = 64, 64, 1
    ip = jnp.zeros((B, H, W, 6))
    i22 = jnp.zeros((B, H // 4, W // 4, 3))
    intr = jnp.broadcast_to(jnp.asarray(DEMON_INTRINSICS), (B, 4))
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    boot = jax.jit(engine.bootstrap.init)(k1, ip, i22)
    prev = jax.jit(engine.bootstrap.apply)(boot, ip, i22)
    itp = jax.jit(engine.iterative.init)(k2, ip, i22, intr, prev)
    ref = jax.jit(engine.refinement.init)(k3, ip[..., :3], prev.depth2)
    return engine, {"bootstrap": boot, "iterative": itp, "refinement": ref}


def test_server_single_and_burst(tiny):
    engine, params = tiny
    rng = np.random.RandomState(0)
    H, W = 64, 64
    with DemonServer(engine, params, max_batch=4, max_wait_ms=20) as server:
        # single request (padded batch)
        fut = server.submit(rng.rand(H, W, 6).astype(np.float32) - 0.5,
                            rng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5)
        depth, rot, trans = fut.result(timeout=300)
        assert depth.shape == (H, W)
        assert rot.shape == (3,) and trans.shape == (3,)
        assert np.isfinite(depth).all()

        # burst of 9 requests across multiple micro-batches
        futs = [
            server.submit(rng.rand(H, W, 6).astype(np.float32) - 0.5,
                          rng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5)
            for _ in range(9)
        ]
        results = [f.result(timeout=300) for f in futs]
        assert len(results) == 9
        # different inputs give different outputs (no result crosstalk)
        d0 = results[0][0]
        d1 = results[1][0]
        assert np.abs(d0 - d1).max() > 0


def test_server_batch_consistency(tiny):
    """Server result for a pair equals a direct engine call."""
    import jax.numpy as jnp

    engine, params = tiny
    rng = np.random.RandomState(1)
    H, W = 64, 64
    ip = rng.rand(H, W, 6).astype(np.float32) - 0.5
    i22 = rng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5

    direct = engine.predict(params, jnp.asarray(ip[None]),
                            jnp.asarray(i22[None]))
    with DemonServer(engine, params, max_batch=4) as server:
        depth, rot, trans = server.submit(ip, i22).result(timeout=300)

    np.testing.assert_allclose(
        depth, np.asarray(direct.depth_refined)[0, ..., 0], atol=2e-5)
    np.testing.assert_allclose(
        rot, np.asarray(direct.prediction.rotation)[0], atol=2e-5)


def test_server_bucket_padding(tiny):
    """Partial batches pad to the next power-of-two bucket, not max_batch:
    a single request under low load must dispatch a batch-1 program."""
    engine, params = tiny
    seen = []
    real_predict = engine.predict

    def spy(params_, ip, i22, intr=None):
        seen.append(ip.shape[0])
        return real_predict(params_, ip, i22, intr)

    engine.predict = spy
    try:
        server = DemonServer(engine, params, max_batch=8, max_wait_ms=1.0)
        assert server._bucket(1) == 1
        assert server._bucket(3) == 4
        assert server._bucket(5) == 8
        assert server._bucket(8) == 8
        rng = np.random.RandomState(0)
        ip = rng.rand(64, 64, 6).astype(np.float32) - 0.5
        i22 = rng.rand(16, 16, 3).astype(np.float32) - 0.5
        fut = server.submit(ip, i22)
        fut.result(timeout=120)
        server.close()
    finally:
        engine.predict = real_predict
    assert seen and seen[0] == 1, seen


def test_server_submit_validation(tiny):
    """Malformed submissions fail their own caller at submit time and
    never poison co-batched well-formed requests."""
    engine, params = tiny
    rng = np.random.RandomState(2)
    H, W = 64, 64
    good_ip = rng.rand(H, W, 6).astype(np.float32) - 0.5
    good_i22 = rng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5
    with DemonServer(engine, params, max_batch=4, max_wait_ms=30) as server:
        with pytest.raises(ValueError):          # wrong channel count
            server.submit(good_ip[..., :3], good_i22)
        with pytest.raises(ValueError):          # wrong rank
            server.submit(good_ip[None], good_i22)
        with pytest.raises(ValueError):          # bad intrinsics
            server.submit(good_ip, good_i22, intrinsics=np.zeros(3))
        fut_ok = server.submit(good_ip, good_i22)
        with pytest.raises(ValueError):          # resolution mismatch
            server.submit(np.zeros((32, 32, 6), np.float32),
                          np.zeros((8, 8, 3), np.float32))
        depth, rot, trans = fut_ok.result(timeout=300)
        assert depth.shape == (H, W) and np.isfinite(depth).all()


def test_server_failed_pinning_batch_unpins(tiny):
    """A first request whose batch FAILS must not pin the server's shapes:
    subsequent well-formed requests at the real resolution still serve."""
    engine, params = tiny
    rng = np.random.RandomState(3)
    real_predict = engine.predict

    def failing(params_, ip, i22, intr=None):
        if ip.shape[1] == 32:  # the bad resolution
            raise ValueError("unsupported resolution")
        return real_predict(params_, ip, i22, intr)

    engine.predict = failing
    try:
        with DemonServer(engine, params, max_batch=4,
                         max_wait_ms=10) as server:
            bad = server.submit(np.zeros((32, 32, 6), np.float32),
                                np.zeros((8, 8, 3), np.float32))
            with pytest.raises(ValueError):
                bad.result(timeout=300)
            # the failed pin rolled back -> 64x64 serves normally
            good = server.submit(
                rng.rand(64, 64, 6).astype(np.float32) - 0.5,
                rng.rand(16, 16, 3).astype(np.float32) - 0.5)
            depth, rot, trans = good.result(timeout=300)
            assert np.isfinite(depth).all()
    finally:
        engine.predict = real_predict


def test_server_mixed_shape_queue_isolated(tiny):
    """Requests of different shapes sitting in the queue together (the
    rolled-back-tentative-pin window) must never be stacked into one
    batch: each shape dispatches alone, so a stale bad-shape request
    fails by itself and a well-formed one still serves."""
    import queue as _q
    from concurrent.futures import Future

    from demon_tpu.engine.server import _Request

    engine, params = tiny
    rng = np.random.RandomState(4)
    real_predict = engine.predict

    def failing(params_, ip, i22, intr=None):
        if ip.shape[1] == 32:
            raise ValueError("unsupported resolution")
        return real_predict(params_, ip, i22, intr)

    engine.predict = failing
    try:
        server = DemonServer(engine, params, max_batch=4, max_wait_ms=100)
        try:
            # inject both shapes directly into the dispatcher queue —
            # emulating requests admitted under a tentative pin that was
            # rolled back before they dispatched
            bad = _Request(np.zeros((32, 32, 6), np.float32),
                           np.zeros((8, 8, 3), np.float32), None, Future())
            good = _Request(
                rng.rand(64, 64, 6).astype(np.float32) - 0.5,
                rng.rand(16, 16, 3).astype(np.float32) - 0.5, None, Future())
            server._queue.put(bad)
            server._queue.put(good)
            with pytest.raises(ValueError):
                bad.future.result(timeout=300)
            depth, rot, trans = good.future.result(timeout=300)
            assert np.isfinite(depth).all()
        finally:
            server.close()
    finally:
        engine.predict = real_predict


def test_server_warmup_covers_non_pow2_max_batch():
    """warmup() must compile the max_batch bucket even when it is not a
    power of two (runtime _bucket dispatches it)."""
    calls = []

    class _DummyEngine:
        HEIGHT, WIDTH = 8, 8

        def predict(self, params, ip, i22, intr=None):
            calls.append(ip.shape[0])

    server = DemonServer(_DummyEngine(), {}, max_batch=24)
    try:
        assert server._bucket(17) == 24
        server.warmup()
        assert calls == [1, 2, 4, 8, 16, 24], calls
    finally:
        server.close()

    # with a mesh: buckets start at the data-axis size and inputs arrive
    # sharded (params replicate at construction — pass a real pytree)
    import jax

    from demon_tpu.engine.sharding import make_mesh

    mesh = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    calls.clear()
    server = DemonServer(_DummyEngine(), {"w": np.zeros(3, np.float32)},
                         max_batch=24, mesh=mesh)
    try:
        server.warmup()
        assert calls == [4, 8, 16, 24], calls
    finally:
        server.close()


def test_rpc_close_without_serving_does_not_deadlock(tiny):
    """Constructing DemonRpcServer and closing it without ever entering
    serve_forever()/start() must return (used to deadlock in shutdown())."""
    import threading

    from demon_tpu.engine.rpc import DemonRpcServer

    engine, params = tiny
    with DemonServer(engine, params, max_batch=2) as backend:
        rpc = DemonRpcServer(backend, host="127.0.0.1", port=0)
        t = threading.Thread(target=rpc.close)
        t.start()
        t.join(timeout=10)
        assert not t.is_alive(), "close() deadlocked"
