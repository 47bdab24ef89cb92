"""TCP serving front tests (tiny engine, CPU, loopback sockets)."""

import threading

import numpy as np
import pytest

from demon_tpu.engine.rpc import DemonRpcClient, DemonRpcServer
from demon_tpu.engine.server import DemonServer


@pytest.fixture(scope="module")
def tiny():
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


def test_rpc_round_trip_matches_direct(tiny):
    import jax.numpy as jnp

    engine, params = tiny
    rng = np.random.RandomState(0)
    H, W = 64, 64
    ip = rng.rand(H, W, 6).astype(np.float32) - 0.5
    i22 = rng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5

    direct = engine.predict(params, jnp.asarray(ip[None]),
                            jnp.asarray(i22[None]))
    with DemonServer(engine, params, max_batch=4) as backend, \
            DemonRpcServer(backend, host="127.0.0.1", port=0) as rpc:
        rpc.start()
        host, port = rpc.address
        with DemonRpcClient(host, port) as client:
            out = client.predict(ip, i22)
            # same connection serves repeat requests
            out2 = client.predict(ip, i22)

    assert out["depth"].shape == (H, W)
    assert out["rotation"].shape == (3,)
    assert out["translation"].shape == (3,)
    np.testing.assert_allclose(
        out["depth"], np.asarray(direct.depth_refined)[0, ..., 0], atol=2e-5)
    np.testing.assert_allclose(
        out["rotation"], np.asarray(direct.prediction.rotation)[0], atol=2e-5)
    np.testing.assert_allclose(out["depth"], out2["depth"], atol=0)


def test_rpc_concurrent_clients_no_crosstalk(tiny):
    engine, params = tiny
    rng = np.random.RandomState(1)
    H, W = 64, 64
    inputs = [(rng.rand(H, W, 6).astype(np.float32) - 0.5,
               rng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5)
              for _ in range(6)]

    with DemonServer(engine, params, max_batch=4,
                     max_wait_ms=20) as backend, \
            DemonRpcServer(backend, host="127.0.0.1", port=0) as rpc:
        rpc.start()
        host, port = rpc.address
        results = [None] * len(inputs)

        def worker(i):
            with DemonRpcClient(host, port) as client:
                results[i] = client.predict(*inputs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(inputs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

    assert all(r is not None for r in results)
    # distinct inputs -> distinct depths (responses correctly paired)
    d0, d1 = results[0]["depth"], results[1]["depth"]
    assert np.abs(d0 - d1).max() > 0


def test_rpc_error_reply_keeps_connection(tiny):
    """A malformed request gets an error reply; the connection and the
    server both survive for the next request."""
    from demon_tpu.engine.rpc import recv_message, send_message

    engine, params = tiny
    rng = np.random.RandomState(2)
    H, W = 64, 64
    ip = rng.rand(H, W, 6).astype(np.float32) - 0.5
    i22 = rng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5

    with DemonServer(engine, params, max_batch=4) as backend, \
            DemonRpcServer(backend, host="127.0.0.1", port=0) as rpc:
        rpc.start()
        host, port = rpc.address
        with DemonRpcClient(host, port) as client:
            # missing image2_2 -> server error, not a dead socket
            send_message(client._sock, {"image_pair": ip})
            with pytest.raises(RuntimeError, match="image2_2"):
                recv_message(client._sock)
            out = client.predict(ip, i22)
            assert np.isfinite(out["depth"]).all()


def test_recv_message_rejects_malformed_headers():
    """Hostile/corrupt headers must fail as clean ConnectionErrors with
    the declared payload bound enforced — a negative or overflowing
    shape product must not bypass _MAX_PAYLOAD, and bad dtypes/JSON must
    not escape as uncaught exceptions."""
    import json
    import socket
    import struct

    from demon_tpu.engine.rpc import _MAGIC, recv_message

    def send_raw(header_obj, payload=b"", raw_header=None):
        a, b = socket.socketpair()
        try:
            hb = raw_header if raw_header is not None \
                else json.dumps(header_obj).encode()
            a.sendall(_MAGIC + struct.pack("<I", len(hb)) + hb + payload)
            a.shutdown(socket.SHUT_WR)
            with pytest.raises((ConnectionError, EOFError)):
                recv_message(b)
        finally:
            a.close()
            b.close()

    # negative dimension: np.prod would go negative and pass the bound
    send_raw({"arrays": [{"name": "x", "shape": [-1, 4],
                          "dtype": "float32"}]})
    # int64-overflowing product
    send_raw({"arrays": [{"name": "x", "shape": [2**40, 2**40],
                          "dtype": "float32"}]})
    # unknown dtype name
    send_raw({"arrays": [{"name": "x", "shape": [2], "dtype": "nope"}]})
    # object dtype (deserialization gadget surface)
    send_raw({"arrays": [{"name": "x", "shape": [2], "dtype": "object"}]})
    # arrays not a list / missing
    send_raw({"arrays": 7})
    send_raw([1, 2, 3])
    # invalid JSON bytes
    send_raw(None, raw_header=b"\xff\xfe not json")
    # declared size larger than the 1 GiB cap
    send_raw({"arrays": [{"name": "x", "shape": [1 << 29],
                          "dtype": "float64"}]})
