"""Network serving front for the micro-batching inference server.

`DemonRpcServer` exposes a `DemonServer` (engine/server.py) over TCP with a
length-prefixed binary protocol, so non-Python clients and remote hosts can
stream image pairs at the device without sharing a process. Requests from
all connections funnel into the one micro-batching dispatcher, so
cross-client coalescing works exactly as in-process submission does. The
reference has no serving story at all (inference there is 5 manual
session.run calls per pair, examples/example.py:87-99); this is the
production-deployment layer of the TPU rebuild.

Wire format (both directions)::

    b"DMN1" | uint32 header_len | header JSON | raw array payload

The header is UTF-8 JSON ``{"arrays": [{"name", "shape", "dtype"}, ...]}``
(responses may instead carry ``{"error": "..."}``); the payload is the
C-order bytes of every array concatenated in header order. A connection
handles any number of requests back-to-back and closes on EOF.

Usage::

    with DemonRpcServer(server, port=7100) as rpc:     # serving host
        rpc.serve_forever()

    with DemonRpcClient("tpu-host", 7100) as client:   # any client
        out = client.predict(image_pair, image2_2)
        out["depth"], out["rotation"], out["translation"]
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading
from typing import Dict, Optional

import numpy as np

_MAGIC = b"DMN1"
_MAX_HEADER = 1 << 20
_MAX_PAYLOAD = 1 << 30


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(n - len(buf), 1 << 20))
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        buf.extend(chunk)
    return bytes(buf)


def send_message(sock: socket.socket, arrays: Dict[str, np.ndarray],
                 error: Optional[str] = None) -> None:
    """Write one protocol message (arrays by name, or an error)."""
    if error is not None:
        header = {"error": str(error)}
        payload = b""
    else:
        items, chunks = [], []
        for name, a in arrays.items():
            a = np.ascontiguousarray(a)
            items.append({"name": name, "shape": list(a.shape),
                          "dtype": a.dtype.name})
            chunks.append(a.tobytes())
        header = {"arrays": items}
        payload = b"".join(chunks)
    hb = json.dumps(header).encode("utf-8")
    sock.sendall(_MAGIC + struct.pack("<I", len(hb)) + hb + payload)


def recv_message(sock: socket.socket) -> Dict[str, np.ndarray]:
    """Read one protocol message; raises RuntimeError on an error reply
    and EOFError on a cleanly closed connection."""
    first = sock.recv(len(_MAGIC))
    if not first:
        raise EOFError
    magic = first + (_recv_exact(sock, len(_MAGIC) - len(first))
                     if len(first) < len(_MAGIC) else b"")
    if magic != _MAGIC:
        raise ConnectionError(f"bad magic {magic!r}")
    (hlen,) = struct.unpack("<I", _recv_exact(sock, 4))
    if hlen > _MAX_HEADER:
        raise ConnectionError(f"header too large ({hlen} bytes)")
    try:
        header = json.loads(_recv_exact(sock, hlen).decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as e:
        raise ConnectionError(f"malformed header: {e}") from None
    if isinstance(header, dict) and "error" in header:
        raise RuntimeError(f"server error: {header['error']}")
    # validate everything the peer declared BEFORE trusting it: a
    # negative or overflowing shape product must not bypass the payload
    # bound, and a bad entry must surface as a clean connection error,
    # not an uncaught traceback in the handler thread
    items = header.get("arrays") if isinstance(header, dict) else None
    if not isinstance(items, list):
        raise ConnectionError("malformed header: no 'arrays' list")
    parsed, total = [], 0
    for item in items:
        try:
            name = item["name"]
            shape = tuple(int(d) for d in item["shape"])
            dt = np.dtype(str(item["dtype"]))
        except (TypeError, KeyError, ValueError) as e:
            raise ConnectionError(f"malformed array header: {e}") from None
        if not isinstance(name, str) or dt.kind not in "biufc":
            raise ConnectionError(f"malformed array header entry {name!r}")
        n = dt.itemsize
        for d in shape:
            if d < 0:
                raise ConnectionError(f"negative dimension in {name!r}")
            n *= d
            if n > _MAX_PAYLOAD:
                raise ConnectionError(f"payload too large ({name!r})")
        total += n
        if total > _MAX_PAYLOAD:
            raise ConnectionError(f"payload too large ({total} bytes)")
        parsed.append((name, shape, dt, n))
    payload = _recv_exact(sock, total)
    out, off = {}, 0
    for name, shape, dt, n in parsed:
        out[name] = np.frombuffer(
            payload[off:off + n], dt).reshape(shape).copy()
        off += n
    return out


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        self.request.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        backend = self.server.demon_backend  # type: ignore[attr-defined]
        while True:
            try:
                req = recv_message(self.request)
            except EOFError:
                return
            except ConnectionError:
                return
            try:
                for field in ("image_pair", "image2_2"):
                    if field not in req:
                        raise ValueError(f"missing array {field!r}")
                fut = backend.submit(req["image_pair"], req["image2_2"],
                                     req.get("intrinsics"))
                depth, rot, trans = fut.result()
                send_message(self.request, {"depth": depth, "rotation": rot,
                                            "translation": trans})
            except BrokenPipeError:
                return
            except Exception as e:  # report to the client, keep serving
                try:
                    send_message(self.request, {}, error=repr(e))
                except OSError:
                    return


class DemonRpcServer:
    """TCP front over a DemonServer. Each connection gets a handler
    thread; device batching happens in the shared dispatcher."""

    def __init__(self, backend, host: str = "0.0.0.0", port: int = 7100):
        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._tcp = _Server((host, port), _Handler)
        self._tcp.demon_backend = backend  # type: ignore[attr-defined]
        self._thread: Optional[threading.Thread] = None
        self._serving = False

    @property
    def address(self):
        """(host, port) actually bound — useful with port=0."""
        return self._tcp.server_address

    def serve_forever(self):
        self._serving = True
        self._tcp.serve_forever()

    def start(self):
        """Serve on a background thread (returns immediately)."""
        self._serving = True
        self._thread = threading.Thread(target=self._tcp.serve_forever,
                                        daemon=True, name="demon-rpc")
        self._thread.start()

    def close(self):
        # shutdown() blocks on an event only serve_forever() sets — calling
        # it without an active serve loop deadlocks (e.g. an exception in a
        # `with` body before serve_forever/start ran)
        if self._serving:
            self._tcp.shutdown()
        self._tcp.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class DemonRpcClient:
    """Blocking client for DemonRpcServer; one request in flight per
    client instance (use several instances for pipelined load)."""

    def __init__(self, host: str, port: int, timeout: float = 300.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def predict(self, image_pair: np.ndarray, image2_2: np.ndarray,
                intrinsics: Optional[np.ndarray] = None
                ) -> Dict[str, np.ndarray]:
        """[H, W, 6] pair + [h, w, 3] half-res image 2 (both in
        [-0.5, 0.5]) -> {"depth", "rotation", "translation"}."""
        arrays = {"image_pair": np.asarray(image_pair, np.float32),
                  "image2_2": np.asarray(image2_2, np.float32)}
        if intrinsics is not None:
            arrays["intrinsics"] = np.asarray(intrinsics, np.float32)
        send_message(self._sock, arrays)
        return recv_message(self._sock)

    def close(self):
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
