"""Pure-python reader for TensorFlow V2 "bundle" checkpoints
(<prefix>.index + <prefix>.data-NNNNN-of-MMMMM), so the released DeMoN
weights (weights/download_weights.sh -> demon_original checkpoint,
restored via tf.train.Saver in reference examples/example.py:82-83) can be
converted WITHOUT a TensorFlow installation.

The .index file is a LevelDB-format table mapping variable names to
BundleEntryProto records (dtype, shape, shard, offset, size); the .data
shards hold raw little-endian tensor bytes. Both formats are stable public
TF formats (tensorflow/core/util/tensor_bundle)."""

from __future__ import annotations

import glob
import struct
from typing import Dict, Iterator, List, Tuple

import numpy as np

_TABLE_MAGIC = 0xDB4775248B80FB57

# TF DataType enum -> numpy dtype (subset that appears in checkpoints)
_TF_DTYPES = {
    1: np.float32, 2: np.float64, 3: np.int32, 4: np.uint8, 5: np.int16,
    6: np.int8, 7: object,  # string
    9: np.int64, 10: np.bool_, 14: np.uint16, 17: np.uint16,  # bfloat16 raw
    19: np.float16, 22: np.uint32, 23: np.uint64,
}


# ---------------------------------------------------------------------------
# varint / protobuf primitives
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_proto_fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a serialized message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:       # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:     # fixed64
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == 2:     # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:     # fixed32
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _parse_shape(buf: bytes) -> List[int]:
    """TensorShapeProto: repeated Dim dim = 2; Dim.size = 1."""
    dims = []
    for field, _, val in _iter_proto_fields(buf):
        if field == 2:
            size = 0
            for f2, _, v2 in _iter_proto_fields(val):
                if f2 == 1:
                    size = v2
            dims.append(size)
    return dims


def _parse_bundle_entry(buf: bytes) -> dict:
    """BundleEntryProto: dtype=1, shape=2, shard_id=3, offset=4, size=5."""
    entry = {"dtype": 0, "shape": [], "shard_id": 0, "offset": 0, "size": 0}
    for field, _, val in _iter_proto_fields(buf):
        if field == 1:
            entry["dtype"] = val
        elif field == 2:
            entry["shape"] = _parse_shape(val)
        elif field == 3:
            entry["shard_id"] = val
        elif field == 4:
            entry["offset"] = val
        elif field == 5:
            entry["size"] = val
    return entry


# ---------------------------------------------------------------------------
# leveldb table reading
# ---------------------------------------------------------------------------

def _read_block_handle(buf: bytes, pos: int) -> Tuple[Tuple[int, int], int]:
    offset, pos = _read_varint(buf, pos)
    size, pos = _read_varint(buf, pos)
    return (offset, size), pos


def _read_block(data: bytes, handle: Tuple[int, int]) -> bytes:
    offset, size = handle
    block = data[offset : offset + size]
    ctype = data[offset + size]  # 1-byte compression type trailer
    if ctype == 0:
        return block
    if ctype == 1:  # snappy
        try:
            import snappy  # type: ignore

            return snappy.uncompress(block)
        except ImportError as e:
            raise RuntimeError(
                "checkpoint index block is snappy-compressed and python "
                "snappy is unavailable") from e
    raise ValueError(f"unknown block compression {ctype}")


def _iter_block_entries(block: bytes) -> Iterator[Tuple[bytes, bytes]]:
    """Iterate (key, value) of one leveldb data block."""
    if len(block) < 4:
        return
    num_restarts = struct.unpack_from("<I", block, len(block) - 4)[0]
    data_end = len(block) - 4 - 4 * num_restarts
    pos = 0
    key = b""
    while pos < data_end:
        shared, pos = _read_varint(block, pos)
        non_shared, pos = _read_varint(block, pos)
        value_len, pos = _read_varint(block, pos)
        key = key[:shared] + block[pos : pos + non_shared]
        pos += non_shared
        value = block[pos : pos + value_len]
        pos += value_len
        yield key, value


def _read_table(path: str) -> Dict[bytes, bytes]:
    """Read every (key, value) from a leveldb-format table file."""
    with open(path, "rb") as f:
        data = f.read()
    footer = data[-48:]
    magic = struct.unpack("<Q", footer[-8:])[0]
    if magic != _TABLE_MAGIC:
        raise ValueError(f"{path}: not a leveldb table (bad magic)")
    pos = 0
    _meta_handle, pos = _read_block_handle(footer, pos)
    index_handle, pos = _read_block_handle(footer, pos)
    index_block = _read_block(data, index_handle)
    out: Dict[bytes, bytes] = {}
    for _key, handle_bytes in _iter_block_entries(index_block):
        handle, _ = _read_block_handle(handle_bytes, 0)
        for k, v in _iter_block_entries(_read_block(data, handle)):
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def list_variables(prefix: str) -> Dict[str, dict]:
    """Map variable name -> {dtype, shape, shard_id, offset, size}."""
    entries = _read_table(prefix + ".index")
    out = {}
    for key, value in entries.items():
        if not key:  # header entry
            continue
        out[key.decode()] = _parse_bundle_entry(value)
    return out


def read_tf_checkpoint(prefix: str) -> Dict[str, np.ndarray]:
    """Load all tensors of a TF bundle checkpoint into numpy arrays."""
    variables = list_variables(prefix)
    shards = sorted(glob.glob(prefix + ".data-*-of-*"))
    if not shards:
        raise FileNotFoundError(f"no data shards for {prefix}")
    shard_bytes = [open(s, "rb").read() for s in shards]
    out: Dict[str, np.ndarray] = {}
    for name, e in variables.items():
        dtype = _TF_DTYPES.get(e["dtype"])
        if dtype is None or dtype is object:
            continue  # skip strings/unsupported
        raw = shard_bytes[e["shard_id"]][e["offset"] : e["offset"] + e["size"]]
        arr = np.frombuffer(raw, dtype=dtype)
        out[name] = arr.reshape(e["shape"]).copy()
    return out


# ---------------------------------------------------------------------------
# writer (test/drill fixture: fabricate a bundle in the real format)
# ---------------------------------------------------------------------------

def _write_varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _encode_bundle_entry(dtype: int, shape, shard: int, offset: int,
                         size: int) -> bytes:
    """BundleEntryProto wire encoding (fields: 1 dtype, 2 shape, 3 shard,
    4 offset, 5 size)."""
    msg = b"\x08" + _write_varint(dtype)
    shape_msg = b""
    for d in shape:
        dim = b"\x08" + _write_varint(int(d))            # Dim.size = 1
        shape_msg += b"\x12" + _write_varint(len(dim)) + dim
    msg += b"\x12" + _write_varint(len(shape_msg)) + shape_msg
    msg += b"\x18" + _write_varint(shard)
    msg += b"\x20" + _write_varint(offset)
    msg += b"\x28" + _write_varint(size)
    return msg


def _encode_block(entries) -> bytes:
    """LevelDB data block: full keys (no prefix sharing), one restart."""
    buf = b""
    for key, value in entries:
        buf += (_write_varint(0) + _write_varint(len(key))
                + _write_varint(len(value)) + key + value)
    buf += struct.pack("<I", 0)   # restart[0]
    buf += struct.pack("<I", 1)   # num_restarts
    return buf


def _encode_table(entries) -> bytes:
    """Minimal LevelDB table: one data block + index block + footer."""
    data_block = _encode_block(entries)
    out = data_block + b"\x00" + b"\x00\x00\x00\x00"   # type + crc
    data_handle = _write_varint(0) + _write_varint(len(data_block))
    index_block = _encode_block([(b"\xff\xff", data_handle)])
    index_off = len(out)
    out += index_block + b"\x00" + b"\x00\x00\x00\x00"
    meta_handle = _write_varint(index_off) + _write_varint(0)
    index_handle = _write_varint(index_off) + _write_varint(len(index_block))
    footer = meta_handle + index_handle
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", _TABLE_MAGIC)
    return out + footer


def write_tf_checkpoint(prefix: str, variables: Dict[str, np.ndarray]) -> None:
    """Write {name: float32 array} as a TF bundle (<prefix>.index +
    <prefix>.data-00000-of-00001) readable by read_tf_checkpoint AND by
    tf.train.Saver. Used to fabricate release-shaped checkpoints for the
    ingestion drill (the real artifact is weights/download_weights.sh:1-3
    in the reference)."""
    data = b""
    entries = [(b"", b"")]  # header entry
    for name in sorted(variables):
        v = np.asarray(variables[name], np.float32)
        entries.append((name.encode(),
                        _encode_bundle_entry(1, v.shape, 0, len(data),
                                             v.nbytes)))
        data += v.tobytes()
    with open(prefix + ".index", "wb") as f:
        f.write(_encode_table(entries))
    with open(prefix + ".data-00000-of-00001", "wb") as f:
        f.write(data)
