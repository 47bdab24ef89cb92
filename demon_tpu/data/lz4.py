"""ctypes binding to the system liblz4 (reference: dataset_tools/lz4.py
binds the same three entry points against a self-built liblz4).

Used for the ``lz4half`` depth codec of the multi-view H5 format.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    name = ctypes.util.find_library("lz4") or "liblz4.so.1"
    lib = ctypes.CDLL(name)
    lib.LZ4_decompress_safe.restype = ctypes.c_int
    lib.LZ4_decompress_safe.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int
    ]
    lib.LZ4_compress_HC.restype = ctypes.c_int
    lib.LZ4_compress_HC.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.LZ4_compressBound.restype = ctypes.c_int
    lib.LZ4_compressBound.argtypes = [ctypes.c_int]
    _lib = lib
    return lib


def lz4_compress_bound(size: int) -> int:
    return _load().LZ4_compressBound(size)


def lz4_compress_hc(data: bytes, compression_level: int = 9) -> bytes:
    """LZ4 high-compression encode (reference dataset_tools/lz4.py:52-66)."""
    lib = _load()
    bound = lib.LZ4_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = lib.LZ4_compress_HC(data, out, len(data), bound, compression_level)
    if n <= 0:
        raise RuntimeError("LZ4_compress_HC failed")
    return out.raw[:n]


def lz4_uncompress(data: bytes, uncompressed_size: int) -> bytes:
    """LZ4 block decode (reference dataset_tools/lz4.py:33-49)."""
    lib = _load()
    out = ctypes.create_string_buffer(uncompressed_size)
    n = lib.LZ4_decompress_safe(data, out, len(data), uncompressed_size)
    if n < 0:
        raise RuntimeError(f"LZ4_decompress_safe failed ({n})")
    return out.raw[:n]
