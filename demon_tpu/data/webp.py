"""WebP codec for the multi-view H5 image datasets.

The reference binds libwebp directly (dataset_tools/webp.py, and decodes
with no_fancy_upsampling in the C++ reader, multivih5datareader.cpp:
1411-1432). Pillow links the same libwebp, so we use it for both directions
and keep a bytes-in/array-out interface.
"""

from __future__ import annotations

import io

import numpy as np
from PIL import Image


def webp_decode(data: bytes) -> np.ndarray:
    """Decode a webp byte string to an RGB uint8 array [H, W, 3]."""
    img = Image.open(io.BytesIO(bytes(data)))
    return np.asarray(img.convert("RGB"))


def webp_encode(array: np.ndarray, quality: float = 90.0) -> bytes:
    """Encode an RGB uint8 array as webp bytes
    (reference dataset_tools/webp.py:34-76 wraps WebPEncodeRGB)."""
    if array.dtype != np.uint8:
        raise ValueError("webp_encode expects uint8")
    buf = io.BytesIO()
    Image.fromarray(array).save(buf, format="WEBP", quality=int(quality))
    return buf.getvalue()


def webp_get_info(data: bytes):
    """Return (width, height) without a full decode."""
    img = Image.open(io.BytesIO(bytes(data)))
    return img.size  # (W, H)
