"""Misc image helpers (reference dataset_tools/helpers.py:23-136)."""

from __future__ import annotations

import numpy as np


def measure_sharpness(img) -> float:
    """Variance of the Laplacian; higher = sharper
    (reference helpers.py:23-31)."""
    from scipy.ndimage import laplace

    if isinstance(img, np.ndarray):
        if img.ndim == 3:
            # ITU-R 601 luma, same as PIL convert('L')
            gray = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
        else:
            gray = img
        gray = gray.astype(np.float32)
    else:
        gray = np.array(img.convert("L"), dtype=np.float32)
    return float(np.var(laplace(gray)))


def concat_images_vertical(images):
    """(reference helpers.py:34-51)"""
    from PIL import Image

    total_width = max(i.size[0] for i in images)
    total_height = sum(i.size[1] for i in images)
    result = Image.new("RGB", (total_width, total_height))
    y = 0
    for img in images:
        result.paste(img, (0, y))
        y += img.size[1]
    return result


def concat_images_horizontal(images):
    """(reference helpers.py:54-71)"""
    from PIL import Image

    total_width = sum(i.size[0] for i in images)
    total_height = max(i.size[1] for i in images)
    result = Image.new("RGB", (total_width, total_height))
    x = 0
    for img in images:
        result.paste(img, (x, 0))
        x += img.size[0]
    return result


def safe_crop_image(image, box, fill_value):
    """Crop with border fill when the box exceeds the image
    (reference helpers.py:74-103).

    Deliberate fix over the reference: its PIL path pastes the source at
    max(0, -x0) so a POSITIVE x0/y0 with an out-of-range x1/y1 leaves the
    crop unshifted — misaligned with safe_crop_array2d (which offsets the
    source correctly) and hence with the depth map in adjust_intrinsics.
    Pasting at (-x0, -y0) (PIL clips negative offsets) makes the two
    paths agree."""
    from PIL import Image

    x0, y0, x1, y1 = box
    if x0 >= 0 and y0 >= 0 and x1 < image.width and y1 < image.height:
        return image.crop(box)
    tmp = Image.new(image.mode, (x1 - x0, y1 - y0), fill_value)
    tmp.paste(image, (-x0, -y0))
    return tmp


def safe_crop_array2d(arr, box, fill_value):
    """Crop a 2-D array with border fill (reference helpers.py:106-136).
    Box is (x0, y0, x1, y1) — x is the column."""
    x0, y0, x1, y1 = box
    if x0 >= 0 and y0 >= 0 and x1 < arr.shape[1] and y1 < arr.shape[0]:
        return arr[y0:y1, x0:x1]
    tmp = np.full((y1 - y0, x1 - x0), fill_value, dtype=arr.dtype)
    sx0 = max(0, min(x0, arr.shape[1] - 1))
    sy0 = max(0, min(y0, arr.shape[0] - 1))
    sx1 = max(0, min(x1, arr.shape[1]))
    sy1 = max(0, min(y1, arr.shape[0]))
    x = -x0 if x0 < 0 else 0
    y = -y0 if y0 < 0 else 0
    tmp[y : y + sy1 - sy0, x : x + sx1 - sx0] = arr[sy0:sy1, sx0:sx1]
    return tmp
