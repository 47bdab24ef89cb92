"""ctypes binding to libdemon_native.so (native/demon_native.cpp) — the
C++ data-plane: LZ4+fp16 depth decode, WebP decode, resize, and the
per-pixel reprojection kernels with OpenMP.

The library is an accelerator: `available()` gates every entry point and
callers fall back to the numpy implementations in host_geometry / the
PIL codecs. Build with `make -C native`; override the path with
DEMON_NATIVE_LIB (mirrors the reference's MULTIVIH5DATAREADEROP_LIB env
override, datareader/__init__.py:23-26)."""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_lib = None
_tried = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    candidates = []
    env = os.environ.get("DEMON_NATIVE_LIB")
    if env:
        candidates.append(env)
    candidates.append(os.path.join(_REPO_ROOT, "native", "libdemon_native.so"))
    for path in candidates:
        if os.path.isfile(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            _declare(lib)
            _lib = lib
            break
    return _lib


def _declare(lib):
    c = ctypes
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.demon_lz4half_to_float.restype = c.c_int
    lib.demon_lz4half_to_float.argtypes = [c.c_char_p, c.c_int, f32p, c.c_int]
    lib.demon_webp_info.restype = c.c_int
    lib.demon_webp_info.argtypes = [c.c_char_p, c.c_size_t,
                                    c.POINTER(c.c_int), c.POINTER(c.c_int)]
    lib.demon_webp_decode_rgb.restype = c.c_int
    lib.demon_webp_decode_rgb.argtypes = [c.c_char_p, c.c_size_t, u8p,
                                          c.c_int, c.c_int]
    lib.demon_resize_nearest_f32.restype = None
    lib.demon_resize_nearest_f32.argtypes = [f32p, c.c_int, c.c_int, f32p,
                                             c.c_int, c.c_int]
    lib.demon_resize_area_rgb8.restype = None
    lib.demon_resize_area_rgb8.argtypes = [u8p, c.c_int, c.c_int, u8p,
                                           c.c_int, c.c_int]
    lib.demon_compute_flow.restype = None
    lib.demon_compute_flow.argtypes = [f32p, c.c_int, c.c_int,
                                       f64p, f64p, f64p, f64p, f64p, f64p, f32p]
    lib.demon_compute_depthmask.restype = None
    lib.demon_compute_depthmask.argtypes = [f32p, c.c_int, c.c_int,
                                            f64p, f64p, f64p, f64p, f64p, f64p,
                                            c.c_int, c.c_int, f32p]
    lib.demon_ray_length_to_z.restype = None
    lib.demon_ray_length_to_z.argtypes = [f32p, c.c_int, c.c_int, f64p]
    lib.demon_assemble_image_pair.restype = None
    lib.demon_assemble_image_pair.argtypes = [
        u8p, u8p, c.c_int, c.c_int, c.c_float, c.c_float, c.c_int, c.c_int,
        f32p]
    lib.demon_prepare_depth.restype = None
    lib.demon_prepare_depth.argtypes = [
        f32p, c.c_int, c.c_int, c.c_float, c.c_int, c.c_float, c.c_float,
        c.c_int, c.c_int, f32p]
    vpp = c.POINTER(c.c_void_p)
    lib.demon_build_batch.restype = None
    lib.demon_build_batch.argtypes = [
        vpp, vpp, vpp, c.c_int, c.c_int, c.c_int, c.c_float, c.c_float,
        f32p, c.c_int, c.c_float, c.c_float, u8p, u8p,
        c.c_void_p, c.c_void_p]


def available() -> bool:
    return _load() is not None


def lz4half_to_float(data: bytes, count: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(count, np.float32)
    if lib.demon_lz4half_to_float(data, len(data), out, count) != 0:
        raise RuntimeError("native lz4half decode failed")
    return out


def webp_decode_rgb(data: bytes) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.demon_webp_info(data, len(data), ctypes.byref(w),
                           ctypes.byref(h)) != 0:
        raise RuntimeError("native webp info failed")
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.demon_webp_decode_rgb(data, len(data), out, w.value, h.value) != 0:
        raise RuntimeError("native webp decode failed")
    return out


def resize_nearest_f32(src: np.ndarray, dh: int, dw: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    out = np.empty((dh, dw), np.float32)
    lib.demon_resize_nearest_f32(src, src.shape[0], src.shape[1], out, dh, dw)
    return out


def resize_area_rgb8(src: np.ndarray, dh: int, dw: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    out = np.empty((dh, dw, 3), np.uint8)
    lib.demon_resize_area_rgb8(src, src.shape[0], src.shape[1], out, dh, dw)
    return out


def _norm_intr(Kn: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(
        [Kn[0, 0], Kn[1, 1], Kn[0, 2], Kn[1, 2]], dtype=np.float64)


def compute_flow(depth, K1n, R1, t1, K2n, R2, t2) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    depth = np.ascontiguousarray(depth, np.float32)
    h, w = depth.shape
    out = np.empty((h, w, 2), np.float32)
    lib.demon_compute_flow(
        depth, h, w, _norm_intr(np.asarray(K1n)),
        np.ascontiguousarray(R1, np.float64),
        np.ascontiguousarray(t1, np.float64),
        _norm_intr(np.asarray(K2n)),
        np.ascontiguousarray(R2, np.float64),
        np.ascontiguousarray(t2, np.float64), out)
    return out


def compute_depthmask(depth, K1n, R1, t1, K2n, R2, t2, border1, border2
                      ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    depth = np.ascontiguousarray(depth, np.float32)
    h, w = depth.shape
    out = np.empty((h, w), np.float32)
    lib.demon_compute_depthmask(
        depth, h, w, _norm_intr(np.asarray(K1n)),
        np.ascontiguousarray(R1, np.float64),
        np.ascontiguousarray(t1, np.float64),
        _norm_intr(np.asarray(K2n)),
        np.ascontiguousarray(R2, np.float64),
        np.ascontiguousarray(t2, np.float64),
        int(border1), int(border2), out)
    return out


def assemble_image_pair(img1_u8: np.ndarray, img2_u8: np.ndarray,
                        range_min: float, range_span: float,
                        rot180: bool, mirror_x: bool,
                        out: Optional[np.ndarray] = None
                        ) -> Optional[np.ndarray]:
    """Fused u8->float + RGBRGB concat + flips; [h,w,3]x2 -> [h,w,6].
    `out` may be a preallocated contiguous [h,w,6] float32 view (e.g. a
    batch-buffer slot) to skip the extra copy."""
    lib = _load()
    if lib is None:
        return None
    img1_u8 = np.ascontiguousarray(img1_u8, np.uint8)
    img2_u8 = np.ascontiguousarray(img2_u8, np.uint8)
    h, w = img1_u8.shape[:2]
    if out is None:
        out = np.empty((h, w, 6), np.float32)
    assert out.flags.c_contiguous and out.dtype == np.float32
    lib.demon_assemble_image_pair(img1_u8, img2_u8, h, w,
                                  float(range_min), float(range_span),
                                  int(rot180), int(mirror_x), out)
    return out


def prepare_depth(depth: np.ndarray, scale: float, inverse: bool,
                  min_d: float, max_d: float, rot180: bool,
                  mirror_x: bool,
                  out: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    """Fused depth invalidation/scale/inversion/flips."""
    lib = _load()
    if lib is None:
        return None
    depth = np.ascontiguousarray(depth, np.float32)
    h, w = depth.shape
    if out is None:
        out = np.empty((h, w), np.float32)
    assert out.flags.c_contiguous and out.dtype == np.float32
    lib.demon_prepare_depth(depth, h, w, float(scale), int(inverse),
                            float(min_d), float(max_d), int(rot180),
                            int(mirror_x), out)
    return out


def build_batch(img1s, img2s, depths, h: int, w: int,
                range_min: float, range_span: float,
                depth_scales: np.ndarray, inverse: bool,
                min_d: float, max_d: float,
                rot180s: np.ndarray, mirror_xs: np.ndarray,
                out_images: Optional[np.ndarray],
                out_depths: Optional[np.ndarray]) -> bool:
    """Whole-batch IMAGE_PAIR + DEPTH fill in one GIL-released OpenMP call.

    img1s/img2s: lists of [h,w,3] uint8 arrays (or None per item);
    depths: list of [h,w] float32 arrays (or None);
    out_images: [n,h,w,6] float32; out_depths: [n,h,w(,1)] float32.
    The caller must keep the source arrays alive across the call.
    """
    lib = _load()
    if lib is None:
        return False
    n = len(img1s)
    c_void = ctypes.c_void_p

    def ptrs(arrs):
        a = (c_void * n)()
        for i, arr in enumerate(arrs):
            a[i] = arr.ctypes.data if arr is not None else None
        return ctypes.cast(a, ctypes.POINTER(c_void))

    lib.demon_build_batch(
        ptrs(img1s), ptrs(img2s), ptrs(depths), n, h, w,
        float(range_min), float(range_span),
        np.ascontiguousarray(depth_scales, np.float32), int(inverse),
        float(min_d), float(max_d),
        np.ascontiguousarray(rot180s, np.uint8),
        np.ascontiguousarray(mirror_xs, np.uint8),
        out_images.ctypes.data if out_images is not None else None,
        out_depths.ctypes.data if out_depths is not None else None)
    return True


def ray_length_to_z(depth: np.ndarray, Kn: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.ascontiguousarray(depth, np.float32).copy()
    lib.demon_ray_length_to_z(out, out.shape[0], out.shape[1],
                              _norm_intr(np.asarray(Kn)))
    return out
