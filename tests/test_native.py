"""Native (C++) data-plane vs the numpy reference implementations.

Skipped when native/libdemon_native.so has not been built
(`make -C native`)."""

import numpy as np
import pytest

from demon_tpu.data import _native as native
from demon_tpu.data import host_geometry as hg
from demon_tpu.data.lz4 import lz4_compress_hc

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libdemon_native.so not built")


def _cams(rng):
    K1 = np.array([[0.9, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1.0]])
    K2 = np.array([[0.85, 0, 0.48], [0, 1.05, 0.52], [0, 0, 1.0]])
    R1 = hg.angleaxis_to_rotation_matrix(rng.randn(3) * 0.1)
    R2 = hg.angleaxis_to_rotation_matrix(rng.randn(3) * 0.1)
    t1 = rng.randn(3) * 0.2
    t2 = rng.randn(3) * 0.2
    return K1, R1, t1, K2, R2, t2


def test_lz4half_decode_matches_numpy():
    rng = np.random.RandomState(0)
    d = rng.uniform(0.1, 10.0, (33, 47)).astype(np.float16)
    comp = lz4_compress_hc(d.tobytes())
    out = native.lz4half_to_float(comp, d.size)
    np.testing.assert_array_equal(out.reshape(d.shape),
                                  d.astype(np.float32))


def test_webp_roundtrip():
    from demon_tpu.data.webp import webp_encode

    # smooth gradient image (webp is lossy; noise would not round-trip)
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack([yy * 4, xx * 3, (yy + xx) * 2], axis=-1).astype(np.uint8)
    data = webp_encode(img, quality=95)
    out = native.webp_decode_rgb(data)
    assert out.shape == img.shape
    assert np.abs(out.astype(float) - img).mean() < 8.0


def test_resize_nearest_matches_numpy():
    from demon_tpu.data.reader import _nearest_resize

    rng = np.random.RandomState(1)
    a = rng.rand(37, 53).astype(np.float32)
    out = native.resize_nearest_f32(a, 19, 27)
    np.testing.assert_array_equal(out, _nearest_resize(a, 19, 27))


def test_compute_flow_matches_numpy():
    rng = np.random.RandomState(2)
    K1, R1, t1, K2, R2, t2 = _cams(rng)
    depth = rng.uniform(1.0, 5.0, (24, 32)).astype(np.float32)
    depth[3, 4] = np.nan
    depth[5, 6] = 0.0
    got = native.compute_flow(depth, K1, R1, t1, K2, R2, t2)
    want = hg.compute_flow(depth, K1, R1, t1, K2, R2, t2)
    np.testing.assert_allclose(got, want, atol=2e-3, equal_nan=True)


def test_compute_depthmask_matches_numpy():
    rng = np.random.RandomState(3)
    K1, R1, t1, K2, R2, t2 = _cams(rng)
    depth = rng.uniform(1.0, 5.0, (24, 32)).astype(np.float32)
    got = native.compute_depthmask(depth, K1, R1, t1, K2, R2, t2, 3, 5)
    want = hg.compute_depthmask(depth, K1, R1, t1, K2, R2, t2, 3, 5)
    assert (got != want).mean() < 0.02  # boundary pixels may differ in fp


def test_ray_length_to_z_matches_numpy():
    rng = np.random.RandomState(4)
    K = np.array([[0.9, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1.0]])
    depth = rng.uniform(1.0, 5.0, (24, 32)).astype(np.float32)
    got = native.ray_length_to_z(depth, K)
    want = hg.ray_length_to_camera_z(depth, hg._pixel_K(K, 32, 24))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reader_uses_native(tmp_path):
    """End-to-end: reader batches identical (within fp) with and without
    the native path."""
    import h5py

    from demon_tpu.data import MultiViH5DataReader, View, write_view

    rng = np.random.RandomState(5)
    path = str(tmp_path / "d.h5")
    H, W = 48, 64
    yy, xx = np.mgrid[0:H, 0:W]
    with h5py.File(path, "w") as f:
        for v in range(2):
            img = np.stack([yy * 3 + v * 10, xx * 2, yy + xx],
                           axis=-1).astype(np.uint8)
            depth = rng.uniform(1.0, 4.0, (H, W)).astype(np.float32)
            K = np.array([[0.9 * W, 0, 0.5 * W], [0, 1.1 * H, 0.5 * H],
                          [0, 0, 1.0]])
            R = hg.angleaxis_to_rotation_matrix(rng.randn(3) * 0.05)
            t = rng.randn(3) * 0.3
            write_view(f.require_group(f"s/frames/t0/v{v}"),
                       View(R=R, t=t, K=K, image=img, depth=depth,
                            depth_metric="camera_z"))
        f["s/frames/t0"].attrs["viewpoint_pairs"] = np.array([0, 1], np.int32)

    params = {
        "batch_size": 1, "test_phase": True, "builder_threads": 1,
        "inverse_depth": True, "motion_format": "ANGLEAXIS6",
        "norm_trans_scale_depth": True, "scaled_height": 24,
        "scaled_width": 32, "scene_pool_size": 1,
        "top_output": ("IMAGE_PAIR", "MOTION", "FLOW", "DEPTH",
                       "INTRINSICS", "DEPTHMASKS"),
        "source": [{"path": path}],
    }
    with MultiViH5DataReader(params) as r:
        b_native = r.get_batch(timeout=60)

    # force the numpy path
    native._lib, native._tried = None, True
    try:
        with MultiViH5DataReader(params) as r:
            b_py = r.get_batch(timeout=60)
    finally:
        native._tried = False

    np.testing.assert_allclose(b_native["DEPTH"], b_py["DEPTH"], rtol=1e-5,
                               equal_nan=True)
    np.testing.assert_allclose(b_native["FLOW"], b_py["FLOW"], atol=1e-2,
                               equal_nan=True)
    np.testing.assert_allclose(b_native["MOTION"], b_py["MOTION"], atol=1e-6)
    # decoder settings (loop filter / fancy upsampling) and the box filter
    # differ slightly between libwebp-direct and PIL paths
    assert np.abs(b_native["IMAGE_PAIR"] - b_py["IMAGE_PAIR"]).mean() < 0.01


def test_assemble_image_pair_matches_numpy():
    rng = np.random.RandomState(7)
    h, w = 24, 32
    i1 = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    i2 = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    for rot, mir in ((0, 0), (1, 0), (0, 1), (1, 1)):
        got = native.assemble_image_pair(i1, i2, -0.5, 1.0, rot, mir)
        want = np.concatenate([i1, i2], -1).astype(np.float32) / 255.0 - 0.5
        if rot:
            want = want[::-1, ::-1]
        if mir:
            want = want[:, ::-1]
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_prepare_depth_matches_numpy():
    rng = np.random.RandomState(8)
    d = rng.uniform(0.5, 10.0, (24, 32)).astype(np.float32)
    d[0, 0] = 0.0
    d[1, 1] = np.nan
    d[2, 2] = 20.0  # above max
    d[3, 3] = 0.6   # below min
    got = native.prepare_depth(d, 2.0, True, 0.7, 15.0, 1, 1)
    invalid = (d == 0) | (d > 15.0) | (d < 0.7) | ~np.isfinite(d)
    want = 1.0 / (d * 2.0)
    want[invalid] = np.nan
    want = want[::-1, ::-1][:, ::-1]
    np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True)


def test_cached_reader_matches_uncached(tmp_path):
    """Batches from the pre-decoded cache must match the h5 decode path."""
    import h5py

    from demon_tpu.data import MultiViH5DataReader, View, write_view
    from demon_tpu.data.cache import build_scene_cache

    rng = np.random.RandomState(9)
    path = str(tmp_path / "c.h5")
    H, W = 48, 64
    yy, xx = np.mgrid[0:H, 0:W]
    with h5py.File(path, "w") as f:
        for v in range(2):
            img = np.stack([yy * 3 + v * 11, xx * 2, yy + xx],
                           -1).astype(np.uint8)
            depth = rng.uniform(1.0, 4.0, (H, W)).astype(np.float32)
            K = np.array([[0.9 * W, 0, 0.5 * W], [0, 1.1 * H, 0.5 * H],
                          [0, 0, 1.0]])
            R = hg.angleaxis_to_rotation_matrix(rng.randn(3) * 0.05)
            t = rng.randn(3) * 0.3
            write_view(f.require_group(f"s/frames/t0/v{v}"),
                       View(R=R, t=t, K=K, image=img, depth=depth,
                            depth_metric="camera_z"))
        f["s/frames/t0"].attrs["viewpoint_pairs"] = np.array([0, 1], np.int32)

    cache_dir = str(tmp_path / "cache")
    build_scene_cache(path, cache_dir, 48, 64, verbose=False)

    base = {
        "batch_size": 1, "test_phase": True, "builder_threads": 1,
        "inverse_depth": True, "motion_format": "ANGLEAXIS6",
        "norm_trans_scale_depth": True, "scaled_height": 48,
        "scaled_width": 64, "scene_pool_size": 1,
        "top_output": ("IMAGE_PAIR", "MOTION", "DEPTH", "INTRINSICS"),
        "source": [{"path": path}],
    }
    with MultiViH5DataReader(base) as r:
        plain = r.get_batch(timeout=60)
    with MultiViH5DataReader({**base, "cache_dir": cache_dir}) as r:
        cached = r.get_batch(timeout=60)

    np.testing.assert_allclose(cached["MOTION"], plain["MOTION"], atol=1e-6)
    np.testing.assert_allclose(cached["INTRINSICS"], plain["INTRINSICS"],
                               atol=1e-6)
    # image path identical (same u8 source)
    np.testing.assert_allclose(cached["IMAGE_PAIR"], plain["IMAGE_PAIR"],
                               atol=3e-3)
    # depth via fp16 cache storage
    np.testing.assert_allclose(cached["DEPTH"], plain["DEPTH"], rtol=2e-3,
                               equal_nan=True)


def test_lz4half_decode_subnormals_and_specials():
    """fp16 subnormals (exponent 0, mantissa != 0) must decode to their
    exact IEEE values — the old normalization was off by one exponent bit
    (returned half the value); also pin zeros, inf and nan."""
    bits = np.array([0x0001, 0x0200, 0x03FF,        # subnormals
                     0x0000, 0x8000,                # +-0
                     0x0400, 0x3C00, 0xBC00,        # smallest normal, +-1
                     0x7C00, 0xFC00, 0x7E00],       # +-inf, nan
                    np.uint16)
    d = bits.view(np.float16)
    comp = lz4_compress_hc(d.tobytes())
    out = native.lz4half_to_float(comp, d.size)
    np.testing.assert_array_equal(out, d.astype(np.float32))
