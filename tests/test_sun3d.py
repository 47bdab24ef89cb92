"""SUN3D ingestion tests on a synthetic sequence directory."""

import os

import h5py
import numpy as np
import pytest

from demon_tpu.tools.sun3d import (
    compute_sharpness,
    create_samples_from_sequence,
    read_Rt,
    read_depth,
    read_frameid_timestamp,
)


def test_read_frameid_timestamp():
    ids, ts = read_frameid_timestamp(["0000001-000111.jpg",
                                      "0000002-000222.jpg"])
    np.testing.assert_array_equal(ids, [1, 2])
    np.testing.assert_array_equal(ts, [111, 222])


def test_read_depth_shift_decode(tmp_path):
    """SUN3D depth pngs store millimeters circular-shifted by 3 bits."""
    from PIL import Image

    depth_m = np.array([[1.0, 2.5], [0.0, 4.0]], np.float32)
    mm = (depth_m * 1000).astype(np.uint16)
    encoded = ((mm << 3) | (mm >> 13)).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(encoded).save(p)
    out = read_depth(p)
    np.testing.assert_allclose(out, depth_m, atol=1e-3)


def test_read_Rt_inverts_cam_to_world():
    from demon_tpu.data.host_geometry import angleaxis_to_rotation_matrix

    rng = np.random.RandomState(0)
    Rcw = angleaxis_to_rotation_matrix(rng.randn(3))
    C = rng.randn(3)
    ext = np.hstack([Rcw, C.reshape(3, 1)])
    R, t = read_Rt(ext, 0)
    # world-to-cam: X_cam = R X_world + t; camera center maps to origin
    np.testing.assert_allclose(R @ C + t, 0.0, atol=1e-12)


@pytest.fixture
def synthetic_sun3d(tmp_path):
    """Minimal SUN3D sequence: 4 frames looking at a wall, small baselines."""
    from PIL import Image

    rng = np.random.RandomState(3)
    seq = tmp_path / "seq" / "part1"
    for sub in ("image", "depthTSDF", "extrinsics"):
        os.makedirs(seq / sub)
    H, W = 60, 80
    K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]])
    np.savetxt(seq / "intrinsics.txt", K)

    ext_rows = []
    base_img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    for i in range(4):
        # camera centers along x, looking down +z (identity rotation)
        C = np.array([0.05 * i, 0.0, 0.0])
        ext_rows.append(np.hstack([np.eye(3), C.reshape(3, 1)]))
        img = np.roll(base_img, shift=3 * i, axis=1)
        Image.fromarray(img).save(seq / "image" / f"{i:07d}-{i * 100:06d}.jpg")
        depth_m = np.full((H, W), 2.0, np.float32)
        mm = (depth_m * 1000).astype(np.uint16)
        enc = ((mm << 3) | (mm >> 13)).astype(np.uint16)
        Image.fromarray(enc).save(
            seq / "depthTSDF" / f"{i:07d}-{i * 100 + 10:06d}.png")
    np.savetxt(seq / "extrinsics" / "0000001.txt", np.vstack(ext_rows))
    return str(tmp_path), "seq/part1"


def test_create_samples_from_sequence(synthetic_sun3d, tmp_path):
    root, seq_name = synthetic_sun3d
    sharpness = compute_sharpness(root, seq_name)
    assert sharpness.shape == (4,)

    out = str(tmp_path / "out.h5")
    with h5py.File(out, "w") as f:
        n = create_samples_from_sequence(
            f, root, seq_name, (0.01, 0.30), sharpness, sharpness_window=1)
    assert n >= 1
    with h5py.File(out, "r") as f:
        groups = list(f.keys())
        assert groups
        g = f[groups[0]]
        t0 = g["frames"]["t0"]
        assert "viewpoint_pairs" in t0.attrs
        # at least two views with image/depth/camera datasets
        views = list(t0.keys())
        assert len(views) >= 2
        for v in views:
            assert set(t0[v].keys()) == {"image", "depth", "camera"}

    # the produced shard must feed the reader end to end
    from demon_tpu.data import MultiViH5DataReader

    params = {
        "batch_size": 1,
        "builder_threads": 1,
        "inverse_depth": True,
        "motion_format": "ANGLEAXIS6",
        "norm_trans_scale_depth": True,
        "scaled_height": 48,
        "scaled_width": 64,
        "scene_pool_size": 2,
        "top_output": ("IMAGE_PAIR", "MOTION", "DEPTH", "INTRINSICS"),
        "source": [{"path": out}],
    }
    with MultiViH5DataReader(params) as reader:
        batch = reader.get_batch(timeout=60)
    assert batch["IMAGE_PAIR"].shape == (1, 48, 64, 6)
    assert np.isfinite(batch["MOTION"]).all()


def test_safe_crop_image_matches_array_when_box_overflows_right():
    """A crop whose origin is positive but whose extent exceeds the image
    must shift the pasted content by the origin — exactly like
    safe_crop_array2d — so adjust_intrinsics keeps image and depth
    aligned (deliberate fix over the reference PIL path)."""
    from PIL import Image

    from demon_tpu.tools.helpers import safe_crop_array2d, safe_crop_image

    arr = np.arange(100 * 80, dtype=np.float32).reshape(80, 100)
    img = Image.fromarray(arr.astype(np.uint8), "L")
    box = (10, 0, 120, 50)  # x1 beyond width, x0 positive
    a = safe_crop_array2d(arr, box, 0.0)
    i = np.asarray(safe_crop_image(img, box, 0))
    assert a.shape == i.shape == (50, 110)
    np.testing.assert_array_equal(i[:, :90], arr[:50, 10:].astype(np.uint8))
    np.testing.assert_array_equal(a[:, :90], arr[:50, 10:])
    np.testing.assert_array_equal(i[:, 90:], 0)
