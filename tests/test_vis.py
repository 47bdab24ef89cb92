"""Visualization tests: point-cloud backprojection and PLY export."""

import numpy as np

from demon_tpu.vis import (
    camera_mesh,
    compute_point_cloud_from_depthmap,
    export_prediction_to_ply,
    transform_pointcloud_points,
    write_ply,
)


def test_point_cloud_identity_camera():
    h, w = 8, 10
    depth = np.full((h, w), 2.0, np.float32)
    depth[0, 0] = np.nan
    depth[1, 1] = 0.0
    K = np.array([[10.0, 0, w / 2], [0, 10.0, h / 2], [0, 0, 1]])
    cloud = compute_point_cloud_from_depthmap(depth, K, np.eye(3), np.zeros(3))
    assert cloud["points"].shape == (h * w - 2, 3)
    np.testing.assert_allclose(cloud["points"][:, 2], 2.0)
    # center pixel maps near the optical axis
    center_idx = np.argmin(np.abs(cloud["points"][:, 0]) +
                           np.abs(cloud["points"][:, 1]))
    assert np.linalg.norm(cloud["points"][center_idx, :2]) < 0.2


def test_point_cloud_extrinsics_roundtrip():
    """A world point seen by a posed camera must back-project to itself."""
    rng = np.random.RandomState(0)
    from demon_tpu.data.host_geometry import angleaxis_to_rotation_matrix

    R = angleaxis_to_rotation_matrix(rng.randn(3) * 0.3)
    t = rng.randn(3)
    K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1]])
    # depth map of a plane at z_cam = 3
    depth = np.full((48, 64), 3.0, np.float32)
    cloud = compute_point_cloud_from_depthmap(depth, K, R, t)
    # reproject a world point: K (R X + t) should land in the image with z=3
    X = cloud["points"][100]
    p = K @ (R @ X + t)
    assert abs(p[2] - 3.0) < 1e-4
    u, v = p[0] / p[2], p[1] / p[2]
    assert 0 <= u <= 64 and 0 <= v <= 48


def test_ply_export(tmp_path):
    depth = np.full((6, 8), 1.5, np.float32)
    inv_depth = 1.0 / depth
    image = np.zeros((6, 8, 3), np.float32)  # NHWC in [-0.5, 0.5]
    prefix = str(tmp_path / "pred_")
    export_prediction_to_ply(prefix, inv_depth, rotation=np.zeros(3),
                             translation=np.array([1.0, 0, 0]), image=image)
    data = open(prefix + "points.ply", "rb").read()
    assert data.startswith(b"ply\nformat binary_little_endian")
    assert b"element vertex 48" in data
    cam = open(prefix + "cam2.ply", "rb").read()
    assert b"element face 6" in cam


def test_transform_points():
    pts = np.array([[1.0, 2.0, 3.0]])
    T = np.eye(4)
    T[:3, 3] = [1, 1, 1]
    np.testing.assert_allclose(transform_pointcloud_points(pts, T),
                               [[2.0, 3.0, 4.0]])


def test_camera_mesh_world_position():
    """The glyph apex must sit at the camera center -R^T t."""
    from demon_tpu.data.host_geometry import angleaxis_to_rotation_matrix

    R = angleaxis_to_rotation_matrix(np.array([0.1, -0.2, 0.3]))
    t = np.array([0.5, -1.0, 2.0])
    verts, tris = camera_mesh(R, t)
    np.testing.assert_allclose(verts[0], -(R.T @ t) @ np.eye(3), atol=1e-6)
    assert tris.shape == (6, 3)
