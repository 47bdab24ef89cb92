"""Point clouds from depth maps + PLY export (vectorized port of the
reference vis_cython.pyx:24-173 and vis.py:23-419)."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# DeMoN's default (sun3d) normalized intrinsics (reference vis.py:253)
_DEFAULT_INTRINSICS = np.array([0.89115971, 1.18821287, 0.5, 0.5])


def compute_point_cloud_from_depthmap(depth, K, R, t, normals=None,
                                      colors=None) -> Dict[str, np.ndarray]:
    """Back-project a depth map to a world-frame point cloud.

    depth: [H, W] absolute depth (camera_z); invalid = NaN or <= 0.
    K: [3, 3] pixel-unit intrinsics; R, t: world-to-camera extrinsics.
    normals: optional [3, H, W]; colors: optional uint8 [3, H, W].

    Returns dict with 'points' [N, 3] (+ 'normals', 'colors'); matches the
    reference convention X_world = R^T (X_cam - t), pixel centers at +0.5
    (vis_cython.pyx:70-79).
    """
    depth = np.asarray(depth, np.float32)
    K = np.asarray(K, np.float32)
    R = np.asarray(R, np.float32)
    t = np.asarray(t, np.float32)
    h, w = depth.shape
    valid = np.isfinite(depth) & (depth > 0)
    ys, xs = np.nonzero(valid)
    d = depth[ys, xs]
    cam = np.stack([
        d * ((xs + 0.5) - K[0, 2]) / K[0, 0],
        d * ((ys + 0.5) - K[1, 2]) / K[1, 1],
        d,
    ], axis=-1) - t
    points = cam @ R  # == (R^T @ cam^T)^T
    result = {"points": points.astype(np.float32)}
    if normals is not None:
        n = np.asarray(normals, np.float32)[:, ys, xs].T
        result["normals"] = (n @ R).astype(np.float32)
    if colors is not None:
        # ascontiguousarray: the fancy-index transpose is F-ordered, which
        # vtk's numpy_to_vtk and .view(np.uint8) both reject
        result["colors"] = np.ascontiguousarray(
            np.asarray(colors)[:, ys, xs].T.astype(np.uint8))
    return result


def transform_pointcloud_points(points: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Apply a 4x4 transform (reference vis.py:409-419)."""
    homog = np.concatenate([points, np.ones_like(points[:, :1])], axis=1)
    return (T @ homog.T)[:3].T


# camera glyph vertices/triangles (reference create_camera_polydata,
# vis.py:50-140; scaled 0.25, transformed to world frame)
_CAM_POINTS = np.array([
    [0, 0, 0], [-1, -1, 1.5], [1, -1, 1.5], [1, 1, 1.5], [-1, 1, 1.5],
    [-0.5, 1, 1.5], [0.5, 1, 1.5], [0, 1.2, 1.5],
    [1, -0.5, 1.5], [1, 0.5, 1.5], [1.2, 0, 1.5],
])
_CAM_TRIS = np.array([
    [0, 1, 4],   # left
    [0, 3, 2],   # right
    [0, 4, 3],   # top
    [0, 2, 1],   # bottom
    [5, 6, 7],   # up indicator
    [8, 10, 9],  # x-axis indicator
])


def camera_mesh(R, t, scale: float = 0.25):
    """(vertices [11,3] world frame, triangles [6,3]) camera glyph."""
    pts = (scale * _CAM_POINTS - np.asarray(t)) @ np.asarray(R)
    return pts.astype(np.float32), _CAM_TRIS.copy()


def write_ply(path: str, points: np.ndarray, colors=None, normals=None,
              faces=None):
    """Minimal binary-little-endian PLY writer (replaces vtkPLYWriter)."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if normals is not None:
        header += ["property float nx", "property float ny", "property float nz"]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    if faces is not None:
        header += [f"element face {len(faces)}",
                   "property list uchar int vertex_indices"]
    header.append("end_header")

    # interleave per-vertex data as raw bytes
    fields = [points.astype("<f4")]
    if normals is not None:
        fields.append(np.asarray(normals, "<f4"))
    vertex_bytes = np.concatenate(
        [np.ascontiguousarray(f).view(np.uint8).reshape(n, -1)
         for f in fields], axis=1)
    if colors is not None:
        vertex_bytes = np.concatenate(
            [vertex_bytes, np.asarray(colors, np.uint8).reshape(n, 3)], axis=1)

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        f.write(vertex_bytes.tobytes())
        if faces is not None:
            faces = np.asarray(faces, "<i4")
            counts = np.full((len(faces), 1), faces.shape[1], np.uint8)
            face_bytes = np.concatenate(
                [counts, np.ascontiguousarray(faces).view(np.uint8)
                 .reshape(len(faces), -1)], axis=1)
            f.write(face_bytes.tobytes())


def _prepare(inverse_depth, intrinsics, normals, rotation, translation, image):
    from ..data.host_geometry import angleaxis_to_rotation_matrix

    depth = (1.0 / np.asarray(inverse_depth)).squeeze()
    h, w = depth.shape[-2], depth.shape[-1]
    if intrinsics is None:
        intrinsics = _DEFAULT_INTRINSICS
    K = np.eye(3)
    K[0, 0] = intrinsics[0] * w
    K[1, 1] = intrinsics[1] * h
    K[0, 2] = intrinsics[2] * w
    K[1, 2] = intrinsics[3] * h
    R1, t1 = np.eye(3), np.zeros(3)
    if rotation is not None and translation is not None:
        R2 = angleaxis_to_rotation_matrix(np.asarray(rotation).squeeze())
        t2 = np.asarray(translation).squeeze()
    else:
        R2, t2 = np.eye(3), np.zeros(3)
    n = None if normals is None else np.asarray(normals).squeeze()
    img = None
    if image is not None:
        img = np.clip((np.asarray(image).squeeze() + 0.5) * 255.0,
                      0, 255).astype(np.uint8)  # no uint8 wraparound
        if img.ndim == 3 and img.shape[-1] == 3:  # accept NHWC
            img = np.transpose(img, (2, 0, 1))
    return depth, K, R1, t1, R2, t2, n, img


def export_prediction_to_ply(output_prefix: str, inverse_depth,
                             intrinsics=None, normals=None, rotation=None,
                             translation=None, image=None):
    """Write <prefix>points.ply, <prefix>cam1.ply, <prefix>cam2.ply
    (reference vis.py:322-405)."""
    depth, K, R1, t1, R2, t2, n, img = _prepare(
        inverse_depth, intrinsics, normals, rotation, translation, image)
    cloud = compute_point_cloud_from_depthmap(depth, K, R1, t1, n, img)
    os.makedirs(os.path.dirname(output_prefix) or ".", exist_ok=True)
    write_ply(output_prefix + "points.ply", cloud["points"],
              colors=cloud.get("colors"), normals=cloud.get("normals"))
    for name, (R, t) in (("cam1", (R1, t1)), ("cam2", (R2, t2))):
        verts, tris = camera_mesh(R, t)
        write_ply(output_prefix + name + ".ply", verts, faces=tris)


def visualize_prediction(inverse_depth, intrinsics=None, normals=None,
                         rotation=None, translation=None, image=None,
                         output_prefix: str = "prediction_"):
    """Interactive VTK viewer when vtk is importable (reference
    vis.py:223-319); otherwise falls back to PLY export."""
    try:
        import vtk  # noqa: F401
    except ImportError:
        export_prediction_to_ply(output_prefix, inverse_depth, intrinsics,
                                 normals, rotation, translation, image)
        print(f"vtk not available; exported point cloud to "
              f"{output_prefix}{{points,cam1,cam2}}.ply")
        return
    # VTK path (only reachable with a user-provided vtk install)
    depth, K, R1, t1, R2, t2, n, img = _prepare(
        inverse_depth, intrinsics, normals, rotation, translation, image)
    cloud = compute_point_cloud_from_depthmap(depth, K, R1, t1, n, img)
    _vtk_show(cloud, (R1, t1), (R2, t2))


def _vtk_show(cloud, cam1, cam2):
    import vtk
    from vtk.util.numpy_support import numpy_to_vtk

    renderer = vtk.vtkRenderer()
    renderer.SetBackground(0, 0, 0)

    vpoints = vtk.vtkPoints()
    vpoints.SetData(numpy_to_vtk(cloud["points"]))
    poly = vtk.vtkPolyData()
    poly.SetPoints(vpoints)
    cells = vtk.vtkCellArray()
    for i in range(cloud["points"].shape[0]):
        cells.InsertNextCell(1)
        cells.InsertCellPoint(i)
    poly.SetVerts(cells)
    if "colors" in cloud:
        vcolors = numpy_to_vtk(cloud["colors"])
        vcolors.SetName("Colors")
        poly.GetPointData().SetScalars(vcolors)
    mapper = vtk.vtkPolyDataMapper()
    mapper.SetInputData(poly)
    actor = vtk.vtkActor()
    actor.SetMapper(mapper)
    actor.GetProperty().SetPointSize(2)
    renderer.AddActor(actor)

    for (R, t), rgb in ((cam1, (1.0, 0.2, 0.2)), (cam2, (0.2, 1.0, 0.2))):
        verts, tris = camera_mesh(R, t)
        cpoints = vtk.vtkPoints()
        cpoints.SetData(numpy_to_vtk(
            np.ascontiguousarray(verts.astype(np.float32))))
        cpoly = vtk.vtkPolyData()
        cpoly.SetPoints(cpoints)
        ccells = vtk.vtkCellArray()
        for tri in tris:
            ccells.InsertNextCell(3)
            for v in tri:
                ccells.InsertCellPoint(int(v))
        cpoly.SetPolys(ccells)
        cmapper = vtk.vtkPolyDataMapper()
        cmapper.SetInputData(cpoly)
        cactor = vtk.vtkActor()
        cactor.SetMapper(cmapper)
        cactor.GetProperty().SetColor(*rgb)
        cactor.GetProperty().SetRepresentationToWireframe()
        renderer.AddActor(cactor)

    renwin = vtk.vtkRenderWindow()
    renwin.SetWindowName("Point Cloud Viewer")
    renwin.SetSize(800, 600)
    renwin.AddRenderer(renderer)
    interactor = vtk.vtkRenderWindowInteractor()
    interactor.SetInteractorStyle(vtk.vtkInteractorStyleTrackballCamera())
    interactor.SetRenderWindow(renwin)
    interactor.Initialize()
    interactor.Start()
