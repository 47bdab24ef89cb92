"""Synthetic scene generator tests (tools/synthetic.py).

The layered generator is the accuracy anchor for egress-less convergence
runs, so its ground truth must be *provably* consistent: images rendered
by ray casting must photometrically agree with the flow implied by the
rendered depth + camera motion (the same consistency contract the
reference's real datasets satisfy by construction), and occlusion must
actually exist (the whole point of the layered scenes).
"""

import numpy as np
import pytest

from demon_tpu.data import MultiViH5DataReader
from demon_tpu.data import host_geometry as hg
from demon_tpu.tools.synthetic import (
    _INTR,
    _bilinear_warp_np,
    _chain_pairs,
    make_scene,
    make_scene_layered,
    write_dataset,
)


def _consistency(v1, v2):
    """Returns (visible_fraction, photometric_err_on_visible) for the
    pair using flow rendered from depth1 + relative camera motion."""
    h, w = v1.depth.shape
    Kn = v1.K.copy()
    Kn[0] /= w
    Kn[1] /= h
    flow_px = hg.compute_flow(v1.depth, Kn, v1.R, v1.t, Kn, v2.R, v2.t)
    warped = _bilinear_warp_np(v2.image.astype(np.float32) / 255, flow_px)
    img1 = v1.image.astype(np.float32) / 255
    ys, xs = np.mgrid[0:h, 0:w]
    X1 = np.stack([((xs + 0.5) / w - _INTR[2]) / _INTR[0],
                   ((ys + 0.5) / h - _INTR[3]) / _INTR[1],
                   np.ones((h, w))], -1) * v1.depth[..., None]
    X2 = ((X1 - v1.t) @ v1.R) @ v2.R.T + v2.t
    z2_sampled = _bilinear_warp_np(v2.depth, flow_px)
    vis = np.abs(X2[..., 2] - z2_sampled) < 0.02 * X2[..., 2]
    inb = ((xs + flow_px[..., 0] >= 1) & (xs + flow_px[..., 0] < w - 1)
           & (ys + flow_px[..., 1] >= 1) & (ys + flow_px[..., 1] < h - 1))
    m = vis & inb
    return m.mean(), float(np.abs(warped - img1)[m].mean())


def test_layered_scene_geometry_consistent():
    rng = np.random.RandomState(11)
    views = make_scene_layered(rng, height=96, width=128, n_views=3)
    assert len(views) == 3
    for v in views:
        assert v.image.dtype == np.uint8
        assert np.isfinite(v.depth).all() and (v.depth > 0).all()
        # depth discontinuities exist (layered scenes, not smooth fields)
        jumps = np.abs(np.diff(v.depth, axis=1)) > 0.3
        assert jumps.mean() > 0.001
    for i, j in [(0, 1), (1, 2), (0, 2)]:
        visible, err = _consistency(views[i], views[j])
        # geometry must be consistent where co-visible...
        assert err < 0.03, (i, j, err)
        assert visible > 0.3, (i, j, visible)
    # ...and real occlusion must exist in at least one pair
    vis01, _ = _consistency(views[0], views[1])
    assert vis01 < 0.995


def test_layered_texture_has_high_frequency_content():
    rng = np.random.RandomState(5)
    views = make_scene_layered(rng, height=96, width=128, n_views=2)
    g = np.abs(np.diff(views[0].image.astype(np.float32) / 255, axis=1))
    # smooth-noise scenes measure ~0.005 here; layered textures are an
    # order of magnitude sharper
    assert g.mean() > 0.015


def test_chain_pairs():
    assert _chain_pairs(2).tolist() == [0, 1, 1, 0]
    p = _chain_pairs(4).reshape(-1, 2).tolist()
    assert [0, 1] in p and [1, 0] in p and [2, 3] in p
    assert [0, 2] in p and [2, 0] in p and [1, 3] in p
    assert [0, 3] not in p  # skip-2 pairs excluded (too little overlap)


def test_smooth_scene_still_consistent():
    rng = np.random.RandomState(2)
    v1, v2 = make_scene(rng, height=96, width=128)
    visible, err = _consistency(v1, v2)
    assert err < 0.03 and visible > 0.5


@pytest.mark.parametrize("style,n_views", [("layered", 3)])
def test_write_dataset_layered_reader_roundtrip(tmp_path, style, n_views):
    path = write_dataset(str(tmp_path / "layered.h5"), n_scenes=2, seed=0,
                         height=96, width=128, style=style, n_views=n_views)
    reader_params = {
        "batch_size": 4,
        "test_phase": False,
        "builder_threads": 1,
        "inverse_depth": True,
        "motion_format": "ANGLEAXIS6",
        "norm_trans_scale_depth": True,
        "scaled_height": 96,
        "scaled_width": 128,
        "scene_pool_size": 2,
        "augment_rot180": 0,
        "augment_mirror_x": 0,
        "top_output": ("IMAGE_PAIR", "MOTION", "FLOW", "DEPTH",
                       "INTRINSICS"),
        "source": [{"path": path, "weight": [{"t": 0, "v": 1.0}]}],
    }
    with MultiViH5DataReader(reader_params) as reader:
        batch = next(iter(reader))
    assert batch["IMAGE_PAIR"].shape == (4, 96, 128, 6)
    assert batch["DEPTH"].shape[1:3] == (96, 128)
    # normalized-translation contract: ||t|| == 1 after rescale
    t = batch["MOTION"][:, 3:]
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-4)
    # depth must be majority-finite (occluded/invalid regions may be NaN)
    finite = np.isfinite(batch["DEPTH"]).mean()
    assert finite > 0.9


def test_trajectory_views_consistent_and_bounded():
    from demon_tpu.tools.synthetic import make_trajectory_views

    rng = np.random.RandomState(9)
    views = make_trajectory_views(rng, n_frames=8, height=96, width=128)
    assert len(views) == 8
    for v in views:
        # every frame sees geometry (full depth coverage, no empty render)
        assert np.isfinite(v.depth).all() and (v.depth > 0).all()
        # rotations orthonormal, det +1
        np.testing.assert_allclose(v.R @ v.R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(v.R) > 0.99
    # consecutive frames: co-visible, photometrically consistent, with
    # stereo baselines in the requested range
    for i in range(7):
        visible, err = _consistency(views[i], views[i + 1])
        assert visible > 0.4, (i, visible)
        assert err < 0.035, (i, err)
        Ci = -views[i].R.T @ views[i].t
        Cj = -views[i + 1].R.T @ views[i + 1].t
        b = np.linalg.norm(Cj - Ci)
        assert 0.05 < b < 0.3, (i, b)


def test_write_trajectory_frames(tmp_path):
    from demon_tpu.tools.synthetic import write_trajectory_frames

    out = write_trajectory_frames(str(tmp_path / "traj"), n_frames=4,
                                  seed=1, height=96, width=128)
    import glob as _glob
    frames = sorted(_glob.glob(out + "/frame_*.png"))
    assert len(frames) == 4
    poses = np.loadtxt(out + "/poses.txt").reshape(-1, 3, 4)
    assert poses.shape == (4, 3, 4)
    np.testing.assert_allclose(poses[0, :, :3] @ poses[0, :, :3].T,
                               np.eye(3), atol=1e-9)
    # idempotent
    assert write_trajectory_frames(str(tmp_path / "traj"), n_frames=4) == out
