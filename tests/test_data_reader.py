"""Data-layer tests: View IO round trip + the threaded reader on a
synthetic sculpture-pair dataset (modeled on the reference integration
example, examples/create_dataset_and_use_readerop.py:22-101)."""

import os

import h5py
import numpy as np
import pytest

from demon_tpu.data import (
    MultiViH5DataReader,
    View,
    read_view,
    write_view,
)
from demon_tpu.data import host_geometry as hg

# sample assets shipped with the repo (the reference distributes the
# same sculpture pair as example data)
REF_EXAMPLES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples", "data")
NORM_INTR = np.array([0.89115971, 1.18821287, 0.5, 0.5])


def _sculpture_views():
    from PIL import Image

    views = []
    for i in (1, 2):
        img = np.asarray(
            Image.open(os.path.join(REF_EXAMPLES, f"sculpture{i}.png")).convert("RGB")
        )
        Rt = np.loadtxt(os.path.join(REF_EXAMPLES, f"sculpture_Rt{i}.txt"))
        depth = np.load(os.path.join(REF_EXAMPLES, f"sculpture_depth{i}.npy"))
        h, w = img.shape[:2]
        K = np.eye(3)
        K[0, 0] = NORM_INTR[0] * w
        K[1, 1] = NORM_INTR[1] * h
        K[0, 2] = NORM_INTR[2] * w
        K[1, 2] = NORM_INTR[3] * h
        views.append(View(R=Rt[:, :3], t=Rt[:, 3], K=K, image=img,
                          depth=depth.astype(np.float32),
                          depth_metric="camera_z"))
    return views


@pytest.fixture(scope="module")
def sculpture_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "dataset.h5")
    views = _sculpture_views()
    with h5py.File(path, "w") as f:
        for i, v in enumerate(views):
            write_view(f.require_group(f"sculpture/frames/t0/v{i}"), v)
        f["sculpture/frames/t0"].attrs["viewpoint_pairs"] = np.array(
            [0, 1, 1, 0], np.int32)
    return path


def test_view_roundtrip(sculpture_h5):
    views = _sculpture_views()
    with h5py.File(sculpture_h5, "r") as f:
        v = read_view(f["sculpture/frames/t0/v0"])
    ref = views[0]
    np.testing.assert_allclose(v.R, ref.R, atol=1e-12)
    np.testing.assert_allclose(v.t, ref.t, atol=1e-12)
    np.testing.assert_allclose(v.K, ref.K, atol=1e-12)
    # fp16 depth storage
    np.testing.assert_allclose(v.depth, ref.depth, rtol=1e-3)
    # webp is lossy; mean error should be small
    assert np.abs(v.image.astype(np.float32)
                  - np.asarray(ref.image, np.float32)).mean() < 3.0


def _reader_params(path, **over):
    params = {
        "batch_size": 2,
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
                       "INTRINSICS", "DEPTHMASKS"),
        "source": [{"path": path, "weight": [{"t": 0, "v": 1.0}]}],
    }
    params.update(over)
    return params


def test_reader_shapes_and_semantics(sculpture_h5):
    with MultiViH5DataReader(_reader_params(sculpture_h5)) as reader:
        batch = reader.get_batch(timeout=60)

    assert batch["IMAGE_PAIR"].shape == (2, 96, 128, 6)
    assert batch["MOTION"].shape == (2, 6)
    assert batch["DEPTH"].shape == (2, 96, 128, 1)
    assert batch["FLOW"].shape == (2, 96, 128, 2)
    assert batch["INTRINSICS"].shape == (2, 4)
    assert batch["DEPTHMASKS"].shape == (2, 96, 128, 1)
    assert len(batch["SAMPLE_IDS"]) == 2

    # images in [-0.5, 0.5]
    assert batch["IMAGE_PAIR"].min() >= -0.5001
    assert batch["IMAGE_PAIR"].max() <= 0.5001
    # intrinsics normalized
    np.testing.assert_allclose(batch["INTRINSICS"][0], NORM_INTR, atol=1e-5)
    # translation normalized
    np.testing.assert_allclose(
        np.linalg.norm(batch["MOTION"][:, 3:], axis=1), 1.0, atol=1e-5)
    # inverse depth positive or NaN
    d = batch["DEPTH"]
    assert np.nanmin(d) > 0
    # depth mask borders are zero
    assert batch["DEPTHMASKS"][:, :3].max() == 0
    assert batch["DEPTHMASKS"][:, :, :3].max() == 0


def test_reader_motion_matches_cameras(sculpture_h5):
    views = _sculpture_views()
    with MultiViH5DataReader(_reader_params(sculpture_h5)) as reader:
        batch = reader.get_batch(timeout=60)
    # find the item for pair (v0, v1)
    idx = [i for i, s in enumerate(batch["SAMPLE_IDS"]) if "v0,v1" in s]
    assert idx, batch["SAMPLE_IDS"]
    m = batch["MOTION"][idx[0]]
    R1, t1 = views[0].R, views[0].t
    R2, t2 = views[1].R, views[1].t
    R12 = R2 @ R1.T
    t12 = t2 - R12 @ t1
    t12 = t12 / np.linalg.norm(t12)
    aa = hg.rotation_matrix_to_angleaxis(R12)
    np.testing.assert_allclose(m[:3], aa, atol=1e-5)
    np.testing.assert_allclose(m[3:], t12, atol=1e-5)


def test_reader_flow_consistency(sculpture_h5):
    """The reader's pixel-unit GT flow must agree with warping: flow maps
    pixels of image1 onto corresponding pixels of image2."""
    views = _sculpture_views()
    v0, v1 = views
    flow = hg.compute_flow(
        v0.depth, _norm_K(v0), v0.R, v0.t, _norm_K(v1), v1.R, v1.t)
    h, w = v0.depth.shape
    # center pixel correspondence check by direct reprojection
    y, x = h // 2, w // 2
    if np.isfinite(flow[y, x]).all():
        p1 = np.array([x + 0.5, y + 0.5])
        X1 = np.linalg.inv(v0.K) @ np.array([p1[0], p1[1], 1.0]) * v0.depth[y, x]
        Xw = v0.R.T @ (X1 - v0.t)
        p2h = v1.K @ (v1.R @ Xw + v1.t)
        p2 = p2h[:2] / p2h[2]
        np.testing.assert_allclose(p1 + flow[y, x], p2, atol=1e-2)


def _norm_K(v):
    h, w = v.depth.shape
    K = v.K.copy()
    K[0, 0] /= w
    K[1, 1] /= h
    K[0, 2] /= w
    K[1, 2] /= h
    return K


def test_reader_test_phase_exact_coverage(tmp_path):
    """Deterministic test mode: every sample exactly once, sorted order,
    hard error on indivisible batch size."""
    path = str(tmp_path / "test.h5")
    views = _sculpture_views()
    with h5py.File(path, "w") as f:
        for g in range(4):
            for i, v in enumerate(views):
                write_view(f.require_group(f"g{g:02d}/frames/t0/v{i}"), v)
            f[f"g{g:02d}/frames/t0"].attrs["viewpoint_pairs"] = np.array(
                [0, 1], np.int32)

    params = _reader_params(path, test_phase=True, batch_size=2,
                            scene_pool_size=2)
    with MultiViH5DataReader(params) as reader:
        assert reader.test_iterations == 2
        ids = []
        for batch in reader:
            ids.extend(batch["SAMPLE_IDS"])
    assert ids == [f"g{g:02d}/frames/t0/v0,v1" for g in range(4)]

    with pytest.raises(ValueError, match="batch_size"):
        MultiViH5DataReader(_reader_params(path, test_phase=True, batch_size=3))


def test_reader_augmentation_fixups(sculpture_h5):
    """rot180 + mirror: flow sign fixups keep GT flow consistent with the
    transformed images, and intrinsics principal point is mirrored."""
    params = _reader_params(sculpture_h5, augment_rot180=1.0,
                            augment_mirror_x=0.0)
    with MultiViH5DataReader(params) as r_aug:
        aug = r_aug.get_batch(timeout=60)
    params = _reader_params(sculpture_h5)
    with MultiViH5DataReader(params) as r_plain:
        plain = r_plain.get_batch(timeout=60)

    # match items by sample id
    for i, sid in enumerate(aug["SAMPLE_IDS"]):
        j = plain["SAMPLE_IDS"].index(sid)
        np.testing.assert_allclose(
            aug["IMAGE_PAIR"][i], plain["IMAGE_PAIR"][j][::-1, ::-1], atol=1e-6)
        np.testing.assert_allclose(
            aug["FLOW"][i], -plain["FLOW"][j][::-1, ::-1], atol=1e-4,
            equal_nan=True)
        np.testing.assert_allclose(
            aug["INTRINSICS"][i][2:],
            1.0 - plain["INTRINSICS"][j][2:], atol=1e-6)
        # depth flips without sign change
        np.testing.assert_allclose(
            aug["DEPTH"][i], plain["DEPTH"][j][::-1, ::-1], atol=1e-6,
            equal_nan=True)


def test_reader_gray_values(sculpture_h5):
    params = _reader_params(sculpture_h5, convert_to_gray_values=True,
                            top_output=("IMAGE_PAIR", "MOTION", "INTRINSICS"))
    with MultiViH5DataReader(params) as reader:
        batch = reader.get_batch(timeout=60)
    assert batch["IMAGE_PAIR"].shape == (2, 96, 128, 2)
    assert batch["IMAGE_PAIR"].min() >= -0.5001
    assert batch["IMAGE_PAIR"].max() <= 0.5001


def test_reader_photometric_augmentation(sculpture_h5):
    params = _reader_params(sculpture_h5)
    params["source"] = [{
        "path": sculpture_h5,
        "weight": [{"t": 0, "v": 1.0}],
        "aug_hsv_hue": {"uniform": {"a": 30.0, "b": 30.0}},
        "aug_brightness": {"normal": {"mean": 0.1, "stddev": 0.0}},
    }]
    with MultiViH5DataReader(params) as r_aug:
        aug = r_aug.get_batch(timeout=60)
    with MultiViH5DataReader(_reader_params(sculpture_h5)) as r_plain:
        plain = r_plain.get_batch(timeout=60)
    i = plain["SAMPLE_IDS"].index(aug["SAMPLE_IDS"][0])
    # images must differ but stay in range
    assert np.abs(aug["IMAGE_PAIR"][0] - plain["IMAGE_PAIR"][i]).mean() > 0.01
    assert aug["IMAGE_PAIR"].min() >= -0.5001
    assert aug["IMAGE_PAIR"].max() <= 0.5001
    # geometry untouched
    np.testing.assert_allclose(aug["MOTION"][0], plain["MOTION"][i], atol=1e-6)


def test_reader_photometric_augmentation_in_test_phase(tmp_path):
    """Like the reference (augmentImage called unconditionally,
    multivih5datareader.cpp:1642-1647), photometric aug applies whenever the
    source configures it — even in test phase — and is deterministic there
    (single seeded builder thread)."""
    path = str(tmp_path / "test.h5")
    views = _sculpture_views()
    with h5py.File(path, "w") as f:
        for g in range(2):
            for i, v in enumerate(views):
                write_view(f.require_group(f"g{g:02d}/frames/t0/v{i}"), v)
            f[f"g{g:02d}/frames/t0"].attrs["viewpoint_pairs"] = np.array(
                [0, 1], np.int32)

    aug_src = [{
        "path": path,
        "weight": [{"t": 0, "v": 1.0}],
        "aug_brightness": {"normal": {"mean": 0.15, "stddev": 0.0}},
    }]
    base = _reader_params(path, test_phase=True, batch_size=2,
                          scene_pool_size=2)
    runs = []
    for _ in range(2):
        params = dict(base)
        params["source"] = aug_src
        with MultiViH5DataReader(params) as reader:
            runs.append(reader.get_batch(timeout=60))
    with MultiViH5DataReader(base) as reader:
        plain = reader.get_batch(timeout=60)

    assert runs[0]["SAMPLE_IDS"] == plain["SAMPLE_IDS"]
    # augmentation DID apply in test phase ...
    assert np.abs(runs[0]["IMAGE_PAIR"] - plain["IMAGE_PAIR"]).mean() > 0.01
    # ... and deterministically
    np.testing.assert_array_equal(runs[0]["IMAGE_PAIR"], runs[1]["IMAGE_PAIR"])


def test_reader_multi_host_sharding(tmp_path):
    """Two hosts see disjoint group shards covering everything exactly
    once in test mode."""
    path = str(tmp_path / "shard.h5")
    views = _sculpture_views()
    with h5py.File(path, "w") as f:
        for g in range(4):
            for i, v in enumerate(views):
                write_view(f.require_group(f"g{g:02d}/frames/t0/v{i}"), v)
            f[f"g{g:02d}/frames/t0"].attrs["viewpoint_pairs"] = np.array(
                [0, 1], np.int32)

    seen = []
    for host in (0, 1):
        params = _reader_params(path, test_phase=True, batch_size=1,
                                scene_pool_size=2, host_id=host,
                                num_hosts=2)
        with MultiViH5DataReader(params) as reader:
            assert reader.test_iterations == 2
            for batch in reader:
                seen.extend(batch["SAMPLE_IDS"])
    assert sorted(seen) == [f"g{g:02d}/frames/t0/v0,v1" for g in range(4)]


@pytest.mark.parametrize("fmt,dim", [("ANGLEAXIS7", 7), ("QUATERNION", 7),
                                     ("FMATRIX", 8)])
def test_reader_motion_encodings(sculpture_h5, fmt, dim):
    params = _reader_params(sculpture_h5, motion_format=fmt,
                            top_output=("IMAGE_PAIR", "MOTION", "INTRINSICS"))
    with MultiViH5DataReader(params) as reader:
        batch = reader.get_batch(timeout=60)
    m = batch["MOTION"]
    assert m.shape == (2, dim)
    views = _sculpture_views()
    idx = [i for i, s in enumerate(batch["SAMPLE_IDS"]) if "v0,v1" in s][0]
    R1, t1 = views[0].R, views[0].t
    R2, t2 = views[1].R, views[1].t
    R12 = R2 @ R1.T
    t12 = t2 - R12 @ t1
    t12n = t12 / np.linalg.norm(t12)
    if fmt == "ANGLEAXIS7":
        aa = hg.rotation_matrix_to_angleaxis(R12)
        mag = np.linalg.norm(aa)
        np.testing.assert_allclose(m[idx, 0], mag, atol=1e-5)
        np.testing.assert_allclose(m[idx, 1:4], aa / mag, atol=1e-5)
        np.testing.assert_allclose(m[idx, 4:], t12n, atol=1e-5)
    elif fmt == "QUATERNION":
        q = hg.rotation_matrix_to_quaternion(R12)
        np.testing.assert_allclose(m[idx, :4], q, atol=1e-5)
        np.testing.assert_allclose(m[idx, 4:], t12n, atol=1e-5)
    else:  # FMATRIX: column-major normalized F without the last element;
        # the reader composes P from the NORMALIZED intrinsics (K is
        # normalized by prepareScene before the encoding step)
        P1 = _norm_K(views[0]) @ np.hstack([R1, t1.reshape(3, 1)])
        P2 = _norm_K(views[1]) @ np.hstack([R2, t2.reshape(3, 1)])
        F = hg.compute_fundamental_from_cameras(P1, P2)
        Fn = (F / F[2, 2]).T.reshape(-1)[:8]
        np.testing.assert_allclose(m[idx], Fn, rtol=1e-4, atol=1e-4)


def test_fundamental_matrix_epipolar_constraint():
    """x2' F x1 = 0 for corresponding points of a synthetic two-view
    setup (sanity for compute_fundamental_from_cameras)."""
    rng = np.random.RandomState(0)
    K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    R1, t1 = np.eye(3), np.zeros(3)
    R2 = hg.angleaxis_to_rotation_matrix(rng.randn(3) * 0.1)
    t2 = rng.randn(3)
    P1 = K @ np.hstack([R1, t1.reshape(3, 1)])
    P2 = K @ np.hstack([R2, t2.reshape(3, 1)])
    F = hg.compute_fundamental_from_cameras(P1, P2)
    for _ in range(10):
        X = np.append(rng.randn(3) * 2 + [0, 0, 5], 1.0)
        x1 = P1 @ X
        x2 = P2 @ X
        val = x2 @ F @ x1 / (np.linalg.norm(x1) * np.linalg.norm(x2))
        assert abs(val) < 1e-6 * max(1.0, abs(F[2, 2]))


def test_reader_depth_pair(sculpture_h5):
    params = _reader_params(sculpture_h5, depth_pair=True)
    with MultiViH5DataReader(params) as reader:
        batch = reader.get_batch(timeout=60)
    assert batch["DEPTH"].shape == (2, 96, 128, 2)
    assert batch["DEPTHMASKS"].shape == (2, 96, 128, 2)
    # both depth channels are inverse depths (positive or NaN)
    assert np.nanmin(batch["DEPTH"]) > 0
    # the two mask channels differ (different viewpoints)
    m = batch["DEPTHMASKS"]
    assert (m[..., 0] != m[..., 1]).any()


def test_cache_multifile_colliding_groups_and_test_phase(tmp_path):
    """(a) Building a cache over ';'-joined files that reuse group names
    must terminate and keep every scene (the old seen-set of group names
    spun forever and dropped collisions). (b) Cached test-phase serving
    must match the h5 path's contract: first attribute pair only, exact
    one-pass coverage."""
    from demon_tpu.data import MultiViH5DataReader
    from demon_tpu.data.cache import SceneCache, build_scene_cache

    views = _sculpture_views()
    paths = []
    for fi in range(2):
        path = str(tmp_path / f"part{fi}.h5")
        with h5py.File(path, "w") as f:
            for i, v in enumerate(views):
                # jitter so the two files' scenes are distinguishable
                write_view(f.require_group(f"scene00000/frames/t0/v{i}"),
                           v._replace(t=v.t + fi * 1e-3))
            f["scene00000/frames/t0"].attrs["viewpoint_pairs"] = np.array(
                [0, 1, 1, 0], np.int32)
        paths.append(path)
    source = ";".join(paths)

    cache_dir = str(tmp_path / "cache")
    subdir = build_scene_cache(source, cache_dir, 48, 64, verbose=False)
    cache = SceneCache(subdir)
    assert len(cache) == 2                      # collision kept, not dropped
    assert sorted(e.get("file") for e in cache.scenes) == [0, 1]
    # attribute order preserved (deterministic build, no shuffle)
    for e in cache.scenes:
        assert e["combinations"][0] == [0, 1]

    params = {
        "batch_size": 1, "test_phase": True, "builder_threads": 1,
        "scaled_height": 48, "scaled_width": 64,
        "top_output": ("IMAGE_PAIR", "MOTION", "DEPTH", "INTRINSICS",
                       "SAMPLE_IDS"),
        "cache_dir": cache_dir,
        "source": [{"path": paths[0], "weight": [{"t": 0, "v": 1.0}]}],
    }
    with MultiViH5DataReader(params) as reader:
        assert reader.test_iterations == 1      # one group -> one sample
        seen_ids = [reader.get_batch(timeout=120)["SAMPLE_IDS"][0]
                    for _ in range(reader.test_iterations)]
    # first pair only, reference id format
    assert seen_ids == ["scene00000/frames/t0/v0,v1"]


def test_cache_duplicated_path_occurrences_are_distinct_files(tmp_path):
    """A ';'-joined source may repeat the SAME path for deliberate
    oversampling; each occurrence is its own shard unit. (A path-value
    lookup used to collapse both occurrences to file 0, making cached
    multi-host sharding disagree with the h5 path.)"""
    from demon_tpu.data.cache import SceneCache, build_scene_cache

    views = _sculpture_views()
    path = str(tmp_path / "dup.h5")
    with h5py.File(path, "w") as f:
        for i, v in enumerate(views):
            write_view(f.require_group(f"scene00000/frames/t0/v{i}"), v)
        f["scene00000/frames/t0"].attrs["viewpoint_pairs"] = np.array(
            [0, 1], np.int32)

    cache_dir = str(tmp_path / "cache")
    subdir = build_scene_cache(f"{path};{path}", cache_dir, 48, 64,
                               verbose=False)
    cache = SceneCache(subdir)
    assert len(cache) == 2
    assert sorted(e.get("file") for e in cache.scenes) == [0, 1]
