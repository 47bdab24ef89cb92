"""Multi-process reader tests: batch contract, shard disjointness across
worker processes, error propagation, clean shutdown."""

import os

import h5py
import numpy as np
import pytest

from demon_tpu.data import MultiProcessReader, MultiViH5DataReader


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """8 scenes of 2 views, 80x96 — enough for 4 worker shards of 2."""
    from demon_tpu.data import View, write_view
    from demon_tpu.data.host_geometry import angleaxis_to_rotation_matrix

    rng = np.random.RandomState(3)
    path = str(tmp_path_factory.mktemp("mp") / "train.h5")
    H, W = 80, 96
    with h5py.File(path, "w") as f:
        for g in range(8):
            for v in range(2):
                img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
                depth = rng.uniform(1.0, 4.0, (H, W)).astype(np.float32)
                K = np.array([[0.9 * W, 0, 0.5 * W],
                              [0, 1.2 * H, 0.5 * H], [0, 0, 1.0]])
                R = angleaxis_to_rotation_matrix(rng.randn(3) * 0.05)
                t = rng.randn(3) * 0.3
                write_view(f.require_group(f"scene{g}/frames/t0/v{v}"),
                           View(R=R, t=t, K=K, image=img, depth=depth,
                                depth_metric="camera_z"))
            f[f"scene{g}/frames/t0"].attrs["viewpoint_pairs"] = np.array(
                [0, 1, 1, 0], np.int32)
    return path


def _params(path, **kw):
    p = {
        "batch_size": 4,
        "test_phase": False,
        "builder_threads": 1,
        "inverse_depth": True,
        "motion_format": "ANGLEAXIS6",
        "norm_trans_scale_depth": True,
        "scaled_height": 64,
        "scaled_width": 64,
        "scene_pool_size": 4,
        "augment_rot180": 0.0,
        "augment_mirror_x": 0.0,
        "top_output": ("IMAGE_PAIR", "MOTION", "DEPTH", "INTRINSICS",
                       "SAMPLE_IDS"),
        "source": [{"path": path, "weight": [{"t": 0, "v": 1.0}]}],
    }
    p.update(kw)
    return p


def test_batch_contract(dataset):
    """Batches from worker processes carry the same keys/shapes/dtypes as
    the in-process reader and finite payloads."""
    with MultiProcessReader(_params(dataset), workers=2) as reader:
        ids = []
        for _ in range(6):
            batch = reader.get_batch(timeout=120)
            assert batch["IMAGE_PAIR"].shape == (4, 64, 64, 6)
            assert batch["IMAGE_PAIR"].dtype == np.float32
            assert batch["DEPTH"].shape == (4, 64, 64, 1)
            assert batch["MOTION"].shape == (4, 6)
            assert batch["INTRINSICS"].shape == (4, 4)
            assert np.isfinite(batch["IMAGE_PAIR"]).all()
            assert np.isfinite(batch["MOTION"]).all()
            assert len(batch["SAMPLE_IDS"]) == 4
            ids.extend(batch["SAMPLE_IDS"])
        # payload values in the reader's normalized range
        assert batch["IMAGE_PAIR"].min() >= -0.5 - 1e-6
        assert batch["IMAGE_PAIR"].max() <= 0.5 + 1e-6


def test_worker_shards_disjoint(dataset):
    """Each worker serves scenes from its own shard: the sample ids seen
    through a W-worker reader, grouped by scene, partition exactly like
    W single readers with host_id=w/num_hosts=W."""
    def scene_of(sample_id):
        # "scene3/frames/t0/v0,v1" -> "scene3"
        return sample_id.split("/")[0]

    expected = []
    for w in range(2):
        with MultiViH5DataReader(
                _params(dataset, host_id=w, num_hosts=2)) as r:
            b = r.get_batch(timeout=120)
            shard = set()
            for _ in range(6):
                shard |= {scene_of(s) for s in b["SAMPLE_IDS"]}
                b = r.get_batch(timeout=120)
            expected.append(shard)
    assert not (expected[0] & expected[1])

    seen = set()
    with MultiProcessReader(_params(dataset), workers=2) as reader:
        # Workers start asynchronously and one can race several batches
        # ahead (skew is bounded by the slot ring in steady state); poll
        # until both shards have contributed instead of a fixed count.
        for _ in range(60):
            b = reader.get_batch(timeout=120)
            seen |= {scene_of(s) for s in b["SAMPLE_IDS"]}
            if seen & expected[0] and seen & expected[1]:
                break
    assert seen <= (expected[0] | expected[1])
    # both shards contribute (the union covers more than either shard)
    assert seen & expected[0] and seen & expected[1]


def _single_process_test_ids(dataset, batch_size):
    """The reference-contract one-pass batch stream of the single reader."""
    seqs = []
    with MultiViH5DataReader(_params(dataset, test_phase=True,
                                     batch_size=batch_size)) as reader:
        for batch in reader:
            seqs.append(list(batch["SAMPLE_IDS"]))
    return seqs


def test_test_phase_exact_coverage_w2(dataset):
    """W=2 deterministic test phase: every sample exactly once, in the
    single-process reader's batch order (batch-block sharding + round-
    robin interleave; reference contract multivih5datareader.cpp:
    2026-2054)."""
    ref = _single_process_test_ids(dataset, 4)  # 8 samples -> 2 batches
    with MultiProcessReader(_params(dataset, test_phase=True,
                                    batch_size=4), workers=2) as reader:
        assert reader.test_iterations == 2
        assert reader.info[0] == 2.0
        got = [list(b["SAMPLE_IDS"]) for b in reader]
    assert len(got) == 2
    assert got == ref
    # exhaustion is an error, not a hang
    with MultiProcessReader(_params(dataset, test_phase=True,
                                    batch_size=4), workers=2) as reader:
        for _ in range(reader.test_iterations):
            reader.get_batch(timeout=120)
        with pytest.raises(RuntimeError, match="exhausted"):
            reader.get_batch(timeout=10)


def test_test_phase_unequal_shards_w3(dataset):
    """8 samples / batch 2 = 4 blocks over 3 workers: shards own 2/1/1
    blocks; round-robin must skip exhausted workers and still reproduce
    the single-process stream."""
    ref = _single_process_test_ids(dataset, 2)
    with MultiProcessReader(_params(dataset, test_phase=True,
                                    batch_size=2), workers=3) as reader:
        assert reader.test_iterations == 4
        assert reader._worker_iters == [2, 1, 1]
        got = [list(b["SAMPLE_IDS"]) for b in reader]
    assert got == ref
    flat = [s for b in got for s in b]
    assert len(flat) == len(set(flat)) == 8


def test_test_phase_contract_enforced(dataset):
    """The reference's global num_samples % batch_size == 0 contract is
    checked against the WHOLE source, not any one worker shard."""
    with pytest.raises(ValueError, match="batch_size"):
        MultiProcessReader(_params(dataset, test_phase=True,
                                   batch_size=3), workers=2)


def test_worker_failure_surfaces(tmp_path, dataset):
    """A dying worker raises in the parent instead of hanging."""
    bad = _params(str(tmp_path / "missing.h5"))
    with pytest.raises((RuntimeError, TimeoutError)):
        with MultiProcessReader(bad, workers=1) as reader:
            reader.get_batch(timeout=60)
