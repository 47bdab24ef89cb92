"""Smoke tests for the evolution training driver: a few steps of evo 0 and
evo 4 (replay mix) on a tiny synthetic dataset, with checkpoint warm-start
between evolutions."""

import os

import h5py
import numpy as np
import pytest

from demon_tpu.data import View, write_view
from demon_tpu.train.trainer import TrainConfig
from demon_tpu.train.driver import TrainingDriver


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """4 synthetic scenes of 2 views each, 80x64 images with valid depth."""
    rng = np.random.RandomState(7)
    path = str(tmp_path_factory.mktemp("train") / "train.h5")
    H, W = 80, 96
    with h5py.File(path, "w") as f:
        for g in range(4):
            for v in range(2):
                img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
                depth = rng.uniform(1.0, 4.0, (H, W)).astype(np.float32)
                K = np.array([[0.9 * W, 0, 0.5 * W],
                              [0, 1.2 * H, 0.5 * H],
                              [0, 0, 1.0]])
                aa = rng.randn(3) * 0.05
                from demon_tpu.data.host_geometry import angleaxis_to_rotation_matrix
                R = angleaxis_to_rotation_matrix(aa)
                t = rng.randn(3) * 0.3
                view = View(R=R, t=t, K=K, image=img, depth=depth,
                            depth_metric="camera_z")
                write_view(f.require_group(f"scene{g}/frames/t0/v{v}"), view)
            f[f"scene{g}/frames/t0"].attrs["viewpoint_pairs"] = np.array(
                [0, 1, 1, 0], np.int32)
    return path


def _make_driver(tmp_path, tiny_dataset, **kw):
    cfg = TrainConfig(height=64, width=64, batch_size=2,
                      batch_size_iterative=2)
    sources = [{"path": tiny_dataset, "weight": [{"t": 0, "v": 1.0}]}]
    return TrainingDriver(
        str(tmp_path / "train_dir"), sources, config=cfg,
        max_steps=kw.pop("max_steps", 2), display_interval=1,
        saver_interval=1000, recovery_interval=1000, **kw)


def test_evolution0_steps_and_checkpoint(tmp_path, tiny_dataset):
    driver = _make_driver(tmp_path, tiny_dataset)
    out = driver.run_evolution("0_flow1")
    assert out["step"] == 2
    assert np.isfinite(out["metrics"]["total_loss"])
    # checkpoint exists and a re-run resumes from it (no further steps)
    driver2 = _make_driver(tmp_path, tiny_dataset)
    out2 = driver2.run_evolution("0_flow1")
    assert out2["step"] == 2


def test_evolution4_replay_mix(tmp_path, tiny_dataset):
    driver = _make_driver(tmp_path, tiny_dataset)
    out = driver.run_evolution("4_iterative")
    assert out["step"] == 2
    assert np.isfinite(out["metrics"]["total_loss"])
    # both flow2 and dm2 losses present
    assert any(k.startswith("netFlow2_") for k in out["metrics"])
    assert any(k.startswith("netDM2_") for k in out["metrics"])


def test_evolution4_fresh_mix_ablation(tmp_path, tiny_dataset):
    """replay_recycled=False trains evolution 4 on 4x fresh rows (no
    carried predictions) with the same rows/step as the recycled mix."""
    cfg = TrainConfig(height=64, width=64, batch_size=2,
                      batch_size_iterative=2, replay_recycled=False)
    assert cfg.batch_for("4_iterative") == 8   # 2 * simulated_iterations
    assert cfg.batch_for("5_refine") == 2
    sources = [{"path": tiny_dataset, "weight": [{"t": 0, "v": 1.0}]}]
    driver = TrainingDriver(
        str(tmp_path / "train_dir"), sources, config=cfg,
        max_steps=2, display_interval=1,
        saver_interval=1000, recovery_interval=1000)
    out = driver.run_evolution("4_iterative")
    assert out["step"] == 2
    assert np.isfinite(out["metrics"]["total_loss"])
    assert any(k.startswith("netFlow2_") for k in out["metrics"])
    assert any(k.startswith("netDM2_") for k in out["metrics"])


def test_warm_start_chain(tmp_path, tiny_dataset):
    """Evolution 1 warm-starts from evolution 0's final snapshot
    (reference training/README.md:14-19)."""
    import jax

    driver = _make_driver(tmp_path, tiny_dataset)
    out0 = driver.run_evolution("0_flow1")
    p0_flow1 = out0["params"]["netFlow1"]

    driver2 = _make_driver(tmp_path, tiny_dataset)
    params, opt_state, step = driver2._initial_params("1_dm1")
    assert step == 0 and opt_state is None
    # netFlow1 weights come from the evolution-0 checkpoint
    leaf0 = jax.tree_util.tree_leaves(p0_flow1)[0]
    leaf1 = jax.tree_util.tree_leaves(params["netFlow1"])[0]
    np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(leaf1))


@pytest.mark.parametrize("evo,expect_prefix", [
    ("1_dm1", "netDM1_"),
    ("2_flow2", "netFlow2_"),
    ("3_dm2", "netDM2_"),
    ("5_refine", "netRefine_"),
])
def test_remaining_evolutions_step(tmp_path, tiny_dataset, evo, expect_prefix):
    driver = _make_driver(tmp_path, tiny_dataset)
    out = driver.run_evolution(evo)
    assert out["step"] == 2
    assert np.isfinite(out["metrics"]["total_loss"])
    assert any(k.startswith(expect_prefix) for k in out["metrics"])
