"""Evaluation subsystem tests: metric values on analytic cases, the
labeled-array JSON round trip, and the end-to-end harness on a synthetic
prediction/GT h5 pair."""

import math

import h5py
import numpy as np
import pytest

from demon_tpu.eval import (
    LabeledArray,
    compute_depth_scale_factor,
    compute_errors,
    compute_flow_epe,
    compute_motion_errors,
    evaluate,
    evaluate_depth,
    read_labeled_array_json,
    write_labeled_array_json,
)


def test_depth_metrics_analytic():
    gt = np.full((10, 10), 2.0)
    pred = np.full((10, 10), 4.0)
    errs = compute_errors(pred, gt)
    assert errs["num_valid"] == 100
    np.testing.assert_allclose(errs["l1"], 2.0)
    np.testing.assert_allclose(errs["l1_inverse"], 0.25)
    np.testing.assert_allclose(errs["abs_relative"], 1.0)
    np.testing.assert_allclose(errs["sq_relative"], 2.0)
    np.testing.assert_allclose(errs["rmse"], 2.0)
    np.testing.assert_allclose(errs["rmse_log"], math.log(2.0))
    # constant ratio -> scale-invariant error is 0
    np.testing.assert_allclose(errs["scale_invariant"], 0.0, atol=1e-7)
    # ratio 2 > 1.953125 -> 0% below threshold
    assert errs["ratio_threshold_1.953125"] == 0.0
    assert errs["ratio_threshold_1.25"] == 0.0


def test_depth_metrics_nan_masking():
    gt = np.full((4, 4), 2.0)
    gt[0, 0] = np.nan
    pred = np.full((4, 4), 2.0)
    pred[1, 1] = -1.0
    errs = compute_errors(pred, gt)
    assert errs["num_valid"] == 14
    np.testing.assert_allclose(errs["l1"], 0.0)


def test_scale_factor():
    d2 = np.full(50, 3.0)
    d1 = np.full(50, 1.0)
    assert abs(compute_depth_scale_factor(d1, d2, "abs") - 3.0) < 1e-12
    assert abs(compute_depth_scale_factor(d1, d2, "log") - 3.0) < 1e-12
    assert abs(compute_depth_scale_factor(d1, d2, "inv") - 3.0) < 1e-12


def test_evaluate_depth_scaling_makes_error_zero():
    # inverse-depth inputs; pred = gt * 2 in depth space
    gt_inv = 1.0 / np.random.RandomState(0).uniform(1, 5, (8, 8))
    pred_inv = gt_inv / 2.0
    errs, errs_scaled = evaluate_depth(
        np.array([1.0, 0, 0]), gt_inv, pred_inv)
    assert errs["abs_relative"] > 0.5
    np.testing.assert_allclose(errs_scaled["abs_relative"], 0.0, atol=1e-9)


def test_motion_errors():
    aa = np.array([0.0, 0.0, np.pi / 2])  # 90 deg about z
    m_gt = np.concatenate([aa, [1.0, 0, 0]])
    m_pred = np.concatenate([[0.0, 0.0, 0.0], [0.0, 1.0, 0]])
    rot_err, tran_err, tran_angle = compute_motion_errors(m_pred, m_gt, True)
    np.testing.assert_allclose(rot_err, 90.0, atol=1e-6)
    np.testing.assert_allclose(tran_angle, 90.0, atol=1e-6)
    np.testing.assert_allclose(tran_err, math.sqrt(2.0), atol=1e-6)
    # identical motions -> zero
    r, d, a = compute_motion_errors(m_gt, m_gt, True)
    assert r < 1e-6 and d < 1e-9 and a < 1e-4


def test_flow_epe():
    f1 = np.zeros((2, 4, 4))
    f2 = np.ones((2, 4, 4))
    np.testing.assert_allclose(compute_flow_epe(f1, f2), math.sqrt(2.0))
    f2[:, 0, 0] = np.nan  # ignored
    np.testing.assert_allclose(compute_flow_epe(f1, f2), math.sqrt(2.0))


def test_labeled_array_roundtrip(tmp_path):
    arr = LabeledArray(
        np.arange(12, dtype=np.float64).reshape(3, 4),
        ["a", "b"], {"a": ["x", "y", "z"], "b": [0, 1, 2, 3]},
        attrs={"k": "v"})
    arr.set(("y", 2), 99.0)
    assert arr.get(("y", 2)) == 99.0
    path = str(tmp_path / "arr.json")
    write_labeled_array_json(arr, path)
    back = read_labeled_array_json(path)
    np.testing.assert_array_equal(back.data, arr.data)
    assert back.dims == arr.dims
    assert back.coords == arr.coords
    assert back.attrs["k"] == "v"
    # selection
    row = arr.sel(a="y")
    assert row.dims == ("b",)
    assert row.data[2] == 99.0


@pytest.fixture
def synthetic_eval_files(tmp_path):
    """GT + iterative-results h5 pair in the reference layout."""
    rng = np.random.RandomState(0)
    H, W = 48, 64
    n_samples = 3
    gt_path = str(tmp_path / "gt.h5")
    pr_path = str(tmp_path / "pred_iter_10000.h5")

    with h5py.File(gt_path, "w") as g, h5py.File(pr_path, "w") as p:
        snap = p.create_group("snap_10000")
        for s in range(n_samples):
            depth_gt = rng.uniform(0.2, 1.0, (H, W)).astype(np.float32)  # inverse
            motion_gt = np.concatenate([
                rng.randn(3) * 0.1, _unit(rng.randn(3))]).astype(np.float32)
            flow_gt = rng.randn(2, H, W).astype(np.float32) * 2

            gg = g.create_group(str(s))
            gg.attrs["sample_id"] = f"scene{s}/frames/t0/v0,v1"
            gg["depth"] = depth_gt
            gg["motion"] = motion_gt
            gg["flow"] = flow_gt
            gg["intrinsics"] = np.array([0.89, 1.19, 0.5, 0.5], np.float32)

            pg = snap.create_group(str(s))
            pg.attrs["sample_id"] = f"scene{s}/frames/t0/v0,v1"
            for it in ("0", "1", "2", "3", "3_refined"):
                # predictions = GT + noise; '3_refined' exact
                noise = 0.0 if it == "3_refined" else 0.05
                pg[f"predicted_depth/{it}"] = depth_gt + \
                    noise * rng.randn(H, W).astype(np.float32) * depth_gt
                if it != "3_refined":
                    pg[f"predicted_motion/{it}"] = motion_gt + \
                        noise * rng.randn(6).astype(np.float32)
                    pg[f"predicted_flow/{it}"] = flow_gt + \
                        noise * rng.randn(2, H, W).astype(np.float32)
    return pr_path, gt_path


def _unit(v):
    return v / np.linalg.norm(v)


def test_harness_end_to_end(synthetic_eval_files):
    pr_path, gt_path = synthetic_eval_files
    results = evaluate(pr_path, gt_path, verbose=False)
    assert results.dims == ("snapshot", "iteration", "sample", "errors", "scaled")
    assert results.coords["iteration"] == ["0", "1", "2", "3", "3_refined"]

    # exact '3_refined' depth predictions -> ~zero depth error
    v = results.get(("snap_10000", "3_refined", "0", "depth_l1_inverse", 0))
    assert v < 1e-5
    # noisy iteration '0' -> nonzero
    v0 = results.get(("snap_10000", "0", "0", "depth_l1_inverse", 0))
    assert v0 > 1e-4
    # motion errors present for non-refined iterations
    assert np.isfinite(results.get(("snap_10000", "3", "0", "rot_err", 0)))
    # flow epe finite
    assert np.isfinite(results.get(("snap_10000", "1", "0", "flow_epe", 0)))
    # camera baseline is 1 (normalized translations)
    np.testing.assert_allclose(
        results.get(("snap_10000", "0", "0", "camera_baseline", 0)), 1.0,
        atol=1e-6)


def test_harness_sample_id_mismatch(synthetic_eval_files, tmp_path):
    pr_path, gt_path = synthetic_eval_files
    bad_gt = str(tmp_path / "bad_gt.h5")
    import shutil

    shutil.copy(gt_path, bad_gt)
    with h5py.File(bad_gt, "r+") as f:
        f["0"].attrs["sample_id"] = "WRONG"
    with pytest.raises(AssertionError, match="sample ids"):
        evaluate(pr_path, bad_gt, verbose=False)


def test_invalidate_points_not_visible_in_second_image():
    from demon_tpu.eval.harness import (
        invalidate_points_not_visible_in_second_image)

    h, w = 32, 48
    inv_depth = np.full((h, w), 1.0 / 2.0, np.float32)  # plane at z=2
    # strong sideways motion: left part of image 1 leaves image 2
    motion = np.array([0, 0, 0, -1.5, 0, 0], np.float32)
    intr = np.array([0.9, 1.1, 0.5, 0.5], np.float32)
    depth = inv_depth.copy()
    invalidate_points_not_visible_in_second_image(depth, motion, intr)
    # some points invalidated, some survive
    assert np.isnan(depth).any()
    assert np.isfinite(depth).any()
    # the invisible region is on one side (contiguous columns)
    col_invalid = np.isnan(depth).all(axis=0)
    assert col_invalid.any() and not col_invalid.all()


def test_evaluate_with_depthmask(synthetic_eval_files):
    pr_path, gt_path = synthetic_eval_files
    res = evaluate(pr_path, gt_path, depthmask=True, verbose=False)
    v = res.get(("snap_10000", "3_refined", "0", "depth_l1_inverse", 0))
    assert np.isfinite(v)
