"""Scale propagation + chaining math on synthetic geometry (bypasses the
network: feeds analytically consistent pairwise 'predictions')."""

import numpy as np
import pytest

from demon_tpu.data.host_geometry import angleaxis_to_rotation_matrix
from demon_tpu.sfm.chaining import propagate_scales
from demon_tpu.sfm.trajectory import absolute_trajectory_error, camera_centers


def _plane_depth_simple(h, w, K, R, t, plane_z=5.0):
    """Camera-z depth of world plane z = plane_z for camera (R, t)."""
    ys, xs = np.mgrid[0:h, 0:w]
    rays_cam = np.stack([
        ((xs + 0.5) - K[0, 2]) / K[0, 0],
        ((ys + 0.5) - K[1, 2]) / K[1, 1],
        np.ones((h, w)),
    ], -1)
    C = -R.T @ t
    dirs_world = rays_cam @ R  # unit-z cam rays in world
    lam = (plane_z - C[2]) / dirs_world[..., 2]
    # X_world = C + lam*dirs ; z_cam = (R X + t)_z = lam * rays_cam_z = lam
    return lam.astype(np.float32)


def test_propagate_scales_consistent_sequence():
    """3 frames translating along x viewing a fronto-parallel plane; each
    pair normalized to unit baseline => known scale chain."""
    h, w = 48, 64
    intr = np.array([0.9, 1.1, 0.5, 0.5])
    K = np.array([[intr[0] * w, 0, intr[2] * w],
                  [0, intr[1] * h, intr[3] * h], [0, 0, 1.0]])
    baselines = [0.4, 0.8]  # frame spacing varies -> scale ratio 0.5
    positions = [0.0, 0.4, 1.2]
    R = np.eye(3)

    inv_depths = []
    rotations = []
    translations = []
    for k in range(2):
        # pair k: frames k -> k+1, world := cam k frame
        t_rel = np.array([positions[k] - positions[k + 1], 0, 0])
        s = 1.0 / np.linalg.norm(t_rel)  # normalize baseline to 1
        depth_k = _plane_depth_simple(
            h, w, K, np.eye(3), np.array([-positions[k], 0, 0]))
        inv_depths.append(1.0 / (depth_k * s))  # depth rescaled like reader
        rotations.append(np.zeros(3))
        translations.append(t_rel * s)
    scales = propagate_scales(np.stack(inv_depths), np.stack(rotations),
                              np.stack(translations), intr)
    # pair 1 has baseline 0.8 vs pair 0's 0.4 => to express pair-1 units in
    # pair-0 units multiply by 2
    np.testing.assert_allclose(scales, [1.0, 2.0], rtol=0.05)


def test_chained_trajectory_ate_zero_on_exact_predictions():
    """chain_relative_poses + pose graph on exact relative poses yields
    zero ATE."""
    import jax.numpy as jnp

    from demon_tpu.sfm.pose_graph import chain_relative_poses

    rng = np.random.RandomState(0)
    n = 6
    R_rel = np.stack([angleaxis_to_rotation_matrix(rng.randn(3) * 0.1)
                      for _ in range(n - 1)])
    t_rel = rng.randn(n - 1, 3) * 0.5
    R_abs, t_abs = chain_relative_poses(jnp.asarray(R_rel, jnp.float32),
                                        jnp.asarray(t_rel, jnp.float32))
    C = camera_centers(np.asarray(R_abs), np.asarray(t_abs))
    # ground truth by direct composition
    R_gt = [np.eye(3)]
    t_gt = [np.zeros(3)]
    for k in range(n - 1):
        R_gt.append(R_rel[k] @ R_gt[-1])
        t_gt.append(R_rel[k] @ t_gt[-1] + t_rel[k])
    C_gt = camera_centers(np.stack(R_gt), np.stack(t_gt))
    assert absolute_trajectory_error(C, C_gt, with_scale=False) < 1e-5


def test_ba_from_pairwise_predictions():
    """build_ba_problem + bundle_adjust on analytically consistent
    pairwise predictions: zero cost at the true poses, and recovery from
    perturbed poses."""
    import jax
    import jax.numpy as jnp

    from demon_tpu.sfm.ba import bundle_adjust
    from demon_tpu.sfm.chaining import build_ba_problem
    from demon_tpu.sfm.lie import se3_compose, se3_exp

    h, w = 24, 32
    intr = np.array([0.9, 1.1, 0.5, 0.5])
    plane_z = 4.0
    positions = [0.0, 0.3, 0.7]  # camera centers on x axis
    n = len(positions)

    # absolute world-to-cam poses (identity rotation)
    R_gt = np.stack([np.eye(3)] * n)
    t_gt = np.stack([[-p, 0.0, 0.0] for p in positions])

    inv_depths = []
    flows = []
    scales = []
    ys, xs = np.mgrid[0:h, 0:w]
    u = (xs + 0.5) / w
    v = (ys + 0.5) / h
    for k in range(n - 1):
        b = positions[k + 1] - positions[k]
        s = 1.0 / abs(b)  # pair scale: unit baseline
        depth_k = np.full((h, w), plane_z, np.float32)
        inv_depths.append((1.0 / (depth_k * s)).astype(np.float32))
        scales.append(1.0 / s)
        # normalized flow for translation (-b, 0, 0) in cam frame:
        # du = fx * (-b) / z
        du = intr[0] * (-b) / depth_k
        flows.append(np.stack([du, np.zeros_like(du)], -1).astype(np.float32))
    scales = np.asarray(scales) / scales[0]  # pair-0 scale convention

    # express GT in pair-0 scale (baseline 0->1 is 0.3 world units; the
    # chain normalizes pair 0 to unit baseline)
    world_scale = 1.0 / 0.3
    t_gt_scaled = t_gt * world_scale

    preds = {"inv_depth2": np.stack(inv_depths), "flow2": np.stack(flows)}
    # NOTE scales here link pair baselines: scales[k] converts pair-k
    # units into pair-0 units
    pair_scales = np.asarray([1.0, (0.7 - 0.3) / 0.3])

    points, problem = build_ba_problem(
        preds, R_gt[:-1].astype(np.float32),
        t_gt_scaled[:-1].astype(np.float32), pair_scales, intr,
        points_per_frame=48)

    ba = jax.jit(lambda R, t, X: bundle_adjust(R, t, X, problem,
                                               iterations=5))
    R0 = jnp.asarray(R_gt, jnp.float32)
    t0 = jnp.asarray(t_gt_scaled, jnp.float32)
    _, _, _, costs_gt = ba(R0, t0, jnp.asarray(points))
    assert float(costs_gt[0]) < 1e-6, costs_gt

    # perturb the last two poses; BA must reduce the cost drastically
    rng = np.random.RandomState(0)
    xi = np.zeros((n, 6), np.float32)
    xi[1:] = rng.randn(n - 1, 6) * 0.01
    dR, dt = se3_exp(jnp.asarray(xi))
    Rp, tp = se3_compose(dR, dt, R0, t0)
    R_ba, t_ba, X_ba, costs = ba(Rp, tp, jnp.asarray(points))
    assert float(costs[-1]) < float(costs[0]) * 1e-2, costs
    np.testing.assert_allclose(np.asarray(t_ba[1]), np.asarray(t0[1]),
                               atol=0.05)


def test_ba_multiframe_tracks():
    """track_length > 2: flow chaining produces points observed by 3+
    cameras (bilinear flow composition), the cost at GT stays ~0, and the
    extra couplings recover a perturbed middle pose that pairwise (L=2)
    anchoring constrains more weakly."""
    import jax
    import jax.numpy as jnp

    from demon_tpu.sfm.ba import bundle_adjust
    from demon_tpu.sfm.chaining import build_ba_problem
    from demon_tpu.sfm.lie import se3_exp

    h, w = 24, 32
    intr = np.array([0.9, 1.1, 0.5, 0.5])
    plane_z = 4.0
    positions = [0.0, 0.3, 0.6, 0.9]  # equal baselines -> all scales 1
    n = len(positions)
    R_gt = np.stack([np.eye(3)] * n)
    t_gt = np.stack([[-p / 0.3, 0.0, 0.0] for p in positions])  # pair-0 scale

    inv_depths, flows = [], []
    for k in range(n - 1):
        b = positions[k + 1] - positions[k]
        depth_k = np.full((h, w), plane_z / b, np.float32)  # unit baseline
        inv_depths.append(1.0 / depth_k)
        du = intr[0] * (-1.0) / depth_k
        flows.append(np.stack([du, np.zeros_like(du)], -1).astype(np.float32))
    preds = {"inv_depth2": np.stack(inv_depths), "flow2": np.stack(flows)}
    pair_scales = np.ones(n - 1)

    points, problem = build_ba_problem(
        preds, R_gt[:-1].astype(np.float32), t_gt[:-1].astype(np.float32),
        pair_scales, intr, points_per_frame=48, track_length=3)

    live = np.asarray((problem.weight > 0).sum(-1))
    assert problem.weight.shape[1] == 3
    assert (live >= 3).sum() > 0, "no multi-frame tracks built"

    ba = jax.jit(lambda R, t, X: bundle_adjust(R, t, X, problem,
                                               iterations=6))
    R0 = jnp.asarray(R_gt, jnp.float32)
    t0 = jnp.asarray(t_gt, jnp.float32)
    _, _, _, costs_gt = ba(R0, t0, jnp.asarray(points))
    assert float(costs_gt[0]) < 1e-5, costs_gt

    rng = np.random.RandomState(1)
    xi = np.zeros((n, 6), np.float32)
    xi[2] = rng.randn(6) * 0.03  # perturb a middle camera
    dR, dt = jax.vmap(se3_exp)(jnp.asarray(xi))
    Rp = jnp.einsum("nij,njk->nik", dR, R0)
    tp = jnp.einsum("nij,nj->ni", dR, t0) + dt
    _, _, _, costs = ba(Rp, tp, jnp.asarray(points))
    assert float(costs[-1]) < 0.05 * float(costs[0]), costs


def test_ba_problem_conf_weighting_and_gating():
    """conf2 scales chained observation weights (cumulative product of
    the mean x/y confidence along the chain) and gate_residual zeroes
    observations that start grossly off, re-applying the 2-obs rule."""
    from demon_tpu.sfm.chaining import build_ba_problem

    h, w = 24, 32
    intr = np.array([0.9, 1.1, 0.5, 0.5])
    plane_z = 4.0
    positions = [0.0, 0.3, 0.6]
    n = len(positions)
    R_gt = np.stack([np.eye(3)] * n)
    t_gt = np.stack([[-p / 0.3, 0.0, 0.0] for p in positions])

    inv_depths, flows = [], []
    for k in range(n - 1):
        depth_k = np.full((h, w), plane_z / 0.3, np.float32)
        inv_depths.append(1.0 / depth_k)
        du = intr[0] * (-1.0) / depth_k
        flows.append(np.stack([du, np.zeros_like(du)], -1).astype(np.float32))
    preds = {"inv_depth2": np.stack(inv_depths), "flow2": np.stack(flows),
             "conf2": np.full((n - 1, h, w, 2), 0.5, np.float32)}
    pair_scales = np.ones(n - 1)

    # conf off: chained obs weights are 0/1
    _, plain = build_ba_problem(
        preds, R_gt.astype(np.float32), t_gt.astype(np.float32),
        pair_scales, intr, points_per_frame=48, conf_weighted=False)
    w_plain = np.asarray(plain.weight)
    assert set(np.unique(w_plain)) <= {0.0, 1.0}

    # conf on: chained obs carry ~0.5 weight, anchors stay 1
    _, conf = build_ba_problem(
        preds, R_gt.astype(np.float32), t_gt.astype(np.float32),
        pair_scales, intr, points_per_frame=48, conf_weighted=True)
    w_conf = np.asarray(conf.weight)
    live = w_plain > 0
    anchors = live & (np.arange(w_plain.shape[1])[None] == 0)
    chained = live & ~anchors
    assert np.allclose(w_conf[anchors], 1.0)
    assert np.allclose(w_conf[chained], 0.5, atol=1e-5)

    # gating: consistent geometry -> nothing gated at a sane threshold
    _, gated = build_ba_problem(
        preds, R_gt.astype(np.float32), t_gt.astype(np.float32),
        pair_scales, intr, points_per_frame=48, conf_weighted=False,
        gate_residual=0.05)
    assert np.array_equal(np.asarray(gated.weight) > 0, w_plain > 0)

    # corrupt pair-1 flow so chained obs of frame-1 points start far off:
    # those observations must be gated and their 1-obs tracks killed
    bad = dict(preds)
    bad_flows = preds["flow2"].copy()
    bad_flows[1] += 0.4
    bad["flow2"] = bad_flows
    _, gated_bad = build_ba_problem(
        bad, R_gt.astype(np.float32), t_gt.astype(np.float32),
        pair_scales, intr, points_per_frame=48, conf_weighted=False,
        gate_residual=0.05)
    w_bad = np.asarray(gated_bad.weight)
    # frame-1 seeded tracks chain through the corrupted flow -> dead
    n_seed = w_plain.shape[0] // (n - 1)
    assert (w_bad[n_seed:] == 0).all()
    # frame-0 seeded tracks (chained through the good pair-0 flow) live
    assert (w_bad[:n_seed] > 0).any()
