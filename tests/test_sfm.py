"""Sequence-level SfM tests: Lie ops, pose-graph GN convergence, Schur BA
convergence, distributed BA on a mesh, and ATE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demon_tpu.sfm import (
    BAProblem,
    PoseGraphEdge,
    absolute_trajectory_error,
    align_umeyama,
    bundle_adjust,
    chain_relative_poses,
    optimize_pose_graph,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
)
from demon_tpu.sfm.lie import se3_compose, se3_inverse
from demon_tpu.sfm.trajectory import camera_centers


def test_lie_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(8, 3) * 0.8)
    np.testing.assert_allclose(so3_log(so3_exp(w)), w, atol=1e-5)
    xi = jnp.asarray(rng.randn(8, 6) * 0.5)
    R, t = se3_exp(xi)
    np.testing.assert_allclose(se3_log(R, t), xi, atol=1e-5)
    # inverse/compose
    Ri, ti = se3_inverse(R, t)
    Re, te = se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(Re, np.broadcast_to(np.eye(3), Re.shape),
                               atol=1e-6)
    np.testing.assert_allclose(te, 0.0, atol=1e-6)


def _random_trajectory(rng, n):
    xi = rng.randn(n - 1, 6) * np.array([0.1, 0.1, 0.1, 0.4, 0.4, 0.4])
    R_rel, t_rel = se3_exp(jnp.asarray(xi))
    return chain_relative_poses(R_rel, t_rel), (R_rel, t_rel)


def test_chain_relative_poses():
    rng = np.random.RandomState(1)
    (R, t), (R_rel, t_rel) = _random_trajectory(rng, 5)
    # T_{i+1} == T_rel o T_i
    for i in range(4):
        Rc, tc = se3_compose(R_rel[i], t_rel[i], R[i], t[i])
        np.testing.assert_allclose(R[i + 1], Rc, atol=1e-6)
        np.testing.assert_allclose(t[i + 1], tc, atol=1e-6)


def test_pose_graph_exact_edges_converge_to_machine_precision():
    """With exact, consistent edges GN must drive the cost to ~0 and
    recover the ground-truth poses — a regression guard for solver
    precision (on TPU the normal-equation matmuls must run at
    Precision.HIGHEST or GN limit-cycles at ~4e-3 rad; see
    pose_graph.optimize_pose_graph)."""
    rng = np.random.RandomState(7)
    n = 6
    (R_gt, t_gt), (R_rel, t_rel) = _random_trajectory(rng, n)
    edges = PoseGraphEdge(
        i=jnp.asarray(range(n - 1), jnp.int32),
        j=jnp.asarray(range(1, n), jnp.int32),
        R_ij=R_rel, t_ij=t_rel, weight=jnp.ones(n - 1),
    )
    # perturb the initialization, keep pose 0 fixed at GT (gauge)
    xi = rng.randn(n, 6) * 0.01
    xi[0] = 0
    dR, dt = se3_exp(jnp.asarray(xi))
    R0, t0 = se3_compose(dR, dt, R_gt, t_gt)
    R_opt, t_opt, costs = jax.jit(
        lambda R, t: optimize_pose_graph(R, t, edges, iterations=12)
    )(R0, t0)
    assert float(costs[-1]) < 1e-10, np.asarray(costs)
    np.testing.assert_allclose(np.asarray(R_opt), np.asarray(R_gt),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_opt), np.asarray(t_gt),
                               atol=1e-5)


def test_pose_graph_recovers_noisy_chain():
    rng = np.random.RandomState(2)
    n = 8
    (R_gt, t_gt), (R_rel, t_rel) = _random_trajectory(rng, n)

    # noisy odometry edges + exact loop-closure edge 0 -> n-1
    noise = jnp.asarray(rng.randn(n - 1, 6) * 0.03)
    dR, dt = se3_exp(noise)
    R_noisy, t_noisy = se3_compose(dR, dt, R_rel, t_rel)

    (R_init, t_init) = chain_relative_poses(R_noisy, t_noisy)

    Rl, tl = se3_compose(R_gt[n - 1], t_gt[n - 1],
                         *se3_inverse(R_gt[0], t_gt[0]))
    edges = PoseGraphEdge(
        i=jnp.asarray(list(range(n - 1)) + [0], jnp.int32),
        j=jnp.asarray(list(range(1, n)) + [n - 1], jnp.int32),
        R_ij=jnp.concatenate([R_noisy, Rl[None]]),
        t_ij=jnp.concatenate([t_noisy, tl[None]]),
        weight=jnp.asarray([1.0] * (n - 1) + [10.0]),
    )
    R_opt, t_opt, costs = jax.jit(
        lambda R0, t0: optimize_pose_graph(R0, t0, edges, iterations=10)
    )(R_init, t_init)
    assert float(costs[-1]) < float(costs[0])
    # loop closure satisfied after optimization
    Rp, tp = se3_compose(R_opt[n - 1], t_opt[n - 1],
                         *se3_inverse(R_opt[0], t_opt[0]))
    np.testing.assert_allclose(Rp, Rl, atol=0.05)


def _make_ba_problem(rng, n_cams=4, n_pts=60):
    # cameras looking at points around origin from z = -4
    xi = rng.randn(n_cams, 6) * np.array([0.05, 0.05, 0.05, 0.2, 0.2, 0.2])
    xi[0] = 0
    R_gt, t_gt = se3_exp(jnp.asarray(xi))
    t_gt = t_gt + jnp.asarray([0.0, 0.0, 4.0])  # points land in front
    X_gt = jnp.asarray(rng.uniform(-1, 1, (n_pts, 3)))
    intr = jnp.asarray([0.9, 1.1, 0.5, 0.5])

    from demon_tpu.sfm.ba import _project

    cam_idx = jnp.tile(jnp.arange(n_cams, dtype=jnp.int32)[None], (n_pts, 1))
    uv = jax.vmap(lambda X: _project(R_gt, t_gt, X, intr)[0])(X_gt)
    weight = jnp.ones((n_pts, n_cams))
    return (R_gt, t_gt, X_gt, intr,
            BAProblem(cam_idx=cam_idx, uv=uv, weight=weight, intrinsics=intr))


def test_bundle_adjust_converges():
    rng = np.random.RandomState(3)
    R_gt, t_gt, X_gt, intr, problem = _make_ba_problem(rng)
    n = R_gt.shape[0]

    # perturb cameras (not cam 0) and points
    xi_n = rng.randn(n, 6) * 0.02
    xi_n[0] = 0
    dR, dt = se3_exp(jnp.asarray(xi_n))
    R0, t0 = se3_compose(dR, dt, R_gt, t_gt)
    X0 = X_gt + jnp.asarray(rng.randn(*X_gt.shape) * 0.05)

    R_opt, t_opt, X_opt, costs = jax.jit(
        lambda R, t, X: bundle_adjust(R, t, X, problem, iterations=8)
    )(R0, t0, X0)
    assert float(costs[-1]) < 1e-8, costs
    np.testing.assert_allclose(np.asarray(R_opt), np.asarray(R_gt), atol=1e-3)


def test_bundle_adjust_distributed_matches_single():
    """shard_map over the point axis with psum must reproduce the
    single-device solution."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    rng = np.random.RandomState(4)
    R_gt, t_gt, X_gt, intr, problem = _make_ba_problem(rng, n_cams=3,
                                                       n_pts=64)
    n = R_gt.shape[0]
    xi_n = rng.randn(n, 6) * 0.02
    xi_n[0] = 0
    dR, dt = se3_exp(jnp.asarray(xi_n))
    R0, t0 = se3_compose(dR, dt, R_gt, t_gt)
    X0 = X_gt + jnp.asarray(rng.randn(*X_gt.shape) * 0.03)

    R_s, t_s, X_s, costs_s = bundle_adjust(R0, t0, X0, problem, iterations=4)

    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices), ("pts",))

    @jax.jit
    def distributed(R, t, X, problem):
        fn = shard_map(
            lambda R, t, X, cam_idx, uv, w: bundle_adjust(
                R, t, X,
                BAProblem(cam_idx, uv, w, intr),
                iterations=4, axis_name="pts"),
            mesh=mesh,
            in_specs=(P(), P(), P("pts"), P("pts"), P("pts"), P("pts")),
            out_specs=(P(), P(), P("pts"), P()),
        )
        return fn(R, t, X, problem.cam_idx, problem.uv, problem.weight)

    R_d, t_d, X_d, costs_d = distributed(R0, t0, X0, problem)
    np.testing.assert_allclose(np.asarray(costs_d), np.asarray(costs_s),
                               rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(np.asarray(R_d), np.asarray(R_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(X_d), np.asarray(X_s), atol=1e-4)


def test_ate_alignment():
    rng = np.random.RandomState(5)
    ref = rng.randn(20, 3)
    s, Rm, tv = 2.0, np.asarray(so3_exp(jnp.asarray([0.1, 0.2, -0.1]))), \
        np.array([1.0, -2.0, 0.5])
    est = ((ref - tv) @ Rm) / s  # inverse of ref = s R est + t
    ate = absolute_trajectory_error(est, ref, with_scale=True)
    assert ate < 1e-6
    # with noise ATE ~ noise level
    est2 = est + rng.randn(20, 3) * 0.01 / s
    assert 0.001 < absolute_trajectory_error(est2, ref) < 0.05


def test_camera_centers():
    xi = jnp.asarray(np.random.RandomState(6).randn(4, 6) * 0.3)
    R, t = se3_exp(xi)
    C = camera_centers(np.asarray(R), np.asarray(t))
    # R C + t == 0
    np.testing.assert_allclose(
        np.einsum("nij,nj->ni", np.asarray(R), C) + np.asarray(t), 0.0,
        atol=1e-6)


def test_bundle_adjust_sparse_matches_dense():
    """The block-sparse Schur assembly must reproduce the dense variant."""
    from demon_tpu.sfm.ba import bundle_adjust_sparse

    rng = np.random.RandomState(7)
    R_gt, t_gt, X_gt, intr, problem = _make_ba_problem(rng, n_cams=4,
                                                       n_pts=40)
    n = R_gt.shape[0]
    xi_n = rng.randn(n, 6) * 0.02
    xi_n[0] = 0
    dR, dt = se3_exp(jnp.asarray(xi_n))
    R0, t0 = se3_compose(dR, dt, R_gt, t_gt)
    X0 = X_gt + jnp.asarray(rng.randn(*X_gt.shape) * 0.04)

    R_d, t_d, X_d, c_d = jax.jit(
        lambda R, t, X: bundle_adjust(R, t, X, problem, iterations=4)
    )(R0, t0, X0)
    R_s, t_s, X_s, c_s = jax.jit(
        lambda R, t, X: bundle_adjust_sparse(R, t, X, problem, iterations=4)
    )(R0, t0, X0)

    np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_d), rtol=1e-4,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(R_s), np.asarray(R_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(X_s), np.asarray(X_d), atol=1e-4)


def test_bundle_adjust_cg_matches_dense():
    """The matrix-free block-Jacobi PCG solve must reproduce the dense
    Schur solve (same assembled system, different solver)."""
    from demon_tpu.sfm.ba import bundle_adjust_sparse

    rng = np.random.RandomState(11)
    R_gt, t_gt, X_gt, intr, problem = _make_ba_problem(rng, n_cams=5,
                                                       n_pts=50)
    n = R_gt.shape[0]
    xi_n = rng.randn(n, 6) * 0.02
    xi_n[0] = 0
    dR, dt = se3_exp(jnp.asarray(xi_n))
    R0, t0 = se3_compose(dR, dt, R_gt, t_gt)
    X0 = X_gt + jnp.asarray(rng.randn(*X_gt.shape) * 0.04)

    R_d, t_d, X_d, c_d = jax.jit(
        lambda R, t, X: bundle_adjust_sparse(R, t, X, problem, iterations=4)
    )(R0, t0, X0)
    R_c, t_c, X_c, c_c = jax.jit(
        lambda R, t, X: bundle_adjust_sparse(R, t, X, problem, iterations=4,
                                             solver="cg", cg_iters=120)
    )(R0, t0, X0)

    np.testing.assert_allclose(np.asarray(c_c), np.asarray(c_d), rtol=1e-4,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(R_c), np.asarray(R_d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_d), atol=1e-4)


def test_bundle_adjust_cg_1000_cameras():
    """Trajectory-scale BA: 1000 cameras, matrix-free CG (the dense
    [6N,6N] solve would need ~144 MB + O(N^3) factorization). A long
    noisy trajectory must optimize in-memory and reduce both reprojection
    cost and pose error (VERDICT round-1 item 8)."""
    from demon_tpu.sfm.ba import BAProblem, _project, bundle_adjust_sparse

    rng = np.random.RandomState(3)
    n_cams, n_pts, obs = 1000, 4000, 4

    # forward-moving trajectory with small per-step rotations
    xi = np.zeros((n_cams, 6))
    xi[:, 3] = 0.04  # step in x
    xi[:, :3] = rng.randn(n_cams, 3) * 0.003
    xi[0] = 0
    R_list, t_list = [np.eye(3)], [np.zeros(3)]
    for i in range(1, n_cams):
        dR = np.asarray(se3_exp(jnp.asarray(xi[i][None]))[0])[0]
        dtv = np.asarray(se3_exp(jnp.asarray(xi[i][None]))[1])[0]
        R_list.append(dR @ R_list[-1])
        t_list.append(dR @ t_list[-1] + dtv)
    R_gt = jnp.asarray(np.stack(R_list))
    t_gt = jnp.asarray(np.stack(t_list)) + jnp.asarray([0.0, 0.0, 3.0])

    # each point observed by `obs` consecutive cameras near its anchor
    anchor = rng.randint(0, n_cams - obs, n_pts)
    cam_idx = jnp.asarray(
        anchor[:, None] + np.arange(obs)[None], jnp.int32)
    # points scattered along the trajectory tube (world coords)
    X_gt = np.zeros((n_pts, 3))
    X_gt[:, 0] = -anchor * 0.04 + rng.uniform(-0.5, 0.5, n_pts)
    X_gt[:, 1] = rng.uniform(-1, 1, n_pts)
    X_gt[:, 2] = rng.uniform(-1, 1, n_pts)
    X_gt = jnp.asarray(X_gt)
    intr = jnp.asarray([0.9, 1.1, 0.5, 0.5])
    uv = jax.vmap(
        lambda X, ci: _project(R_gt[ci], t_gt[ci], X, intr)[0]
    )(X_gt, cam_idx)
    weight = jnp.ones((n_pts, obs))
    problem = BAProblem(cam_idx=cam_idx, uv=uv, weight=weight,
                        intrinsics=intr)

    # perturb
    xi_n = rng.randn(n_cams, 6) * 0.004
    xi_n[0] = 0
    dR, dt = se3_exp(jnp.asarray(xi_n))
    R0, t0 = se3_compose(dR, dt, R_gt, t_gt)
    X0 = X_gt + jnp.asarray(rng.randn(n_pts, 3) * 0.02)

    R_o, t_o, X_o, costs = jax.jit(
        lambda R, t, X: bundle_adjust_sparse(
            R, t, X, problem, iterations=3, damping=1e-5,
            solver="cg", cg_iters=150)
    )(R0, t0, X0)

    costs = np.asarray(costs)
    assert costs[-1] < 1e-3 * costs[0], costs
    # pose error shrinks (translation RMSE vs ground truth)
    err0 = float(np.sqrt(np.mean((np.asarray(t0) - np.asarray(t_gt)) ** 2)))
    err1 = float(np.sqrt(np.mean((np.asarray(t_o) - np.asarray(t_gt)) ** 2)))
    assert err1 < 0.3 * err0, (err0, err1)


def test_bundle_adjust_robust_rejects_outlier():
    """One gross-outlier observation: plain GN drags the cameras off the
    ground truth; IRLS-Huber (robust_delta) recovers them."""
    from demon_tpu.sfm.ba import bundle_adjust_sparse

    rng = np.random.RandomState(11)
    R_gt, t_gt, X_gt, intr, problem = _make_ba_problem(rng)
    n = R_gt.shape[0]

    # corrupt one observation by half the image width
    uv = np.asarray(problem.uv).copy()
    uv[0, 1, 0] += 0.5
    problem = problem._replace(uv=jnp.asarray(uv))

    xi_n = rng.randn(n, 6) * 0.02
    xi_n[0] = 0
    dR, dt = se3_exp(jnp.asarray(xi_n))
    R0, t0 = se3_compose(dR, dt, R_gt, t_gt)
    X0 = X_gt + jnp.asarray(rng.randn(*X_gt.shape) * 0.05)

    run = lambda delta: bundle_adjust_sparse(
        R0, t0, X0, problem, iterations=8, robust_delta=delta)
    R_plain, t_plain, _, _ = jax.jit(lambda: run(None))()
    R_rob, t_rob, _, _ = jax.jit(lambda: run(0.02))()

    err = lambda tt: float(jnp.abs(tt - t_gt).max())
    rerr = lambda RR: float(jnp.abs(RR - R_gt).max())
    assert err(t_rob) < err(t_plain) * 0.5, (err(t_rob), err(t_plain))
    assert rerr(R_rob) < rerr(R_plain) * 0.5, (rerr(R_rob), rerr(R_plain))
    np.testing.assert_allclose(np.asarray(R_rob), np.asarray(R_gt),
                               atol=1e-2)


def test_reprojection_residuals_shape_and_zero_at_gt():
    from demon_tpu.sfm.ba import reprojection_residuals

    rng = np.random.RandomState(12)
    R_gt, t_gt, X_gt, intr, problem = _make_ba_problem(rng)
    res = np.asarray(reprojection_residuals(R_gt, t_gt, X_gt, problem))
    assert res.shape == problem.uv.shape[:2]
    assert res.max() < 1e-6
