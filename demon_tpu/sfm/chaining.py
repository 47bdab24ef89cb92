"""Chain pairwise DeMoN predictions over an image sequence into a
trajectory: batched pairwise inference -> monocular scale propagation ->
pose graph -> optional bundle adjustment.

Scale propagation: each pair's translation is unit-norm with depth scaled
to match (the network's training convention), so consecutive pairs live
at different scales. Pair k predicts depth for frame k; reprojecting that
depth into frame k+1 and comparing against pair k+1's depth (median z
ratio — the view_tools.compute_depth_ratios statistic) links the scales.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..data.host_geometry import angleaxis_to_rotation_matrix
from ..data.view import View
from ..tools.view_tools import compute_depth_ratios
from .pose_graph import PoseGraphEdge, chain_relative_poses, optimize_pose_graph


def predict_sequence_pairs(engine, params, images: np.ndarray,
                           intrinsics: Optional[np.ndarray] = None) -> Dict:
    """Run the engine on all consecutive pairs of a sequence at once.

    images: [N, H, W, 3] float32 in [-0.5, 0.5] at the network resolution.
    Returns dict with rotation [N-1, 3], translation [N-1, 3],
    depth (inverse) [N-1, h, w].
    """
    import jax.numpy as jnp

    from ..models import DEMON_INTRINSICS
    from ..ops import recursive_median_downsample

    n = images.shape[0]
    image_pair = np.concatenate([images[:-1], images[1:]], axis=-1)
    image2 = jnp.asarray(images[1:])
    image2_2 = recursive_median_downsample(image2, 2)[-1]
    if intrinsics is None:
        intrinsics = np.broadcast_to(DEMON_INTRINSICS, (n - 1, 4))
    out = engine.predict(params, jnp.asarray(image_pair), image2_2,
                         jnp.asarray(intrinsics))
    return {
        "rotation": np.asarray(out.prediction.rotation, np.float64),
        "translation": np.asarray(out.prediction.translation, np.float64),
        "inv_depth2": np.asarray(out.prediction.depth2)[..., 0],
        "flow2": np.asarray(out.prediction.flow2),
        # per-pixel flow confidence c = exp(-s|f_pr - f_gt|) learned by
        # the flow head (train/losses.py compute_confidence_map) — used
        # to weight the flow-anchored BA observations
        "conf2": np.asarray(out.prediction.conf2),
        "depth_refined": np.asarray(out.depth_refined)[..., 0],
    }


def propagate_scales(inv_depths: np.ndarray, rotations: np.ndarray,
                     translations: np.ndarray,
                     intrinsics_norm: np.ndarray) -> np.ndarray:
    """Per-pair scale factors s_k (s_0 = 1) linking unit-baseline pairs.

    inv_depths: [P, h, w] inverse depth of frame k from pair k.
    rotations/translations: [P, 3] relative motion of pair k (unit t).
    Returns scales [P].
    """
    p, h, w = inv_depths.shape
    K = np.array([
        [intrinsics_norm[0] * w, 0, intrinsics_norm[2] * w],
        [0, intrinsics_norm[1] * h, intrinsics_norm[3] * h],
        [0, 0, 1.0],
    ])
    scales = np.ones(p)
    for k in range(p - 1):
        with np.errstate(divide="ignore"):
            depth_k = 1.0 / inv_depths[k]
            depth_k1 = 1.0 / inv_depths[k + 1]
        R = angleaxis_to_rotation_matrix(rotations[k])
        t = translations[k]
        # view1 = frame k in its own camera frame; view2 = frame k+1 with
        # the pair-k relative pose (world := frame k camera frame)
        v1 = View(R=np.eye(3), t=np.zeros(3), K=K, image=None,
                  depth=depth_k.astype(np.float32), depth_metric="camera_z")
        v2 = View(R=R, t=t, K=K, image=None,
                  depth=depth_k1.astype(np.float32), depth_metric="camera_z")
        ratios = compute_depth_ratios(v1, v2)
        valid = np.isfinite(ratios)
        if valid.sum() < 16:
            ratio = 1.0
        else:
            # z_projected(scale of pair k) / z_stored(scale of pair k+1)
            ratio = float(np.median(ratios[valid]))
        scales[k + 1] = scales[k] * ratio
    return scales


def _sample_flow(flow: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Bilinear-sample a normalized flow field [h, w, 2] at normalized
    coords (u, v). Returns (flow_at_uv [N, 2], valid [N])."""
    h, w = flow.shape[:2]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    inb = (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    wx = (x - x0c)[:, None]
    wy = (y - y0c)[:, None]
    f = (flow[y0c, x0c] * (1 - wx) * (1 - wy)
         + flow[y0c, x0c + 1] * wx * (1 - wy)
         + flow[y0c + 1, x0c] * (1 - wx) * wy
         + flow[y0c + 1, x0c + 1] * wx * wy)
    return f, inb & np.isfinite(f).all(axis=-1)


def build_ba_problem(preds: Dict, R: np.ndarray, t: np.ndarray,
                     scales: np.ndarray, intrinsics_norm: np.ndarray,
                     points_per_frame: int = 64, track_length: int = 2,
                     conf_weighted: bool = True,
                     gate_residual: Optional[float] = None):
    """Flow-anchored bundle-adjustment problem from pairwise predictions.

    For a grid of valid pixels p of frame k the network's flow chain
    provides up to `track_length` measurements: p in frame k, p+flow_k(p)
    in frame k+1, then flow_{k+1} bilinearly sampled at the chained
    position for frame k+2, and so on while the track stays in-bounds and
    finite (multi-frame observations — each world point can couple more
    than two cameras, which is what makes BA stiffer than the pairwise
    pose graph). The world point comes from frame k's depth at the
    chained pose. Tracks shorter than `track_length` are weight-0 padded
    (BAProblem's fixed-arity layout).

    `conf_weighted`: weight each chained observation by the cumulative
    product of the flow head's own confidence (preds["conf2"], mean of
    the x/y channels, sampled along the chain) — low-confidence flow
    (occlusions, texture-poor regions) stops dragging the poses with
    full weight. The frame-k anchor observation keeps weight 1.

    `gate_residual` (normalized image coords): zero out observations
    whose INITIAL reprojection residual under (R, t, point) exceeds the
    threshold — gross outlier tracks (flow chained across an occlusion
    boundary) are removed before the solver sees them; the >=2-live-obs
    rule is re-applied after gating.

    Returns (points [M, 3] world, BAProblem) — numpy inputs, jit-ready.
    """
    import jax.numpy as jnp

    from .ba import BAProblem

    inv_depths = preds["inv_depth2"]
    flows = preds["flow2"] if "flow2" in preds else None
    confs = preds.get("conf2")
    p_cnt, h, w = inv_depths.shape
    L = max(2, int(track_length))

    pts_world = []
    cam_idx = []
    uvs = []
    weights = []
    stride = max(1, int(np.sqrt(h * w / points_per_frame)))
    ys, xs = np.mgrid[stride // 2 : h : stride, stride // 2 : w : stride]
    ys = ys.ravel()
    xs = xs.ravel()
    n_seed = len(ys)
    for k in range(p_cnt):
        inv_d = inv_depths[k][ys, xs] / scales[k]  # global-scale inverse
        u = (xs + 0.5) / w
        v = (ys + 0.5) / h
        ok = np.isfinite(inv_d) & (inv_d > 0)

        obs_uv = np.zeros((n_seed, L, 2), np.float32)
        obs_w = np.zeros((n_seed, L), np.float32)
        obs_cam = np.zeros((n_seed, L), np.int64)
        obs_uv[:, 0] = np.stack([u, v], -1)
        obs_w[:, 0] = ok
        obs_cam[:, 0] = k
        if flows is not None:
            uc, vc = u.copy(), v.copy()
            alive = ok.copy()
            cum_conf = np.ones(n_seed, np.float32)
            for j in range(1, L):
                fk = k + j - 1           # flow of pair fk: frame fk -> fk+1
                if fk >= p_cnt:
                    break
                if conf_weighted and confs is not None:
                    # confidence that flow_fk is right AT the chained
                    # position; multiplies down the chain (an early bad
                    # hop poisons everything after it)
                    cs, _ = _sample_flow(confs[fk], uc, vc)
                    cum_conf = cum_conf * np.clip(
                        np.nan_to_num(cs).mean(-1), 0.0, 1.0)
                fl, fok = _sample_flow(flows[fk], uc, vc)
                uc = uc + np.nan_to_num(fl[:, 0])
                vc = vc + np.nan_to_num(fl[:, 1])
                alive = alive & fok & (uc > 0) & (uc < 1) \
                    & (vc > 0) & (vc < 1)
                obs_uv[:, j] = np.stack([uc, vc], -1)
                obs_w[:, j] = alive * cum_conf
                obs_cam[:, j] = fk + 1
        else:
            # no flow: a same-position anchor in the next frame
            obs_uv[:, 1] = obs_uv[:, 0]
            obs_w[:, 1] = ok
            obs_cam[:, 1] = min(k + 1, p_cnt)

        # a point needs >=2 live observations to constrain anything; kill
        # the whole track otherwise (a 1-obs point block is rank-deficient
        # and only the LM damping would keep its inversion finite)
        obs_w *= ((obs_w > 0).sum(-1, keepdims=True) >= 2
                  ).astype(np.float32)

        with np.errstate(divide="ignore"):
            z = 1.0 / np.where(ok, inv_d, 1.0)
        fx, fy, cx, cy = intrinsics_norm[:4]
        Xc = np.stack([(u - cx) / fx * z, (v - cy) / fy * z, z], -1)
        Xw = (Xc - t[k]) @ R[k]  # R_k^T (Xc - t_k)
        pts_world.append(Xw)
        cam_idx.append(obs_cam)
        uvs.append(obs_uv)
        weights.append(obs_w)

    points = np.concatenate(pts_world).astype(np.float32)
    cam_idx = np.concatenate(cam_idx)
    uvs = np.concatenate(uvs)
    weights = np.concatenate(weights)

    if gate_residual is not None:
        # initial reprojection residuals under the pose-graph poses: an
        # observation already off by more than the gate is a broken track
        # (flow chained across an occlusion, moving texture), not noise
        # the solver should average in
        fx, fy, cx, cy = intrinsics_norm[:4]
        if len(R) <= cam_idx.max():
            raise ValueError(
                "gate_residual needs poses for every observed camera "
                f"(got {len(R)} poses, max cam index {cam_idx.max()})")
        Xc = np.einsum("moij,mj->moi", R[cam_idx], points) + t[cam_idx]
        with np.errstate(divide="ignore", invalid="ignore"):
            pred_u = fx * Xc[..., 0] / Xc[..., 2] + cx
            pred_v = fy * Xc[..., 1] / Xc[..., 2] + cy
        res = np.hypot(np.nan_to_num(pred_u - uvs[..., 0], nan=np.inf),
                       np.nan_to_num(pred_v - uvs[..., 1], nan=np.inf))
        res = np.where(Xc[..., 2] > 1e-6, res, np.inf)
        weights = np.where(res <= gate_residual, weights, 0.0)
        weights *= ((weights > 0).sum(-1, keepdims=True) >= 2)

    problem = BAProblem(
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        uv=jnp.asarray(uvs, jnp.float32),
        weight=jnp.asarray(weights, jnp.float32),
        intrinsics=jnp.asarray(intrinsics_norm[:4], jnp.float32),
    )
    return points, problem


def chain_sequence(engine, params, images: np.ndarray,
                   intrinsics: Optional[np.ndarray] = None,
                   pose_graph_iterations: int = 10,
                   run_ba: bool = False, ba_iterations: int = 8,
                   ba_points_per_frame: int = 64,
                   ba_track_length: int = 3,
                   ba_conf_weighted: bool = False,
                   ba_gate_residual: Optional[float] = None,
                   ba_robust_delta: Optional[float] = 0.01,
                   ba_motion_weight: float = 0.0
                   ) -> Dict[str, np.ndarray]:
    """images [N, H, W, 3] -> optimized trajectory.

    BA robustness: the solver runs IRLS Huber steps with scale
    `ba_robust_delta` so bad flow tracks lose their quadratic pull on
    the poses instead of dominating them. Optional extras measured
    neutral-to-negative on the trained engines (experiments/
    ba_diagnostic.py, round 5: defaults robust 0.01/8 iters improve ATE
    by 4.7%/10.2% over the pose graph on the round-4/round-3 engines):
    `ba_conf_weighted` scales observations by the flow head's conf2,
    `ba_gate_residual` drops tracks whose initial reprojection residual
    exceeds the threshold (normalized coords).

    `ba_motion_weight` > 0 additionally folds the pose-graph's
    relative-motion edges into the BA normal equations with that weight
    (ba.bundle_adjust_sparse motion_edges) — the joint SLAM-backend
    objective: reprojection refines structure/scale while the network's
    direct motion measurements keep the poses from being dragged by
    noisy flow tracks.

    Returns dict with R [N, 3, 3], t [N, 3] (world-to-cam, frame 0 =
    identity, scale of pair 0), per-pair scales, raw pairwise
    predictions, and (with run_ba) per-observation residual diagnostics
    `ba_res_before`/`ba_res_after` (median + p90 over live observations).
    """
    import jax.numpy as jnp

    from ..models import DEMON_INTRINSICS

    preds = predict_sequence_pairs(engine, params, images, intrinsics)
    intr = np.asarray(intrinsics[0] if intrinsics is not None
                      else DEMON_INTRINSICS)
    scales = propagate_scales(preds["inv_depth2"], preds["rotation"],
                              preds["translation"], intr)

    R_rel = np.stack([angleaxis_to_rotation_matrix(aa)
                      for aa in preds["rotation"]])
    t_rel = preds["translation"] * scales[:, None]

    R_init, t_init = chain_relative_poses(
        jnp.asarray(R_rel, jnp.float32), jnp.asarray(t_rel, jnp.float32))

    n = images.shape[0]
    edges = PoseGraphEdge(
        i=jnp.arange(n - 1, dtype=jnp.int32),
        j=jnp.arange(1, n, dtype=jnp.int32),
        R_ij=jnp.asarray(R_rel, jnp.float32),
        t_ij=jnp.asarray(t_rel, jnp.float32),
        weight=jnp.ones(n - 1, jnp.float32),
    )
    R_opt, t_opt, costs = optimize_pose_graph(
        R_init, t_init, edges, iterations=pose_graph_iterations)

    result = {
        "R": np.asarray(R_opt, np.float64),
        "t": np.asarray(t_opt, np.float64),
        "scales": scales,
        "pairwise": preds,
        "pose_graph_costs": np.asarray(costs),
    }

    if run_ba:
        import jax

        from .ba import bundle_adjust_sparse, reprojection_residuals

        # the predicted flow of pair k anchors each sampled depth point in
        # frames k and k+1; joint pose+point refinement over those
        # measurements
        points, problem = build_ba_problem(
            preds, result["R"].astype(np.float32),
            result["t"].astype(np.float32), scales, intr,
            points_per_frame=ba_points_per_frame,
            track_length=ba_track_length,
            conf_weighted=ba_conf_weighted,
            gate_residual=ba_gate_residual)
        # dense Schur solve up to a few hundred cameras; matrix-free
        # block-Jacobi PCG beyond (the [6N,6N] factorization stops being
        # the right tool around N~500)
        solver = "dense" if n <= 500 else "cg"
        R0 = jnp.asarray(result["R"], jnp.float32)
        t0 = jnp.asarray(result["t"], jnp.float32)
        X0 = jnp.asarray(points)

        def _res_stats(R_, t_, X_):
            r = np.asarray(reprojection_residuals(R_, t_, X_, problem))
            live = np.asarray(problem.weight) > 0
            r = r[live]
            if r.size == 0:
                return {"median": float("nan"), "p90": float("nan"),
                        "n_live": 0}
            return {"median": float(np.median(r)),
                    "p90": float(np.percentile(r, 90)),
                    "n_live": int(live.sum())}

        motion = None
        if ba_motion_weight > 0:
            motion = edges._replace(
                weight=jnp.full(n - 1, ba_motion_weight, jnp.float32))
        result["ba_res_before"] = _res_stats(R0, t0, X0)
        R_ba, t_ba, X_ba, ba_costs = jax.jit(
            lambda R, t, X: bundle_adjust_sparse(
                R, t, X, problem, iterations=ba_iterations,
                solver=solver, cg_iters=30 * 6,
                robust_delta=ba_robust_delta, motion_edges=motion)
        )(R0, t0, X0)
        result["ba_res_after"] = _res_stats(R_ba, t_ba, X_ba)
        result["R"] = np.asarray(R_ba, np.float64)
        result["t"] = np.asarray(t_ba, np.float64)
        result["ba_points"] = np.asarray(X_ba)
        result["ba_costs"] = np.asarray(ba_costs)

    return result
