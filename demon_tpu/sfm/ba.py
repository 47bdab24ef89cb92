"""Bundle adjustment with a Schur-complement reduction — jitted, and
mesh-distributable over the point dimension.

Problem: N camera poses (world-to-cam), M world points, observations
(point k seen by camera c at pixel uv, normalized image coords).
Minimize reprojection error over pose perturbations and point positions.

Structure exploited the standard way: the Hessian is
    [ Hcc  Hcp ]
    [ Hcp' Hpp ]
with Hpp block-diagonal (3x3 per point). Points are eliminated via the
Schur complement S = Hcc - Hcp Hpp^-1 Hcp'; the reduced 6N x 6N camera
system is solved densely. All per-point work is a vmap over points, so
sharding the point axis over a mesh turns the S/b accumulation into a
psum — run `bundle_adjust` inside shard_map with `axis_name` set for the
distributed variant (BASELINE.json north-star: distributed Schur BA over
ICI collectives).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .lie import se3_compose, se3_exp


class BAProblem(NamedTuple):
    """Observations of M points by N cameras.

    Fixed-size (jit-static) layout: every point carries `obs_per_point`
    observations, invalid ones masked by weight 0.
    """

    cam_idx: jax.Array   # [M, O] int32 camera index per observation
    uv: jax.Array        # [M, O, 2] observed normalized image coords
    weight: jax.Array    # [M, O] observation weights (0 = invalid)
    intrinsics: jax.Array  # [4] normalized (fx, fy, cx, cy), shared


def _project(R, t, X, intr):
    """World point -> normalized image coords."""
    Xc = (R @ X[..., None])[..., 0] + t
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    z = Xc[..., 2]
    u = fx * Xc[..., 0] / z + cx
    v = fy * Xc[..., 1] / z + cy
    return jnp.stack([u, v], axis=-1), z


def _point_residual(delta_cams, R, t, X_k, obs_cam, obs_uv, obs_w, intr):
    """Residuals of one point's observations under camera perturbations.
    delta_cams: [N, 6]; X_k: [3]. Returns [O, 2]."""
    dR, dt = se3_exp(delta_cams)
    R_new, t_new = se3_compose(dR, dt, R, t)
    Rc = R_new[obs_cam]
    tc = t_new[obs_cam]
    pred, z = _project(Rc, tc, X_k, intr)
    r = (pred - obs_uv) * obs_w[..., None]
    # behind-camera observations contribute nothing
    return jnp.where((z > 1e-6)[..., None], r, 0.0)


def reprojection_residuals(R: jax.Array, t: jax.Array, points: jax.Array,
                           problem: BAProblem) -> jax.Array:
    """Unweighted per-observation reprojection residual norms [M, O]
    (normalized image coords; behind-camera observations report 0).

    The instrumentation primitive behind robust weighting, outlier
    gating and the BA diagnostics in chaining.chain_sequence."""
    def per_point(Xk, cam_k, uv_k):
        pred, z = _project(R[cam_k], t[cam_k], Xk, problem.intrinsics)
        r = jnp.linalg.norm(pred - uv_k, axis=-1)
        return jnp.where(z > 1e-6, r, 0.0)

    return jax.vmap(per_point)(points, problem.cam_idx, problem.uv)


def _huber_irls_weight(res_norm: jax.Array, delta) -> jax.Array:
    """sqrt-IRLS weight for the Huber loss: residual and Jacobian are both
    scaled by this, so the normal equations solve the Huber-weighted
    problem. 1 inside `delta`, sqrt(delta/|r|) outside."""
    return jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(res_norm, 1e-12)))


def _resolve_robust_delta(robust_delta, res_now: jax.Array,
                          weight: jax.Array):
    """float -> itself; "auto" / "auto:K" -> K x median live residual of
    the CURRENT iterate (K defaults to 0.3 — on the tuned 30-frame
    workload the best fixed delta sat at ~0.27x the median residual).
    Adapts the Huber scale to the geometry's actual error level, so a
    drifted long trajectory does not downweight everything."""
    if not isinstance(robust_delta, str):
        return robust_delta
    factor = float(robust_delta.split(":", 1)[1]) if ":" in robust_delta \
        else 0.3
    live = jnp.where(weight > 0, res_now, jnp.nan)
    med = jnp.nan_to_num(jnp.nanmedian(live), nan=1e-3)
    return jnp.maximum(factor * med, 1e-4)


def bundle_adjust(R: jax.Array, t: jax.Array, points: jax.Array,
                  problem: BAProblem, iterations: int = 5,
                  damping: float = 1e-4, fix_first: bool = True,
                  axis_name: Optional[str] = None,
                  robust_delta: Optional[float] = None):
    """Gauss-Newton BA. R: [N,3,3], t: [N,3], points: [M,3] world points
    (the local shard when run under shard_map with `axis_name`).

    `robust_delta`: IRLS Huber reweighting from current residuals (see
    bundle_adjust_sparse). Returns (R, t, points, costs[iterations]).
    """
    n = R.shape[0]

    def per_point(delta0, R, t, Xk, cam_k, uv_k, w_k):
        """Blocks for one point: (Jc [O*2, N*6], Jp [O*2, 3], r [O*2])."""
        def res_c(delta):
            return _point_residual(delta, R, t, Xk, cam_k, uv_k, w_k,
                                   problem.intrinsics).reshape(-1)

        def res_p(Xp):
            return _point_residual(delta0, R, t, Xp, cam_k, uv_k, w_k,
                                   problem.intrinsics).reshape(-1)

        Jc = jax.jacfwd(res_c)(delta0).reshape(-1, n * 6)
        Jp = jax.jacfwd(res_p)(Xk)
        r = res_c(delta0)
        return Jc, Jp, r

    def gn_step(state, _):
        R, t, X = state
        delta0 = jnp.zeros((n, 6), R.dtype)

        if robust_delta is not None:
            res_now = reprojection_residuals(R, t, X, problem)   # [M, O]
            delta = _resolve_robust_delta(robust_delta, res_now,
                                          problem.weight)
            eff_weight = problem.weight * _huber_irls_weight(
                res_now, delta)
        else:
            eff_weight = problem.weight

        def blocks(Xk, cam_k, uv_k, w_k):
            Jc, Jp, r = per_point(delta0, R, t, Xk, cam_k, uv_k, w_k)
            Hpp = Jp.T @ Jp + damping * jnp.eye(3, dtype=R.dtype)
            Hpp_inv = jnp.linalg.inv(Hpp)
            Hcp = Jc.T @ Jp                     # [6N, 3]
            W = Hcp @ Hpp_inv                   # [6N, 3]
            # Schur contributions
            S_k = Jc.T @ Jc - W @ Hcp.T         # [6N, 6N]
            b_k = Jc.T @ r - W @ (Jp.T @ r)     # [6N]
            cost_k = jnp.sum(r * r)
            return S_k, b_k, Hpp_inv, Jp.T @ r, Hcp, cost_k

        S_all, b_all, Hpp_inv, bp, Hcp_all, cost = jax.vmap(blocks)(
            X, problem.cam_idx, problem.uv, eff_weight)
        S = jnp.sum(S_all, axis=0)
        b = jnp.sum(b_all, axis=0)
        cost = jnp.sum(cost)
        if axis_name is not None:
            # distributed point shards: reduce the camera system over ICI
            S = jax.lax.psum(S, axis_name)
            b = jax.lax.psum(b, axis_name)
            cost = jax.lax.psum(cost, axis_name)

        S = S + damping * jnp.eye(n * 6, dtype=R.dtype)
        if fix_first:
            mask = jnp.concatenate(
                [jnp.zeros(6, R.dtype), jnp.ones(6 * (n - 1), R.dtype)])
            S = S * mask[None, :] * mask[:, None] + \
                jnp.diag(1.0 - mask)  # identity rows for the fixed pose
            b = b * mask
        delta_c = -jnp.linalg.solve(S, b)                       # [6N]

        # back-substitute points: dX = -Hpp^-1 (bp + Hcp' dc)
        def backsub(Hpp_inv_k, bp_k, Hcp_k):
            return -(Hpp_inv_k @ (bp_k + Hcp_k.T @ delta_c))

        dX = jax.vmap(backsub)(Hpp_inv, bp, Hcp_all)
        dR, dt = se3_exp(delta_c.reshape(n, 6))
        R_new, t_new = se3_compose(dR, dt, R, t)
        return (R_new, t_new, X + dX), cost

    # fp32 mantissas for the Jacobian/Schur/solve chain (see
    # pose_graph.optimize_pose_graph — bf16-default matmuls stall GN)
    with jax.default_matmul_precision("highest"):
        (R_out, t_out, X_out), costs = jax.lax.scan(
            gn_step, (R, t, points), None, length=iterations)
    return R_out, t_out, X_out, costs


def _block_jacobi_pcg(matvec, b, diag_blocks, iters, axis_name=None):
    """Preconditioned conjugate gradients for the reduced camera system.

    b, x: [N, 6]; diag_blocks: [N, 6, 6] (the 6x6 diagonal blocks of S,
    used as a block-Jacobi preconditioner). `matvec` maps [N,6] -> [N,6].
    Fixed iteration count (jit/scan-friendly); the system is SPD by
    construction (damped Gauss-Newton normal equations).
    """
    Dinv = jnp.linalg.inv(diag_blocks)                       # [N,6,6]
    precond = lambda r: jnp.einsum("nab,nb->na", Dinv, r)

    def dot(a, c):
        s = jnp.vdot(a, c)
        # under shard_map the camera system is replicated (psum'd), so no
        # cross-shard reduction is needed here; axis_name reserved for a
        # camera-sharded variant
        return s

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0

    def body(state, _):
        x, r, z, p, rz = state
        Ap = matvec(p)
        alpha = rz / (dot(p, Ap) + 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / (rz + 1e-30)
        p = z + beta * p
        return (x, r, z, p, rz_new), jnp.sqrt(jnp.sum(r * r))

    (x, *_), res_hist = jax.lax.scan(
        body, (x0, r0, z0, p0, dot(r0, z0)), None, length=iters)
    return x, res_hist


def bundle_adjust_sparse(R: jax.Array, t: jax.Array, points: jax.Array,
                         problem: BAProblem, iterations: int = 5,
                         damping: float = 1e-4, fix_first: bool = True,
                         axis_name: Optional[str] = None,
                         solver: str = "dense", cg_iters: int = 100,
                         robust_delta: Optional[float] = None,
                         motion_edges=None):
    """Block-sparse variant of `bundle_adjust` for large camera counts.

    `bundle_adjust` differentiates every point residual w.r.t. ALL N
    camera perturbations, so its per-point Schur contribution is a dense
    [6N, 6N] block — O(M * 36 N^2) memory, fine for tests but not for
    long trajectories. Here each point's Jacobian is taken only w.r.t.
    its O observed cameras ([O*2, O, 6]), the per-point Schur pieces are
    [O, 6, O, 6], and they scatter-add into the global reduced system —
    O(M * 36 O^2) memory with identical results (validated in tests).
    Per-point work vmaps, so the point axis shards over a mesh exactly
    like the dense variant (psum over `axis_name`).

    `robust_delta` (normalized image coords) turns each Gauss-Newton step
    into an IRLS Huber step: observation weights are rescaled by
    sqrt(min(1, delta/|r|)) from the CURRENT residuals before the normal
    equations are formed, so gross outliers (bad flow tracks, moving
    texture) lose their quadratic pull instead of dragging the poses.
    None keeps the plain least-squares behavior.

    `motion_edges` (a pose_graph.PoseGraphEdge) folds the network's
    DIRECT pairwise motion measurements into the same normal equations —
    the full SLAM-backend formulation: minimize reprojection AND
    relative-pose residuals jointly, instead of letting reprojection
    (derived from noisier flow+depth) overrule motion measurements the
    pose graph already fused. Edge residuals/Jacobians are exactly
    pose_graph.optimize_pose_graph's; the edge weight multiplies the
    residual, so the effective information weight is weight^2. Under
    shard_map the edge system (camera-side, replicated) is added AFTER
    the point-shard psum so it counts once.
    """
    n = R.shape[0]
    obs = problem.cam_idx.shape[1]

    def local_residual(delta_local, R, t, Xk, cam_k, uv_k, w_k):
        """Residuals with per-OBSERVATION camera perturbations
        delta_local: [O, 6] applied to cameras cam_k."""
        dR, dt = se3_exp(delta_local)           # [O,3,3],[O,3]
        Rc, tc = se3_compose(dR, dt, R[cam_k], t[cam_k])
        pred, z = _project(Rc, tc, Xk, problem.intrinsics)
        r = (pred - uv_k) * w_k[..., None]
        return jnp.where((z > 1e-6)[..., None], r, 0.0).reshape(-1)

    def gn_step(state, _):
        R, t, X = state
        delta0 = jnp.zeros((obs, 6), R.dtype)

        if robust_delta is not None:
            res_now = reprojection_residuals(R, t, X, problem)   # [M, O]
            delta = _resolve_robust_delta(robust_delta, res_now,
                                          problem.weight)
            eff_weight = problem.weight * _huber_irls_weight(
                res_now, delta)
        else:
            eff_weight = problem.weight

        def blocks(Xk, cam_k, uv_k, w_k):
            res_c = lambda d: local_residual(d, R, t, Xk, cam_k, uv_k, w_k)
            res_p = lambda Xp: local_residual(delta0, R, t, Xp, cam_k,
                                              uv_k, w_k)
            Jc = jax.jacfwd(res_c)(delta0).reshape(-1, obs * 6)  # [O2, O6]
            Jp = jax.jacfwd(res_p)(Xk)                            # [O2, 3]
            r = res_c(delta0)
            Hpp = Jp.T @ Jp + damping * jnp.eye(3, dtype=R.dtype)
            Hpp_inv = jnp.linalg.inv(Hpp)
            Hcp = Jc.T @ Jp                                       # [O6, 3]
            W = Hcp @ Hpp_inv
            S_k = (Jc.T @ Jc - W @ Hcp.T).reshape(obs, 6, obs, 6)
            b_k = (Jc.T @ r - W @ (Jp.T @ r)).reshape(obs, 6)
            return S_k, b_k, Hpp_inv, Jp.T @ r, Hcp, jnp.sum(r * r)

        S_blk, b_blk, Hpp_inv, bp, Hcp_all, cost = jax.vmap(blocks)(
            X, problem.cam_idx, problem.uv, eff_weight)
        cost = jnp.sum(cost)
        if axis_name is not None:
            cost = jax.lax.psum(cost, axis_name)

        b = jnp.zeros((n, 6), R.dtype)
        b = b.at[problem.cam_idx.reshape(-1)].add(b_blk.reshape(-1, 6))
        if axis_name is not None:
            b = jax.lax.psum(b, axis_name)

        # relative-motion measurement system (replicated camera-side —
        # added once, after the point-shard psum)
        eH_blk = eg_blk = e_idx = None
        if motion_edges is not None:
            from .lie import se3_inverse, se3_log

            me = motion_edges

            def edge_residual(delta2, ei, ej, Rij, tij, w):
                dR, dt = se3_exp(delta2)
                Ri, ti = se3_compose(dR[0], dt[0], R[ei], t[ei])
                Rj, tj = se3_compose(dR[1], dt[1], R[ej], t[ej])
                Rp, tp = se3_compose(Rj, tj, *se3_inverse(Ri, ti))
                Re, te = se3_compose(Rij, tij, *se3_inverse(Rp, tp))
                return se3_log(Re, te) * w

            zero2 = jnp.zeros((2, 6), R.dtype)

            def per_edge(ei, ej, Rij, tij, w):
                res = lambda d: edge_residual(d, ei, ej, Rij, tij, w)
                J = jax.jacfwd(res)(zero2).reshape(6, 12)
                r = res(zero2)
                return ((J.T @ J).reshape(2, 6, 2, 6),
                        (J.T @ r).reshape(2, 6), jnp.sum(r * r))

            eH_blk, eg_blk, e_cost = jax.vmap(per_edge)(
                me.i, me.j, me.R_ij, me.t_ij, me.weight)
            e_idx = jnp.stack([me.i, me.j], axis=1)          # [E, 2]
            b = b.at[e_idx.reshape(-1)].add(eg_blk.reshape(-1, 6))
            cost = cost + jnp.sum(e_cost)

        mask6 = None
        if fix_first:
            mask6 = jnp.concatenate(
                [jnp.zeros((1, 6), R.dtype),
                 jnp.ones((n - 1, 6), R.dtype)], axis=0)      # [N, 6]
            b = b * mask6

        if solver == "cg":
            # matrix-free PCG: never assemble the [6N, 6N] system — S.v
            # products gather/scatter through the stored per-point blocks
            # (O(M O^2) memory; the dense path is O(N^2)).
            Sb = S_blk.reshape(-1, obs, 6, obs, 6)

            def core(v):
                vl = v[problem.cam_idx]                      # [M, O, 6]
                sv = jnp.einsum("moapb,mpb->moa", Sb, vl)
                out = jnp.zeros((n, 6), R.dtype)
                out = out.at[problem.cam_idx.reshape(-1)].add(
                    sv.reshape(-1, 6))
                if axis_name is not None:
                    out = jax.lax.psum(out, axis_name)
                if eH_blk is not None:
                    ve = v[e_idx]                            # [E, 2, 6]
                    ev = jnp.einsum("eapbq,ebq->eap", eH_blk, ve)
                    out = out.at[e_idx.reshape(-1)].add(
                        ev.reshape(-1, 6))
                return out + damping * v

            if fix_first:
                matvec = lambda v: mask6 * core(mask6 * v) + (1 - mask6) * v
            else:
                matvec = core

            # block-Jacobi preconditioner from the 6x6 diagonal blocks
            diag_blk = jax.vmap(lambda sb: jnp.stack(
                [sb[o, :, o, :] for o in range(obs)]))(Sb)   # [M, O, 6, 6]
            D = jnp.zeros((n, 6, 6), R.dtype)
            D = D.at[problem.cam_idx.reshape(-1)].add(
                diag_blk.reshape(-1, 6, 6))
            if axis_name is not None:
                D = jax.lax.psum(D, axis_name)
            if eH_blk is not None:
                e_diag = jnp.stack([eH_blk[:, 0, :, 0, :],
                                    eH_blk[:, 1, :, 1, :]], axis=1)
                D = D.at[e_idx.reshape(-1)].add(
                    e_diag.reshape(-1, 6, 6))
            D = D + damping * jnp.eye(6, dtype=R.dtype)
            if fix_first:
                D = D.at[0].set(jnp.eye(6, dtype=R.dtype))

            sol, _ = _block_jacobi_pcg(matvec, -b, D, cg_iters,
                                       axis_name=axis_name)
            delta_c = sol.reshape(n * 6)
        else:
            # scatter-add the [O,6,O,6] pieces into the global [N,6,N,6]
            ia = problem.cam_idx[:, :, None]           # [M, O, 1]
            ib = problem.cam_idx[:, None, :]           # [M, 1, O]
            S = jnp.zeros((n, 6, n, 6), R.dtype)
            S = S.at[jnp.broadcast_to(ia, S_blk.shape[:1] + (obs, obs))
                     .reshape(-1),
                     :,
                     jnp.broadcast_to(ib, S_blk.shape[:1] + (obs, obs))
                     .reshape(-1),
                     :].add(S_blk.transpose(0, 1, 3, 2, 4).reshape(-1, 6, 6))
            if axis_name is not None:
                S = jax.lax.psum(S, axis_name)
            if eH_blk is not None:
                ea = jnp.broadcast_to(e_idx[:, :, None],
                                      e_idx.shape + (2,)).reshape(-1)
                eb = jnp.broadcast_to(e_idx[:, None, :],
                                      (e_idx.shape[0], 2, 2)).reshape(-1)
                S = S.at[ea, :, eb, :].add(
                    eH_blk.transpose(0, 1, 3, 2, 4).reshape(-1, 6, 6))
            S = S.reshape(n * 6, n * 6) \
                + damping * jnp.eye(n * 6, dtype=R.dtype)
            if fix_first:
                m = mask6.reshape(-1)
                S = S * m[None, :] * m[:, None] + jnp.diag(1.0 - m)
            delta_c = -jnp.linalg.solve(S, b.reshape(n * 6))

        # back-substitute: dX = -Hpp^-1 (bp + Hcp' dc_local)
        dc_local = delta_c.reshape(n, 6)[problem.cam_idx]  # [M, O, 6]

        def backsub(Hpp_inv_k, bp_k, Hcp_k, dck):
            return -(Hpp_inv_k @ (bp_k + Hcp_k.T @ dck.reshape(-1)))

        dX = jax.vmap(backsub)(Hpp_inv, bp, Hcp_all, dc_local)
        dR, dt = se3_exp(delta_c.reshape(n, 6))
        R_new, t_new = se3_compose(dR, dt, R, t)
        return (R_new, t_new, X + dX), cost

    with jax.default_matmul_precision("highest"):
        (R_out, t_out, X_out), costs = jax.lax.scan(
            gn_step, (R, t, points), None, length=iterations)
    return R_out, t_out, X_out, costs
