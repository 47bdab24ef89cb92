"""Pose-graph optimization over pairwise relative-pose measurements.

Chains DeMoN's pairwise (R12, t12) predictions into a trajectory and
refines all absolute poses jointly by Gauss-Newton on SE(3), entirely
inside jit (fixed iteration count, dense normal equations — trajectories
of hundreds of keyframes solve in milliseconds on one chip).

Because a monocular pairwise network only recovers translation DIRECTION
(the reader normalizes ||t||=1 and rescales depth,
multivih5datareader.cpp:1680-1687), edges carry a per-edge scale that is
either provided (e.g. from depth-consistency chaining) or estimated.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .lie import se3_compose, se3_exp, se3_inverse, se3_log, so3_exp


class PoseGraphEdge(NamedTuple):
    """Relative measurement: pose j expressed via pose i.

    (R_ij, t_ij) maps cam-i frame points to cam-j frame:
    X_j = R_ij X_i + t_ij, i.e. T_j = T_ij o T_i for world-to-cam poses.
    """

    i: jax.Array        # [E] int32
    j: jax.Array        # [E] int32
    R_ij: jax.Array     # [E, 3, 3]
    t_ij: jax.Array     # [E, 3]
    weight: jax.Array   # [E] scalar confidence


def chain_relative_poses(R_rel: jax.Array, t_rel: jax.Array,
                         scales: Optional[jax.Array] = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Integrate consecutive relative poses into absolute world-to-cam
    poses with pose 0 = identity. R_rel/t_rel: [N-1, ...]; scales scale
    each translation (monocular scale propagation). Returns [N, 3, 3],
    [N, 3]."""
    if scales is not None:
        t_rel = t_rel * scales[..., None]

    def step(carry, rel):
        R_prev, t_prev = carry
        R_i, t_i = rel
        R_new, t_new = se3_compose(R_i, t_i, R_prev, t_prev)
        return (R_new, t_new), (R_new, t_new)

    init = (jnp.eye(3, dtype=R_rel.dtype), jnp.zeros(3, dtype=t_rel.dtype))
    _, (Rs, ts) = jax.lax.scan(step, init, (R_rel, t_rel))
    R_all = jnp.concatenate([init[0][None], Rs], axis=0)
    t_all = jnp.concatenate([init[1][None], ts], axis=0)
    return R_all, t_all


def optimize_pose_graph(R_init: jax.Array, t_init: jax.Array,
                        edges: PoseGraphEdge, iterations: int = 10,
                        damping: float = 1e-6,
                        fix_first: bool = True):
    """Gauss-Newton over all poses; returns (R [N,3,3], t [N,3], costs).

    Each edge residual is differentiated only w.r.t. its TWO incident
    pose perturbations (jax.jacfwd on a [2, 6] local delta — no
    hand-derived Jacobians), and the per-edge [2,6,2,6] normal-equation
    blocks scatter-add into the global 6N x 6N system, so memory is
    O(E) rather than O(E*N). The whole solver stays inside one jitted
    program (lax.scan over GN iterations; dense solve of the assembled
    system)."""
    n = R_init.shape[0]

    def edge_residual_local(delta2, R, t, edge_i, edge_j, R_ij, t_ij, w):
        """delta2: [2, 6] perturbations of poses (i, j) of ONE edge."""
        dR, dt = se3_exp(delta2)
        Ri, ti = se3_compose(dR[0], dt[0], R[edge_i], t[edge_i])
        Rj, tj = se3_compose(dR[1], dt[1], R[edge_j], t[edge_j])
        Ri_inv, ti_inv = se3_inverse(Ri, ti)
        Rp, tp = se3_compose(Rj, tj, Ri_inv, ti_inv)
        Rp_inv, tp_inv = se3_inverse(Rp, tp)
        Re, te = se3_compose(R_ij, t_ij, Rp_inv, tp_inv)
        return se3_log(Re, te) * w

    def gn_step(state, _):
        R, t = state
        zero2 = jnp.zeros((2, 6), R_init.dtype)

        def per_edge(ei, ej, Rij, tij, w):
            res = lambda d: edge_residual_local(d, R, t, ei, ej, Rij, tij, w)
            J = jax.jacfwd(res)(zero2).reshape(6, 12)   # [6, 2*6]
            r = res(zero2)                               # [6]
            H_blk = (J.T @ J).reshape(2, 6, 2, 6)
            g_blk = (J.T @ r).reshape(2, 6)
            return H_blk, g_blk, jnp.sum(r * r)

        H_blk, g_blk, cost = jax.vmap(per_edge)(
            edges.i, edges.j, edges.R_ij, edges.t_ij, edges.weight)
        idx = jnp.stack([edges.i, edges.j], axis=1)      # [E, 2]
        ia = jnp.broadcast_to(idx[:, :, None], idx.shape + (2,)).reshape(-1)
        ib = jnp.broadcast_to(idx[:, None, :], (idx.shape[0], 2, 2)).reshape(-1)
        H = jnp.zeros((n, 6, n, 6), R_init.dtype)
        H = H.at[ia, :, ib, :].add(
            H_blk.transpose(0, 1, 3, 2, 4).reshape(-1, 6, 6))
        g = jnp.zeros((n, 6), R_init.dtype)
        g = g.at[idx.reshape(-1)].add(g_blk.reshape(-1, 6))

        H = H.reshape(n * 6, n * 6) + damping * jnp.eye(n * 6,
                                                        dtype=R_init.dtype)
        g = g.reshape(n * 6)
        if fix_first:
            # gauge fix: freeze pose 0
            mask = jnp.concatenate(
                [jnp.zeros(6, R_init.dtype), jnp.ones(6 * (n - 1), R_init.dtype)])
            H = H * mask[None, :] * mask[:, None] + jnp.diag(1.0 - mask)
            g = g * mask
        delta = -jnp.linalg.solve(H, g).reshape(n, 6)
        dR, dt = se3_exp(delta)
        R_new, t_new = se3_compose(dR, dt, R, t)
        return (R_new, t_new), jnp.sum(cost)

    # TPU matmuls default to bf16 mantissas — far too coarse for
    # normal-equation solves: at default precision GN limit-cycles at
    # ~4e-3 rad instead of converging (measured); force full fp32
    with jax.default_matmul_precision("highest"):
        (R_out, t_out), costs = jax.lax.scan(
            gn_step, (R_init, t_init), None, length=iterations)
    return R_out, t_out, costs
