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
    n = R_rel.shape[0] + 1
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


def _edge_residual(R, t, edge: PoseGraphEdge):
    """r = log( T_meas o T_i o T_j^-1 ) per edge -> [E, 6]."""
    Ri = R[edge.i]
    ti = t[edge.i]
    Rj = R[edge.j]
    tj = t[edge.j]
    # predicted relative: T_ij_pred = T_j o T_i^-1
    Ri_inv, ti_inv = se3_inverse(Ri, ti)
    Rp, tp = se3_compose(Rj, tj, Ri_inv, ti_inv)
    # error transform: T_meas o T_pred^-1
    Rp_inv, tp_inv = se3_inverse(Rp, tp)
    Re, te = se3_compose(edge.R_ij, edge.t_ij, Rp_inv, tp_inv)
    return se3_log(Re, te)


def optimize_pose_graph(R_init: jax.Array, t_init: jax.Array,
                        edges: PoseGraphEdge, iterations: int = 10,
                        damping: float = 1e-6,
                        fix_first: bool = True):
    """Gauss-Newton over all poses; returns (R [N,3,3], t [N,3]).

    The Jacobian of every edge residual w.r.t. the two incident pose
    perturbations is obtained with jax.jacfwd on the residual under a
    left-multiplied se3 perturbation — no hand-derived Jacobians, and the
    whole solver stays inside one jitted program (lax.scan over GN
    iterations, dense 6N x 6N normal equations)."""
    n = R_init.shape[0]

    def residual_with_delta(delta, R, t, edges):
        """delta: [N, 6] perturbation; T_i' = exp(delta_i) o T_i."""
        dR, dt = se3_exp(delta)
        R_new, t_new = se3_compose(dR, dt, R, t)
        r = _edge_residual(R_new, t_new, edges)       # [E, 6]
        return (r * edges.weight[:, None]).reshape(-1)

    def gn_step(state, _):
        R, t = state
        zero = jnp.zeros((n, 6), R_init.dtype)
        J = jax.jacfwd(residual_with_delta)(zero, R, t, edges)  # [6E, N, 6]
        r = residual_with_delta(zero, R, t, edges)              # [6E]
        J = J.reshape(r.shape[0], n * 6)
        if fix_first:
            # gauge fix: freeze pose 0
            mask = jnp.concatenate(
                [jnp.zeros(6, R_init.dtype), jnp.ones(6 * (n - 1), R_init.dtype)])
            J = J * mask[None, :]
        H = J.T @ J + damping * jnp.eye(n * 6, dtype=R_init.dtype)
        g = J.T @ r
        delta = -jnp.linalg.solve(H, g).reshape(n, 6)
        dR, dt = se3_exp(delta)
        R_new, t_new = se3_compose(dR, dt, R, t)
        return (R_new, t_new), jnp.sum(r * r)

    (R_out, t_out), costs = jax.lax.scan(
        gn_step, (R_init, t_init), None, length=iterations)
    return R_out, t_out, costs
