"""Elementwise ops: leaky_relu, replace_nonfinite, scale_invariant_gradient.

These are the differentiable lmbspecialops used throughout the reference
models and losses (helpers.py:60-63, v2/losses.py:49,57-79).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def leaky_relu(x: jax.Array, leak: float = 0.1) -> jax.Array:
    """Leaky ReLU; the network's only activation (reference helpers.py:60-63)."""
    return jnp.where(x >= 0, x, leak * x)


@jax.custom_vjp
def replace_nonfinite(x: jax.Array) -> jax.Array:
    """NaN/Inf -> 0 with zero gradient at the replaced positions.

    The reference uses this so invalid-GT pixels contribute zero loss AND
    zero gradient (v2/losses.py:49). The custom VJP guarantees no NaN can
    leak backward even through downstream NaN-producing ops.
    """
    return jnp.where(jnp.isfinite(x), x, 0.0)


def _rnf_fwd(x):
    finite = jnp.isfinite(x)
    return jnp.where(finite, x, 0.0), finite


def _rnf_bwd(finite, g):
    return (jnp.where(finite, g, 0.0),)


replace_nonfinite.defvjp(_rnf_fwd, _rnf_bwd)


def scale_invariant_gradient(
    x: jax.Array,
    deltas: Sequence[int] = (1,),
    weights: Sequence[float] = (1.0,),
    epsilon: float = 0.001,
) -> jax.Array:
    """Normalized finite-difference gradient images.

    For each pixel delta d the op emits, per input channel c, the pair

        gx = w * (x[., x+d, c] - x[., x, c]) / (|x[., x+d, c]| + |x[., x, c]| + eps)
        gy = analogous in y,

    zero where the forward neighbor falls outside the image. Output channel
    order per delta: (gx_c0, gy_c0, gx_c1, gy_c1, ...), deltas stacked last
    — matching the reference's channel slicing in
    scale_invariant_gradient_loss (v2/losses.py:95-104) and the stacking in
    the python wrapper (v2/losses.py:57-79).

    x: [B, H, W, C] -> [B, H, W, 2*C*len(deltas)].
    """
    if len(deltas) != len(weights):
        raise ValueError("deltas and weights must have the same length")
    B, H, W, C = x.shape
    outs = []
    for d, w in zip(deltas, weights):
        # forward difference with zero fill at the far border
        shift_x = jnp.concatenate(
            [x[:, :, d:, :], jnp.zeros((B, H, d, C), x.dtype)], axis=2
        )
        shift_y = jnp.concatenate(
            [x[:, d:, :, :], jnp.zeros((B, d, W, C), x.dtype)], axis=1
        )
        gx = w * (shift_x - x) / (jnp.abs(shift_x) + jnp.abs(x) + epsilon)
        gy = w * (shift_y - x) / (jnp.abs(shift_y) + jnp.abs(x) + epsilon)
        # zero out positions whose neighbor is out of range
        xmask = (jnp.arange(W) < W - d)[None, None, :, None]
        ymask = (jnp.arange(H) < H - d)[None, :, None, None]
        gx = jnp.where(xmask, gx, 0.0)
        gy = jnp.where(ymask, gy, 0.0)
        # interleave (gx_c, gy_c) per channel
        pair = jnp.stack([gx, gy], axis=-1)  # [B,H,W,C,2]
        outs.append(pair.reshape(B, H, W, 2 * C))
    return jnp.concatenate(outs, axis=-1)
