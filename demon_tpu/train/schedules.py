"""Easing schedules and the DeMoN learning-rate curve.

The reference pulls ease_in_quad / ease_out_quad from the external tfutils
repo; semantics reconstructed from usage (training/v2/training.py:118-122,
202-205): classic Penner easing with signature (t, start, change, duration)
clamped to [start, start+change] outside [0, duration].
"""

from __future__ import annotations

import jax.numpy as jnp


def _ramp_fraction(t, duration):
    """t/duration clamped to [0,1]; duration <= 0 (possible via the
    `max_iter // 3` ramp windows at smoke-test-scale max_iter) means the
    ramp is already complete, not 0/0 = NaN."""
    x = jnp.clip(t / jnp.maximum(duration, 1e-30), 0.0, 1.0)
    return jnp.where(duration > 0, x, 1.0)


def ease_in_quad(t, start, change, duration):
    """start + change * (t/d)^2, clamped; t<0 gives start."""
    x = _ramp_fraction(t, duration)
    return start + change * x * x


def ease_out_quad(t, start, change, duration):
    """start - change * (t/d) * (t/d - 2), clamped."""
    x = _ramp_fraction(t, duration)
    return start - change * x * (x - 2.0)


def demon_lr_schedule(step, base_lr: float, max_iter: int):
    """Constant for the first third, then quadratic ease-in toward 1e-6
    (reference training.py:118-122)."""
    return ease_in_quad(
        step - max_iter / 3.0,
        base_lr,
        1e-6 - base_lr,
        2.0 * max_iter / 3.0,
    )
