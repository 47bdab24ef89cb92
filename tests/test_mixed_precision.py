"""Mixed-precision training: bf16 compute / fp32 master weights.

The blocks run on the MXU in bf16 while losses, gradients, Adam state and
the replay carry stay fp32 (trainer.py `_f32` boundary). Verifies the
bf16 step produces a loss close to the fp32 step on identical inputs and
that parameters/optimizer state remain fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demon_tpu.train.trainer import EvolutionTrainer, TrainConfig


def _batch(rng, b, h, w):
    return {
        "IMAGE_PAIR": jnp.asarray(rng.rand(b, h, w, 6).astype(np.float32) - 0.5),
        "MOTION": jnp.asarray(rng.randn(b, 6).astype(np.float32) * 0.1),
        "DEPTH": jnp.asarray(rng.uniform(0.3, 2.0, (b, h, w, 1)).astype(np.float32)),
        "INTRINSICS": jnp.asarray(
            np.tile(np.array([[0.89, 1.19, 0.5, 0.5]], np.float32), (b, 1))),
    }


def _params(trainer, scale=0.05):
    shapes = jax.eval_shape(trainer.init_params, jax.random.key(0))
    host = np.random.RandomState(0)
    return jax.tree.map(
        lambda s: jnp.asarray(
            (host.standard_normal(s.shape) * scale).astype(s.dtype)), shapes)


@pytest.mark.parametrize("evo", ["0_flow1", "1_dm1"])
def test_bf16_step_matches_fp32(evo):
    h = w = 64
    rng = np.random.RandomState(3)
    batch = _batch(rng, 2, h, w)
    step = jnp.zeros((), jnp.int32)

    losses = {}
    for dt in ("float32", "bfloat16"):
        cfg = TrainConfig(height=h, width=w, batch_size=2, compute_dtype=dt)
        tr = EvolutionTrainer(cfg)
        params = _params(tr)
        opt = tr.init_opt_state(evo, params)
        step_fn = tr.make_train_step(evo)
        new_params, new_opt, metrics, _ = step_fn(params, opt, batch, step, None)
        losses[dt] = float(metrics["total_loss"])
        # master weights and Adam state stay fp32
        for leaf in jax.tree_util.tree_leaves(new_params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(new_opt):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32

    assert np.isfinite(losses["bfloat16"])
    # bf16 has ~3 decimal digits; the summed losses should agree loosely
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=0.05)


def test_bf16_replay_carry_stays_fp32():
    h = w = 64
    cfg = TrainConfig(height=h, width=w, batch_size=2, batch_size_iterative=2,
                      compute_dtype="bfloat16")
    tr = EvolutionTrainer(cfg)
    params = _params(tr)
    evo = "4_iterative"
    opt = tr.init_opt_state(evo, params)
    step_fn = tr.make_train_step(evo)
    rng = np.random.RandomState(5)
    batch = _batch(rng, 2, h, w)
    replay = tr.init_replay(evo, params, batch)
    _, _, metrics, new_replay = step_fn(params, opt, batch,
                                        jnp.zeros((), jnp.int32), replay)
    assert np.isfinite(float(metrics["total_loss"]))
    for leaf in jax.tree_util.tree_leaves(new_replay):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
