"""Optimizer niceties with no reference counterpart (both default-off):
parameter EMA (TrainConfig.ema_decay) and gradient accumulation
(TrainConfig.accum_steps, optax.MultiSteps). Verified against manual
computations on tiny models."""

import jax
import jax.numpy as jnp
import numpy as np

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


def test_ema_tracks_post_update_params():
    h = w = 64
    decay = 0.5
    cfg = TrainConfig(height=h, width=w, batch_size=2, ema_decay=decay)
    tr = EvolutionTrainer(cfg)
    params = _params(tr)
    evo = "0_flow1"
    opt = tr.init_opt_state(evo, params)
    assert tr.ema_params(opt) is not None
    step_fn = tr.make_train_step(evo)
    rng = np.random.RandomState(1)

    # manual EMA over two steps, seeded at p0 (trainable nets only);
    # snapshot to host first — the step donates its params buffers
    expected = jax.tree.map(np.asarray, {"netFlow1": params["netFlow1"]})
    p, o = params, opt
    for s in range(2):
        p, o, metrics, _ = step_fn(p, o, _batch(rng, 2, h, w),
                                   jnp.asarray(s, jnp.int32), None)
        expected = jax.tree.map(
            lambda e, q: e * decay + np.asarray(q) * (1 - decay),
            expected, {"netFlow1": p["netFlow1"]})
    ema = tr.ema_params(o)
    assert set(ema.keys()) == {"netFlow1"}  # only the trainable net
    a = jax.tree_util.tree_leaves(ema)
    b = jax.tree_util.tree_leaves(expected)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
    # EMA differs from the live params (it lags by construction)
    diffs = [float(jnp.abs(x - y).max()) for x, y in zip(
        a, jax.tree_util.tree_leaves({"netFlow1": p["netFlow1"]}))]
    assert max(diffs) > 0


def test_ema_disabled_by_default():
    cfg = TrainConfig(height=64, width=64, batch_size=2)
    tr = EvolutionTrainer(cfg)
    params = _params(tr)
    opt = tr.init_opt_state("0_flow1", params)
    assert tr.ema_params(opt) is None
    assert tr.eval_params(params, opt) is params


def test_eval_params_substitutes_ema():
    cfg = TrainConfig(height=64, width=64, batch_size=2, ema_decay=0.9)
    tr = EvolutionTrainer(cfg)
    params = _params(tr)
    opt = tr.init_opt_state("0_flow1", params)
    merged = tr.eval_params(params, opt)
    # netFlow1 (trainable in evo 0) comes from the EMA shadow, the
    # frozen nets stay the live tree
    assert merged["netDM1"] is params["netDM1"]
    ema = tr.ema_params(opt)
    for a, b in zip(jax.tree_util.tree_leaves(merged["netFlow1"]),
                    jax.tree_util.tree_leaves(ema["netFlow1"])):
        assert a is b


def test_grad_accumulation_updates_every_k():
    h = w = 64
    cfg = TrainConfig(height=h, width=w, batch_size=2, accum_steps=2)
    tr = EvolutionTrainer(cfg)
    params = _params(tr)
    evo = "0_flow1"
    opt = tr.init_opt_state(evo, params)
    step_fn = tr.make_train_step(evo)
    rng = np.random.RandomState(2)

    p0_host = jax.tree.map(np.asarray, params)  # step donates buffers
    p1, o1, m1, _ = step_fn(params, opt, _batch(rng, 2, h, w),
                            jnp.asarray(0, jnp.int32), None)
    # mid-accumulation: parameters must be bit-identical
    p1_host = jax.tree.map(np.asarray, p1)
    for x, y in zip(jax.tree_util.tree_leaves(p0_host),
                    jax.tree_util.tree_leaves(p1_host)):
        np.testing.assert_array_equal(x, y)
    p2, o2, m2, _ = step_fn(p1, o1, _batch(rng, 2, h, w),
                            jnp.asarray(1, jnp.int32), None)
    # boundary: the accumulated update applies
    changed = any(
        float(np.abs(x - np.asarray(y)).max()) > 0
        for x, y in zip(jax.tree_util.tree_leaves(p1_host["netFlow1"]),
                        jax.tree_util.tree_leaves(p2["netFlow1"])))
    assert changed
    assert np.isfinite(float(m2["total_loss"]))


def test_accumulation_schedules_count_effective_updates():
    """LR and loss-weight ramps advance once per optimizer update, not
    once per micro-batch: the logged LR must be constant inside an
    accumulation window and equal to the no-accum step-0 value."""
    h = w = 64
    cfg = TrainConfig(height=h, width=w, batch_size=2, accum_steps=3)
    tr = EvolutionTrainer(cfg)
    params = _params(tr)
    evo = "0_flow1"
    o = tr.init_opt_state(evo, params)
    step_fn = tr.make_train_step(evo)
    rng = np.random.RandomState(4)
    lrs = []
    p = params
    for s in range(3):
        p, o, m, _ = step_fn(p, o, _batch(rng, 2, h, w),
                             jnp.asarray(s, jnp.int32), None)
        lrs.append(float(m["learning_rate"]))
    assert lrs[0] == lrs[1] == lrs[2]
    assert lrs[0] == np.float32(cfg.base_lr[evo])


def test_grad_accumulation_matches_large_batch():
    """k micro-batches of size b must produce the same first update as one
    batch of size k*b (the whole point of accumulation)."""
    h = w = 64
    rng = np.random.RandomState(3)
    big = _batch(rng, 4, h, w)
    micro1 = {k: v[:2] for k, v in big.items()}
    micro2 = {k: v[2:] for k, v in big.items()}
    evo = "0_flow1"

    cfg_big = TrainConfig(height=h, width=w, batch_size=4)
    tr_big = EvolutionTrainer(cfg_big)
    params_host = jax.tree.map(np.asarray, _params(tr_big))
    fresh = lambda: jax.tree.map(jnp.asarray, params_host)  # steps donate
    step_big = tr_big.make_train_step(evo)
    params = fresh()
    p_big, *_ = step_big(params, tr_big.init_opt_state(evo, params), big,
                         jnp.asarray(0, jnp.int32), None)

    cfg_acc = TrainConfig(height=h, width=w, batch_size=2, accum_steps=2)
    tr_acc = EvolutionTrainer(cfg_acc)
    step_acc = tr_acc.make_train_step(evo)
    params = fresh()
    o = tr_acc.init_opt_state(evo, params)
    p, o, *_ = step_acc(params, o, micro1, jnp.asarray(0, jnp.int32), None)
    p, o, *_ = step_acc(p, o, micro2, jnp.asarray(1, jnp.int32), None)

    # MultiSteps averages micro-grads; DeMoN's losses are batch means, so
    # the two paths see the same gradient up to fp reassociation. Adam's
    # first step normalizes to sign(g)*lr, so elements whose gradient is
    # ~0 can flip sign on rounding noise — tolerate a <0.1% tail.
    for x, y in zip(jax.tree_util.tree_leaves(p_big["netFlow1"]),
                    jax.tree_util.tree_leaves(p["netFlow1"])):
        x, y = np.asarray(x), np.asarray(y)
        bad = np.abs(x - y) > 2e-5 + 2e-3 * np.abs(y)
        assert bad.mean() < 1e-3, (bad.sum(), x.size)


def test_flat_opt_matches_per_leaf():
    """flat_opt=True (one optax.flatten'd clip/Adam/LR fusion over the
    raveled trainable vector) must produce the same step as the per-leaf
    chain — clip/Adam/LR are elementwise, so flattening is math-identical."""
    h = w = 64
    evo = "0_flow1"
    rng_a, rng_b = np.random.RandomState(7), np.random.RandomState(7)
    results = []
    for flat in (False, True):
        cfg = TrainConfig(height=h, width=w, batch_size=2, flat_opt=flat)
        tr = EvolutionTrainer(cfg)
        p = _params(tr)
        o = tr.init_opt_state(evo, p)
        step_fn = tr.make_train_step(evo)
        rng = rng_a if not flat else rng_b
        for s in range(3):
            p, o, metrics, _ = step_fn(p, o, _batch(rng, 2, h, w),
                                       jnp.asarray(s, jnp.int32), None)
        results.append((jax.tree.map(np.asarray, p),
                        float(metrics["total_loss"])))
    (p_leaf, loss_leaf), (p_flat, loss_flat) = results
    assert loss_leaf == loss_flat
    for x, y in zip(jax.tree_util.tree_leaves(p_leaf),
                    jax.tree_util.tree_leaves(p_flat)):
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7)


def test_easing_degenerate_duration_is_finite():
    """max_iter // 3 == 0 at smoke-test-scale max_iter must mean
    'ramp already complete', not 0/0 = NaN (schedules._ramp_fraction)."""
    from demon_tpu.train.schedules import ease_in_quad, ease_out_quad

    for dur in (0, 0.0):
        lvl5 = ease_in_quad(jnp.float32(0.0), 1.0, -1.0, dur)
        sig = ease_out_quad(jnp.float32(0.0), 0.0, 10.0, dur)
        assert np.isfinite(float(lvl5)) and float(lvl5) == 0.0
        assert np.isfinite(float(sig)) and float(sig) == 10.0
    # sane interior values are unchanged
    assert float(ease_in_quad(jnp.float32(5.0), 1.0, -1.0, 10.0)) == 0.75
