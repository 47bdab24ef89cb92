"""Engine integration: predict_eval protocol shapes and end-to-end
sequence chaining through the real engine (tiny resolution, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demon_tpu.engine.inference import DemonEngine
from demon_tpu.models import DEMON_INTRINSICS


@pytest.fixture(scope="module")
def tiny_engine():
    engine = DemonEngine(variant="v1", iterations=2)
    H, W = 64, 64
    B = 1
    ip = jnp.zeros((B, H, W, 6))
    i22 = jnp.zeros((B, H // 4, W // 4, 3))
    intr = jnp.broadcast_to(jnp.asarray(DEMON_INTRINSICS), (B, 4))
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    boot = jax.jit(engine.bootstrap.init)(k1, ip, i22)
    prev = jax.jit(engine.bootstrap.apply)(boot, ip, i22)
    itp = jax.jit(engine.iterative.init)(k2, ip, i22, intr, prev)
    ref = jax.jit(engine.refinement.init)(k3, ip[..., :3], prev.depth2)
    params = {"bootstrap": boot, "iterative": itp, "refinement": ref}
    return engine, params


def test_predict_eval_shapes(tiny_engine):
    engine, params = tiny_engine
    H, W, B = 64, 64, 2
    rng = np.random.RandomState(0)
    ip = jnp.asarray(rng.rand(B, H, W, 6).astype(np.float32) - 0.5)
    i22 = jnp.asarray(rng.rand(B, H // 4, W // 4, 3).astype(np.float32) - 0.5)
    out = engine.predict_eval(params, ip, i22)
    n_it = engine.iterations + 1
    assert out["flow2"].shape == (n_it, B, H // 4, W // 4, 2)
    assert out["depth2"].shape == (n_it, B, H // 4, W // 4, 1)
    assert out["rotation"].shape == (n_it, B, 3)
    assert out["depth_refined"].shape == (n_it, B, H, W, 1)
    assert np.isfinite(np.asarray(out["depth_refined"])).all()


def test_chain_sequence_end_to_end(tiny_engine):
    """chain_sequence through the real (random-init) engine on a 4-frame
    sequence: runs, produces N poses, finite pose-graph cost."""
    from demon_tpu.sfm.chaining import chain_sequence

    engine, params = tiny_engine
    rng = np.random.RandomState(1)
    images = (rng.rand(4, 64, 64, 3).astype(np.float32) - 0.5)
    result = chain_sequence(engine, params, images,
                            pose_graph_iterations=3)
    assert result["R"].shape == (4, 3, 3)
    assert result["t"].shape == (4, 3)
    assert result["scales"].shape == (3,)
    assert np.isfinite(result["pose_graph_costs"]).all()
    # poses are valid rotations
    for R in result["R"]:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_chain_sequence_with_ba(tiny_engine):
    """chain_sequence(run_ba=True) through the real engine: BA executes
    and returns refined poses + points."""
    from demon_tpu.sfm.chaining import chain_sequence

    engine, params = tiny_engine
    rng = np.random.RandomState(2)
    images = (rng.rand(3, 64, 64, 3).astype(np.float32) - 0.5)
    result = chain_sequence(engine, params, images,
                            pose_graph_iterations=2, run_ba=True,
                            ba_iterations=2, ba_points_per_frame=24)
    assert result["R"].shape == (3, 3, 3)
    assert "ba_points" in result and "ba_costs" in result
    assert np.isfinite(result["ba_costs"]).all()
    for R in result["R"]:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
