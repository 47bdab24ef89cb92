"""Multi-chip validation on the virtual 8-device CPU mesh: the full
sharded training step (dp x tp) and the batched inference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dryrun_multichip_8_devices():
    """The driver-contract dry run: full evo-4 train step on a (4, 2)
    data x model mesh with sharded batch and tensor-parallel dense
    kernels."""
    import __graft_entry__ as ge

    assert len(jax.devices()) == 8
    ge.dryrun_multichip(8)


def test_entry_compiles():
    """entry() must return a jittable fn + args (single-chip contract)."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # abstract-eval only: verify traceability without paying a full
    # 192x256 CPU compile
    shapes = jax.eval_shape(fn, *args)
    depth, rot, trans = shapes
    assert depth.shape == (1, 192, 256, 1)
    assert rot.shape == (1, 3)
    assert trans.shape == (1, 3)


def test_data_parallel_inference_mesh():
    """Batched engine inference sharded over all 8 devices matches the
    single-device result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.engine.sharding import make_mesh
    from demon_tpu.models import DEMON_INTRINSICS

    H, W = 64, 64
    B = 8
    engine = DemonEngine(variant="v1", iterations=1)
    rng = np.random.RandomState(0)
    image_pair = rng.rand(B, H, W, 6).astype(np.float32) - 0.5
    image2_2 = rng.rand(B, H // 4, W // 4, 3).astype(np.float32) - 0.5
    intr = np.tile(DEMON_INTRINSICS[None], (B, 1))

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    boot = jax.jit(engine.bootstrap.init)(
        k1, jnp.asarray(image_pair), jnp.asarray(image2_2))
    prev = jax.jit(engine.bootstrap.apply)(
        boot, jnp.asarray(image_pair), jnp.asarray(image2_2))
    itp = jax.jit(engine.iterative.init)(
        k2, jnp.asarray(image_pair), jnp.asarray(image2_2),
        jnp.asarray(intr), prev)
    ref = jax.jit(engine.refinement.init)(
        k3, jnp.asarray(image_pair[..., :3]), prev.depth2)
    params = {"bootstrap": boot, "iterative": itp, "refinement": ref}

    single = jax.jit(engine._predict)(
        params, jnp.asarray(image_pair), jnp.asarray(image2_2),
        jnp.asarray(intr))

    mesh = make_mesh((8, 1), ("data", "model"))
    sh = lambda nd: NamedSharding(mesh, P(*(["data"] + [None] * (nd - 1))))
    rep = NamedSharding(mesh, P())
    params_sh = jax.tree.map(lambda x: jax.device_put(x, rep), params)
    sharded = jax.jit(engine._predict)(
        params_sh,
        jax.device_put(image_pair, sh(4)),
        jax.device_put(image2_2, sh(4)),
        jax.device_put(intr, sh(2)))

    # fusion/reduction order differs per sharding, the warp's floor() can
    # flip at individual pixels, and the random-init network amplifies
    # tiny differences through the iterative feedback — this asserts the
    # sharded program computes the same function, not bitwise equality
    d_diff = np.abs(np.asarray(sharded.depth_refined, np.float32)
                    - np.asarray(single.depth_refined, np.float32))
    assert d_diff.mean() < 2e-3, d_diff.mean()
    r_diff = np.abs(np.asarray(sharded.prediction.rotation, np.float32)
                    - np.asarray(single.prediction.rotation, np.float32))
    assert r_diff.mean() < 0.05, r_diff.mean()


def test_data_parallel_server_mesh():
    """DemonServer with a mesh: params replicate, each dispatched batch
    shards over 'data', buckets start at the data-axis size, and results
    match a direct single-device engine call."""
    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.engine.server import DemonServer
    from demon_tpu.engine.sharding import make_mesh

    H, W = 64, 64
    engine = DemonEngine(variant="v1", iterations=1)
    ip0 = jnp.zeros((1, H, W, 6))
    i220 = jnp.zeros((1, H // 4, W // 4, 3))
    from demon_tpu.models import DEMON_INTRINSICS
    intr0 = jnp.broadcast_to(jnp.asarray(DEMON_INTRINSICS), (1, 4))
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    boot = jax.jit(engine.bootstrap.init)(k1, ip0, i220)
    prev = jax.jit(engine.bootstrap.apply)(boot, ip0, i220)
    itp = jax.jit(engine.iterative.init)(k2, ip0, i220, intr0, prev)
    ref = jax.jit(engine.refinement.init)(k3, ip0[..., :3], prev.depth2)
    params = {"bootstrap": boot, "iterative": itp, "refinement": ref}

    mesh = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    with pytest.raises(ValueError):
        DemonServer(engine, params, max_batch=2, mesh=mesh)  # < dp

    rng = np.random.RandomState(0)
    pairs = [rng.rand(H, W, 6).astype(np.float32) - 0.5 for _ in range(8)]
    i22s = [rng.rand(H // 4, W // 4, 3).astype(np.float32) - 0.5
            for _ in range(8)]
    # long max_wait so all 8 requests deterministically coalesce into ONE
    # batch-8 dispatch — the direct call below then runs the exact same
    # compiled program on the same sharded inputs, so results must match
    # bitwise (sharded-vs-single numerical equivalence is covered by
    # test_data_parallel_inference_mesh with its documented tolerance).
    with DemonServer(engine, params, max_batch=8, max_wait_ms=500.0,
                     mesh=mesh) as server:
        assert server._bucket(1) == 4    # min bucket = data-axis size
        assert server._bucket(5) == 8
        futs = [server.submit(p, i) for p, i in zip(pairs, i22s)]
        results = [f.result(timeout=300) for f in futs]

    from demon_tpu.engine.sharding import (data_parallel_sharding,
                                           replicate_pytree)

    direct = engine.predict(
        replicate_pytree(params, mesh),
        jax.device_put(np.stack(pairs), data_parallel_sharding(mesh, 4)),
        jax.device_put(np.stack(i22s), data_parallel_sharding(mesh, 4)))
    for i, (depth, rot, trans) in enumerate(results):
        np.testing.assert_allclose(
            depth, np.asarray(direct.depth_refined, np.float32)[i, ..., 0],
            atol=1e-6)
        np.testing.assert_allclose(
            rot, np.asarray(direct.prediction.rotation, np.float32)[i],
            atol=1e-6)


def test_spatially_sharded_refinement_matches_single_device():
    """The 'space' axis for real: refinement at 384x512 with the image
    height sharded sp=2 (GSPMD halo exchanges at the seams) must match
    the unsharded single-device result (VERDICT round-1 item 6)."""
    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.engine.sharding import make_mesh

    engine = DemonEngine(variant="v1", iterations=1)
    H, W = 384, 512
    rng = np.random.RandomState(0)
    image1 = rng.rand(2, H, W, 3).astype(np.float32) - 0.5
    depth2 = rng.uniform(0.5, 2.0, (2, H // 4, W // 4, 1)).astype(np.float32)

    # init the refinement net alone at this resolution
    refine_params = jax.jit(engine.refinement.init)(
        jax.random.key(0), jnp.asarray(image1), jnp.asarray(depth2))
    params = {"refinement": refine_params}

    single = np.asarray(engine.refine(
        params, jnp.asarray(image1), jnp.asarray(depth2))["predict_depth0"])

    mesh = make_mesh((2, 2, 2), ("data", "model", "space"))
    sharded_out = engine.refine(params, image1, depth2, mesh=mesh)
    sharded = np.asarray(sharded_out["predict_depth0"])

    assert sharded.shape == single.shape == (2, H, W, 1)
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-5)


def test_tensor_parallel_train_step_matches_single_device():
    """Production tensor parallelism: EvolutionTrainer.shard_params places
    dense5/motion_fc kernels column-wise over 'model'; a dp x tp train
    step must compute the same update as the unsharded step AND keep the
    tp layout on the updated params (no involuntary re-replication)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from demon_tpu.engine.sharding import make_mesh
    from demon_tpu.train.trainer import EvolutionTrainer, TrainConfig

    H = W = 64
    B = 4
    cfg = TrainConfig(height=H, width=W, batch_size=B, batch_size_iterative=B)
    evo = "0_flow1"  # trains netFlow1 (v2: includes the dense5 bottleneck)

    rng = np.random.RandomState(0)
    batch = {
        "IMAGE_PAIR": rng.rand(B, H, W, 6).astype(np.float32) - 0.5,
        "MOTION": rng.randn(B, 6).astype(np.float32) * 0.1,
        "DEPTH": rng.uniform(0.5, 2.0, (B, H, W, 1)).astype(np.float32),
        "INTRINSICS": np.tile(np.array([[0.89, 1.19, 0.5, 0.5]], np.float32),
                              (B, 1)),
    }
    step = jnp.zeros((), jnp.int32)

    ref_tr = EvolutionTrainer(cfg)
    params = ref_tr.init_params(jax.random.key(0))
    ref_opt = ref_tr.init_opt_state(evo, params)
    p1, _, m1, _ = ref_tr.make_train_step(evo)(
        params, ref_opt, jax.tree.map(jnp.asarray, batch), step)

    mesh = make_mesh((4, 2), ("data", "model"))
    tp_tr = EvolutionTrainer(cfg, mesh=mesh)
    params2 = tp_tr.shard_params(tp_tr.init_params(jax.random.key(0)))
    k_sh = params2["netFlow1"]["dense5"]["kernel"].sharding
    assert k_sh.spec == P(None, "model"), k_sh
    opt2 = tp_tr.init_opt_state(evo, params2)
    dsh = lambda x: jax.device_put(
        x, NamedSharding(mesh, P(*(["data"] + [None] * (x.ndim - 1)))))
    p2, _, m2, _ = tp_tr.make_train_step(evo)(
        params2, opt2, {k: dsh(jnp.asarray(v)) for k, v in batch.items()},
        step)

    np.testing.assert_allclose(float(m2["total_loss"]),
                               float(m1["total_loss"]), rtol=1e-4)
    # updated dense5 kernel: same values, still tp-sharded
    assert p2["netFlow1"]["dense5"]["kernel"].sharding.spec == \
        P(None, "model")
    np.testing.assert_allclose(
        np.asarray(p2["netFlow1"]["dense5"]["kernel"]),
        np.asarray(p1["netFlow1"]["dense5"]["kernel"]), atol=5e-5)
