"""Multi-process (2-host) CPU cluster tests — SURVEY §4's "multi-host
tests using JAX's multiprocess runtime on CPU meshes".

Spawns 2 worker processes (tests/multihost_worker.py), each owning 2
virtual CPU devices of a 4-device global mesh, and verifies:

(a) the real evolution-0 train step runs on a global data-parallel batch
    assembled from per-process shards and produces the same loss on both
    hosts AND as a single-process run on the same global batch;
(b) per-host readers (ReaderParams.host_id/num_hosts) serve disjoint
    sample shards whose union covers the dataset exactly once;
(c) orbax checkpoint save/restore works across processes;
(d) train.distributed.host_reader_params stamps each process correctly.
"""

import json
import os
import socket
import subprocess
import sys

import h5py
import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """4 single-pair scenes, 80x96 — same schema as test_train_driver."""
    from demon_tpu.data import View, write_view
    from demon_tpu.data.host_geometry import angleaxis_to_rotation_matrix

    rng = np.random.RandomState(7)
    path = str(tmp_path_factory.mktemp("mh") / "train.h5")
    H, W = 80, 96
    with h5py.File(path, "w") as f:
        for g in range(4):
            for v in range(2):
                img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
                depth = rng.uniform(1.0, 4.0, (H, W)).astype(np.float32)
                K = np.array([[0.9 * W, 0, 0.5 * W],
                              [0, 1.2 * H, 0.5 * H], [0, 0, 1.0]])
                R = angleaxis_to_rotation_matrix(rng.randn(3) * 0.05)
                t = rng.randn(3) * 0.3
                write_view(f.require_group(f"scene{g}/frames/t0/v{v}"),
                           View(R=R, t=t, K=K, image=img, depth=depth,
                                depth_metric="camera_z"))
            f[f"scene{g}/frames/t0"].attrs["viewpoint_pairs"] = np.array(
                [0, 1, 1, 0], np.int32)
    return path


@pytest.fixture(scope="module")
def cluster_results(tiny_dataset, tmp_path_factory):
    """Run the 2-process cluster once; all tests assert on its outputs."""
    workdir = str(tmp_path_factory.mktemp("mh_work"))
    port = _free_port()
    nprocs = 2
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # each worker overrides device count itself; scrub the parent's 8
    env["XLA_FLAGS"] = ""
    procs = []
    logs = []
    for pid in range(nprocs):
        log = open(os.path.join(workdir, f"worker_{pid}.log"), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "multihost_worker.py"),
             f"127.0.0.1:{port}", str(nprocs), str(pid), workdir,
             tiny_dataset],
            stdout=log, stderr=subprocess.STDOUT, env=env))
    try:
        for p in procs:
            p.wait(timeout=600)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()
    for pid, p in enumerate(procs):
        if p.returncode != 0:
            with open(os.path.join(workdir, f"worker_{pid}.log")) as f:
                tail = f.read()[-4000:]
            raise AssertionError(
                f"worker {pid} exited {p.returncode}:\n{tail}")
    results = []
    for pid in range(nprocs):
        with open(os.path.join(workdir, f"result_{pid}.json")) as f:
            results.append(json.load(f))
    return results


def test_host_stamp(cluster_results):
    assert cluster_results[0]["host_stamp"] == [0, 2]
    assert cluster_results[1]["host_stamp"] == [1, 2]


def test_reader_shards_disjoint_and_complete(cluster_results, tiny_dataset):
    """Per-host test-phase readers each see a disjoint half; the union is
    every sample exactly once (the global batch is correct by assembly)."""
    ids0 = set(cluster_results[0]["sample_ids"])
    ids1 = set(cluster_results[1]["sample_ids"])
    assert ids0 and ids1
    assert not (ids0 & ids1), f"overlapping shards: {ids0 & ids1}"
    assert len(ids0) + len(ids1) == 4  # one test pair per scene


def test_global_train_step_matches_single_process(cluster_results):
    """Both hosts observe the identical (replicated) loss, and it matches
    the same step run single-process on a 2-device mesh with the same
    global batch."""
    l0, l1 = cluster_results[0]["losses"], cluster_results[1]["losses"]
    assert l0 == pytest.approx(l1, rel=1e-6)
    assert all(np.isfinite(l0))

    # single-process reference on the same global batch (the parent pytest
    # process has 8 CPU devices; use a 4-device mesh like the cluster)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from demon_tpu.engine.sharding import make_mesh
    from demon_tpu.train.trainer import EvolutionTrainer, TrainConfig

    mesh = make_mesh(devices=jax.devices()[:4], axis_names=("data",))
    cfg = TrainConfig(height=64, width=64, batch_size=4,
                      batch_size_iterative=4)
    trainer = EvolutionTrainer(cfg, mesh=mesh)
    params = jax.device_put(trainer.init_params(jax.random.key(0)),
                            NamedSharding(mesh, P()))
    opt_state = trainer.init_opt_state("0_flow1", params)
    rng = np.random.RandomState(0)
    B = 4
    batch = {
        "IMAGE_PAIR": rng.rand(B, 64, 64, 6).astype(np.float32) - 0.5,
        "MOTION": rng.randn(B, 6).astype(np.float32) * 0.1,
        "DEPTH": rng.uniform(0.3, 1.0, (B, 64, 64, 1)).astype(np.float32),
        "INTRINSICS": np.tile(
            np.array([[0.89, 1.19, 0.5, 0.5]], np.float32), (B, 1)),
    }
    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
    step_fn = trainer.make_train_step("0_flow1")
    ref = []
    for step in range(2):
        params, opt_state, metrics, _ = step_fn(
            params, opt_state, batch, jnp.asarray(step, jnp.int32), None)
        ref.append(float(metrics["total_loss"]))
    assert l0 == pytest.approx(ref, rel=1e-4)


def test_multiprocess_checkpoint_roundtrip(cluster_results):
    for r in cluster_results:
        want, got = r["ckpt_sum"]
        assert got == pytest.approx(want, rel=1e-6)


def test_evo4_replay_carry_parity(cluster_results):
    """Evolution 4 with the recycled-prediction carry sharded over the
    2-process cluster (reference mechanism training/v2/training.py:
    278-320,463-477): both hosts observe identical losses, and loss AND
    post-step carry match a single-process run of the same global
    computation (VERDICT round-3 directive 3)."""
    r0, r1 = cluster_results
    assert r0["losses4"] == pytest.approx(r1["losses4"], rel=1e-6)
    assert all(np.isfinite(r0["losses4"]))
    assert r0["replay_sum"] == pytest.approx(r1["replay_sum"], rel=1e-6)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from demon_tpu.engine.sharding import make_mesh
    from demon_tpu.train.trainer import EvolutionTrainer, TrainConfig

    mesh = make_mesh(devices=jax.devices()[:4], axis_names=("data",))
    cfg = TrainConfig(height=64, width=64, batch_size=4,
                      batch_size_iterative=4)
    trainer = EvolutionTrainer(cfg, mesh=mesh)
    params = jax.device_put(trainer.init_params(jax.random.key(2)),
                            NamedSharding(mesh, P()))
    opt_state = trainer.init_opt_state("4_iterative", params)
    rng = np.random.RandomState(0)
    B = 4
    batch = {
        "IMAGE_PAIR": rng.rand(B, 64, 64, 6).astype(np.float32) - 0.5,
        "MOTION": rng.randn(B, 6).astype(np.float32) * 0.1,
        "DEPTH": rng.uniform(0.3, 1.0, (B, 64, 64, 1)).astype(np.float32),
        "INTRINSICS": np.tile(
            np.array([[0.89, 1.19, 0.5, 0.5]], np.float32), (B, 1)),
    }
    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
    replay = trainer.init_replay("4_iterative", params, batch)
    step_fn = trainer.make_train_step("4_iterative")
    ref_losses = []
    for step in range(2):
        params, opt_state, metrics, replay = step_fn(
            params, opt_state, batch, jnp.asarray(step, jnp.int32), replay)
        ref_losses.append(float(metrics["total_loss"]))
    ref_sum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                        for l in jax.tree.leaves(replay)))
    # step-0 losses agree to float roundoff; step 1 runs on params+carry
    # already once through differently-scheduled collectives, so the
    # cross-topology drift compounds (measured ~1.1e-4 rel on CPU) — a
    # genuinely wrong carry diverges by orders of magnitude, not 5e-4
    assert r0["losses4"] == pytest.approx(ref_losses, rel=5e-4)
    assert r0["replay_leaves"] == len(jax.tree.leaves(replay))
    assert r0["replay_sum"] == pytest.approx(ref_sum, rel=1e-3)
