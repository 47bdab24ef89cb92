"""Worker process for tests/test_multihost.py: one host of a 2-process
jax.distributed CPU cluster (SURVEY §4's "multi-host tests using JAX's
multiprocess runtime on CPU meshes").

Each worker owns 2 virtual CPU devices (global mesh = 4 devices over
2 processes), runs the real evolution-0 train step on a global
data-parallel batch assembled from process-local shards, exercises its
per-host reader shard, and saves/restores a multi-process orbax
checkpoint. Results are written as JSON for the parent test to verify.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid> \
           <workdir> <dataset_h5>
"""

import json
import os
import sys

# 2 virtual CPU devices per process; must be set before backend init.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    .replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_procs, pid, workdir, dataset = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])

    from demon_tpu.train.distributed import (
        host_reader_params, initialize_distributed)

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=pid)
    assert jax.process_count() == num_procs
    assert jax.process_index() == pid
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * num_procs

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from demon_tpu.data.reader import MultiViH5DataReader
    from demon_tpu.engine.sharding import make_mesh
    from demon_tpu.train.checkpoint import EvolutionCheckpointer
    from demon_tpu.train.trainer import EvolutionTrainer, TrainConfig

    result = {"pid": pid}

    # ---- (d) host_reader_params stamps this process's shard ------------
    stamped = host_reader_params({"batch_size": 2})
    assert stamped["host_id"] == pid and stamped["num_hosts"] == num_procs
    result["host_stamp"] = [stamped["host_id"], stamped["num_hosts"]]

    # ---- (b) per-host reader shard: deterministic test phase -----------
    reader_params = {
        **stamped,
        "test_phase": True,
        "builder_threads": 1,
        "inverse_depth": True,
        "motion_format": "ANGLEAXIS6",
        "norm_trans_scale_depth": True,
        "scaled_height": 64,
        "scaled_width": 64,
        "scene_pool_size": 4,
        "augment_rot180": 0,
        "augment_mirror_x": 0,
        "top_output": ("IMAGE_PAIR", "MOTION", "DEPTH", "INTRINSICS",
                       "SAMPLE_IDS"),
        "source": [{"path": dataset, "weight": [{"t": 0, "v": 1.0}]}],
    }
    local_rows = None
    sample_ids = []
    with MultiViH5DataReader(reader_params) as reader:
        for batch in reader:
            sample_ids.extend(str(s) for s in batch["SAMPLE_IDS"])
            if local_rows is None:
                local_rows = batch
    result["sample_ids"] = sample_ids

    # ---- (a) global-mesh train step from per-process shards ------------
    mesh = make_mesh(axis_names=("data",))
    cfg = TrainConfig(height=64, width=64, batch_size=4,
                      batch_size_iterative=4)
    trainer = EvolutionTrainer(cfg, mesh=mesh)
    params = trainer.init_params(jax.random.key(0))
    params = jax.device_put(params, NamedSharding(mesh, P()))
    opt_state = trainer.init_opt_state("0_flow1", params)

    # identical global batch on every host, assembled from each process's
    # local half via make_array_from_process_local_data
    rng = np.random.RandomState(0)
    B = 4
    global_batch_np = {
        "IMAGE_PAIR": rng.rand(B, 64, 64, 6).astype(np.float32) - 0.5,
        "MOTION": rng.randn(B, 6).astype(np.float32) * 0.1,
        "DEPTH": rng.uniform(0.3, 1.0, (B, 64, 64, 1)).astype(np.float32),
        "INTRINSICS": np.tile(
            np.array([[0.89, 1.19, 0.5, 0.5]], np.float32), (B, 1)),
    }
    sharding = NamedSharding(mesh, P("data"))
    n_local = B // num_procs

    def to_global(x):
        local = x[pid * n_local:(pid + 1) * n_local]
        return jax.make_array_from_process_local_data(
            sharding, local, global_shape=x.shape)

    batch = {k: to_global(v) for k, v in global_batch_np.items()}
    step_fn = trainer.make_train_step("0_flow1")
    import jax.numpy as jnp

    losses = []
    for step in range(2):
        params, opt_state, metrics, _ = step_fn(
            params, opt_state, batch, jnp.asarray(step, jnp.int32), None)
        losses.append(float(metrics["total_loss"]))
    result["losses"] = losses

    # ---- (e) evolution-4: replay carry sharded across hosts -------------
    # the trickiest distributed state in the trainer — the recycled-
    # prediction carry (reference FIFOQueue mechanism, training/v2/
    # training.py:278-320,463-477) lives across steps as global arrays
    # data-sharded over BOTH processes (_constrain_replay pins the
    # layout). Two steps; the parent compares loss AND post-step carry
    # against a single-process run of the same global computation.
    evo4 = "4_iterative"
    params4 = jax.device_put(trainer.init_params(jax.random.key(2)),
                             NamedSharding(mesh, P()))
    opt4 = trainer.init_opt_state(evo4, params4)
    replay = trainer.init_replay(evo4, params4, batch)
    step_fn4 = trainer.make_train_step(evo4)
    losses4 = []
    for step in range(2):
        params4, opt4, m4, replay = step_fn4(
            params4, opt4, batch, jnp.asarray(step, jnp.int32), replay)
        losses4.append(float(m4["total_loss"]))
    result["losses4"] = losses4
    result["replay_sum"] = float(sum(
        jnp.sum(jnp.abs(l.astype(jnp.float32)))
        for l in jax.tree.leaves(replay)))
    result["replay_leaves"] = len(jax.tree.leaves(replay))

    # ---- (c) multi-process orbax save/restore ---------------------------
    ckdir = os.path.join(workdir, "ckpt")
    ck = EvolutionCheckpointer(ckdir, "0_flow1")
    ck.save(2, params, opt_state, force=True)
    ck.wait()

    def tree_sum(t):
        return float(sum(jnp.sum(l.astype(jnp.float64))
                         for l in jax.tree.leaves(t)))

    want = tree_sum(params)
    seed = jax.device_put(trainer.init_params(jax.random.key(1)),
                          NamedSharding(mesh, P()))
    step, restored = ck.restore(
        {"params": seed, "opt_state": trainer.init_opt_state("0_flow1", seed)})
    ck.close()
    assert step == 2
    got = tree_sum(restored["params"])
    result["ckpt_sum"] = [want, got]

    with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
