"""Worker process for the multi-host emulation test.

Usage: python multihost_worker.py RANK NPROC PORT

Runs ONE data-parallel RL train step on an 8-device global mesh.  With
NPROC=1 it is a plain single-process 8-device run (the dryrun_multichip
configuration); with NPROC=2 each process owns 4 virtual CPU devices and
joins a jax.distributed cluster over local TCP — the same
`jax.distributed.initialize` + `multihost_utils.host_local_array_to_
global_array` path a real multi-host TPU pod uses over DCN (SURVEY.md §2.5
TPU-native mapping; train/mesh.py docstring).

Prints one JSON line with the step metrics; the parent test asserts both
ranks agree with each other and with the single-process reference.
"""

import json
import os
import sys


def main():
    rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    n_global = 8
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{n_global // nproc}").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=rank)
    assert len(jax.devices()) == n_global, jax.devices()
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from adaptiveisp_tpu.config import Config, TrainConfig
    from adaptiveisp_tpu.detect.loss import LossHyp
    from adaptiveisp_tpu.detect.model import (
        anchors_in_grid_units, create_detector)
    from adaptiveisp_tpu.policy.agent import create_agent_state
    from adaptiveisp_tpu.policy.states import get_initial_states
    from adaptiveisp_tpu.policy.value import create_value_state
    from adaptiveisp_tpu.train import mesh as mesh_lib
    from adaptiveisp_tpu.train.optim import make_optimizer
    from adaptiveisp_tpu.train.step import init_train_state, make_train_step

    # tiny everything: the point is the distributed topology, not the model
    spec = {
        "nc": 4,
        "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
        "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],   # 2: /8
                     [-1, 1, "Conv", [16, 3, 2]],   # 3: /16
                     [-1, 1, "Conv", [16, 3, 2]]],  # 4: /32
        "head": [[[3, 4], 1, "Detect", ["nc", "anchors"]]],
    }
    imgsz, batch = 64, n_global
    cfg = Config()
    tcfg = TrainConfig(batch_size=batch, epochs=1, imgsz=imgsz)

    k = jax.random.PRNGKey(0)
    ka, kv, ky = jax.random.split(k, 3)
    agent, agent_vars = create_agent_state(cfg, ka, image_size=imgsz,
                                           batch=1)
    value, value_vars = create_value_state(cfg, kv, image_size=imgsz,
                                           batch=1)
    yolo, yolo_vars = create_detector(ky, spec=spec, imgsz=imgsz)

    hyp = LossHyp(obj=1.0 * (imgsz / 640) ** 2)
    tx_a = make_optimizer(tcfg.lr, 100)
    tx_v = make_optimizer(tcfg.lr, 100)
    step_fn = make_train_step(agent, value, yolo, cfg, tcfg,
                              anchors_in_grid_units(spec), hyp, tx_a, tx_v)

    mesh = mesh_lib.make_mesh(n_global)
    sharded_step = mesh_lib.shard_train_step(step_fn, mesh)

    state = init_train_state(agent_vars, value_vars, tx_a, tx_v)

    rng = np.random.RandomState(0)
    t_max = 4
    targets = np.zeros((batch, t_max, 5), np.float32)
    targets[:, 0] = [2, 0.5, 0.5, 0.3, 0.4]
    tmask = np.zeros((batch, t_max), bool)
    tmask[:, 0] = True
    batch_arrays = (
        rng.rand(batch, imgsz, imgsz, 3).astype(np.float32),
        rng.rand(batch, cfg.z_dim).astype(np.float32),
        np.asarray(get_initial_states(batch, cfg.num_state_dim)),
        targets,
        tmask,
    )

    def to_global(tree, pspec_fn):
        return jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, pspec_fn(x)), tree)

    if nproc > 1:
        # every process builds the same global batch deterministically and
        # contributes its own contiguous slice (per-host data sharding —
        # the DistributedSampler analog, SURVEY.md §2.5)
        per = batch // nproc
        local = jax.tree_util.tree_map(
            lambda x: x[rank * per:(rank + 1) * per], batch_arrays)
        batch_g = to_global(local, lambda x: P("data"))
        # params/opt state are identical on every process -> replicated
        state_g = to_global(state, lambda x: P())
        yolo_g = to_global(yolo_vars, lambda x: P())
        key_g = to_global(jax.random.PRNGKey(1), lambda x: P())
    else:
        batch_g = mesh_lib.shard_batch(mesh, batch_arrays)
        state_g = mesh_lib.replicate(mesh, state)
        yolo_g = mesh_lib.replicate(mesh, yolo_vars)
        key_g = jax.random.PRNGKey(1)

    out = sharded_step(state_g, yolo_g, batch_g, key_g, 0.0)
    # scalar metrics are replicated (full reductions) -> fetchable on every
    # process; per-image arrays (selected_filter, ...) are data-sharded and
    # would need a process_allgather, so skip them by ABSTRACT size (no
    # fetch)
    metrics = {k2: float(jax.device_get(v))
               for k2, v in out.metrics.items() if v.size == 1}
    print("METRICS " + json.dumps(
        {"rank": rank, "nproc": nproc, **metrics}), flush=True)
    mesh_lib.sync_global_devices("done")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
