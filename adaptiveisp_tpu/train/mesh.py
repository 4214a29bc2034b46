"""Device mesh + data-parallel sharding utilities.

The reference's distributed story is torch DDP scaffolding
(SURVEY.md §2.5: DistributedSampler hooks, NCCL init in the vendored YOLO
trainers; the RL loop itself is single-GPU).  The TPU-native equivalent is a
1-D data-parallel `jax.sharding.Mesh`: batch sharded over the 'data' axis,
parameters replicated, XLA inserting the psum gradient reduction — no
hand-written collectives.  Multi-host extends the same mesh over ICI/DCN via
`jax.distributed.initialize()`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"
EXPERT_AXIS = "expert"
PIPE_AXIS = "pipe"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def make_mesh_2d(n_data: int, n_spatial: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """(data x spatial) mesh: batch DP on one axis, image rows spread over
    the other (sequence/spatial parallelism for big-frame ISP rendering —
    one 8K frame's rows ride every chip's HBM instead of one)."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_spatial
    if len(devs) < need:
        raise ValueError(f"mesh {n_data}x{n_spatial} needs {need} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_data, n_spatial),
                (DATA_AXIS, SPATIAL_AXIS))


def make_mesh_dp_tp(n_data: int, n_model: int,
                    devices: Optional[Sequence] = None) -> Mesh:
    """(data x model) mesh for tensor-parallel detector training: batch DP
    on one axis, conv output CHANNELS spread over the other.  The reference
    has no TP anywhere (SURVEY.md §2.5 — small CNNs); on TPU the mesh
    abstraction makes it nearly free, so the capability is first-class: one
    sharding rule on the weight pytree and GSPMD partitions every conv and
    inserts the collectives."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_model
    if len(devs) < need:
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_data, n_model),
                (DATA_AXIS, MODEL_AXIS))


def make_mesh_dp_ep(n_data: int, n_expert: int,
                    devices: Optional[Sequence] = None) -> Mesh:
    """(data x expert) mesh for expert-parallel filter evaluation: batch DP
    on one axis, the K filter BRANCHES of the policy's candidate render
    spread over the other.  The agent always evaluates all K filters and
    blends by one-hot (reference agent.py:103-116, 154) — a natural
    mixture-of-experts: each chip renders K/E candidates and a psum over
    'expert' completes the blend (:mod:`adaptiveisp_tpu.ops.ep`)."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_expert
    if len(devs) < need:
        raise ValueError(f"mesh {n_data}x{n_expert} needs {need} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_data, n_expert),
                (DATA_AXIS, EXPERT_AXIS))


def make_mesh_dp_pp(n_data: int, n_pipe: int,
                    devices: Optional[Sequence] = None) -> Mesh:
    """(data x pipe) mesh for pipeline-parallel streaming ISP: microbatch DP
    on one axis, the SEQUENTIAL STAGES of a scripted ISP pipeline spread
    over the other.  Stage i lives on pipe-coordinate i; frames stream
    through the ring via ppermute (:mod:`adaptiveisp_tpu.ops.pp`)."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_pipe
    if len(devs) < need:
        raise ValueError(f"mesh {n_data}x{n_pipe} needs {need} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_data, n_pipe),
                (DATA_AXIS, PIPE_AXIS))


def tp_leaf_sharding(mesh: Mesh, leaf) -> NamedSharding:
    """Megatron-style channel sharding by shape alone: the trailing dim of
    every weight is the OUTPUT-channel dim (flax conv HWIO kernels, dense
    (in, out), BN scale/bias/EMA/optimizer moments all (..., C)), so shard
    it over 'model' whenever it divides evenly and replicate otherwise
    (e.g. the Detect head's na*(5+nc)=255-wide convs).  One rule covers
    params, batch_stats, EMA and optax moments uniformly."""
    n_model = mesh.shape[MODEL_AXIS]
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 1 and shape[-1] % n_model == 0 and shape[-1] >= n_model:
        return NamedSharding(
            mesh, P(*([None] * (len(shape) - 1)), MODEL_AXIS))
    return NamedSharding(mesh, P())


def tp_state_sharding(mesh: Mesh, state):
    """Sharding pytree for a train state (params/batch_stats/EMA/opt
    moments) under the channel rule."""
    return jax.tree_util.tree_map(lambda x: tp_leaf_sharding(mesh, x), state)


def shard_detector_train_step(train_step, mesh: Mesh, state,
                              n_batch_args: int = 3):
    """jit a detector train step over a (data x model) mesh: every weight
    channel-sharded on 'model' per :func:`tp_leaf_sharding`, batch args
    placed by the caller (shard_batch puts them on 'data').  GSPMD
    partitions the convs (each chip owns a slice of every layer's output
    channels) and inserts the all-gather/psum collectives — dp gradients
    still reduce over 'data'.

    Returns (jitted_step, sharded_state).
    """
    st_sh = tp_state_sharding(mesh, state)
    jitted = jax.jit(
        train_step,
        in_shardings=(st_sh,) + (None,) * n_batch_args,
        out_shardings=(st_sh, None),
    )
    return jitted, jax.device_put(state, st_sh)


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image: batch over 'data', HEIGHT over 'spatial'.  GSPMD inserts
    the halo exchanges that windowed ops (sharpen blurs, NLM shifts) need
    at shard boundaries — no hand-written collectives."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def shard_train_step(train_step, mesh: Mesh):
    """jit the train step with DP shardings.

    TrainState/params replicated; batch sharded on axis 0.  XLA turns the
    batch-mean gradients into a psum over the data axis automatically — the
    NCCL-allreduce equivalent (SURVEY.md §2.5 TPU-native mapping).
    """
    rep = replicated(mesh)

    def shardings_for_batch(batch):
        return jax.tree_util.tree_map(
            lambda x: data_sharding(mesh, x.ndim), batch)

    def wrapped(state, yolo_vars, batch, dropout_rng, progress):
        return train_step(state, yolo_vars, batch, dropout_rng, progress)

    return jax.jit(
        wrapped,
        in_shardings=(rep, rep, None, rep, None),
        out_shardings=None,
        donate_argnums=0,  # update params/opt in place across the mesh
    )


def sync_global_devices(name: str = "barrier"):
    """Multi-host barrier (the torch_distributed_zero_first analog,
    reference yolov3/utils/torch_utils.py:89-95)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
