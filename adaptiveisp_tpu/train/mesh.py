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
