"""Device-mesh utilities: the TPU-native replacement for the reference's
NCCL process groups (reference: opencood/tools/multi_gpu_utils.py:16-39).

One jitted program under a Mesh; the batch is sharded on the ``data``
axis, parameters are replicated, and XLA inserts the gradient all-reduce.
No process groups, no ``find_unused_parameters`` (the model graph is
static for every modality mix), no explicit barriers.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=("data",), shape=None) -> Mesh:
    """1-D data mesh by default; pass shape=(dp, mp) for hybrid layouts."""
    devices = devices if devices is not None else jax.devices()
    arr = np.array(devices)
    if shape is not None:
        arr = arr.reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch pytree with the leading axis split over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def replicate_state(state, mesh: Mesh):
    """Replicate params/opt state across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)


def make_sharded_eval(model, mesh: Mesh):
    """Data-parallel batched inference: variables replicated, batch
    sharded on 'data', outputs sharded the same way.  The TPU-native
    replacement for a per-rank eval loop — one jitted program, frames
    split across chips, decode/AP stay on the host (reference eval loop:
    opencood/tools/inference_camera.py:145-185 runs frames serially on
    one GPU)."""
    return jax.jit(
        lambda variables, batch: model.apply(variables, batch,
                                             train=False),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )
