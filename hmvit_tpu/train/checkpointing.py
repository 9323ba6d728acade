"""Checkpoint save/resume via orbax + staged backbone loading.

Replaces torch.save/state_dict round-trips (reference:
opencood/tools/train_utils.py:26-74, train_camera.py:222-225): whole
TrainState pytrees are checkpointed per epoch, resume discovers the last
step, and single-modality backbone checkpoints can be grafted into a
fusion model's param tree (staged training) before freezing.
"""
from __future__ import annotations

import os
import re

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=None, create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, state) -> None:
    mgr = _manager(ckpt_dir)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def find_last_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for d in os.listdir(ckpt_dir)
        if (m := re.fullmatch(r"(\d+)", d))
    ]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, abstract_state, step: int | None = None):
    # abstract leaves without an explicit sharding get the local default
    # device, so checkpoints restore across topologies (e.g. a converted
    # checkpoint written on TPU, restored on CPU) instead of failing on
    # the recorded sharding file.
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def _with_sharding(x):
        if isinstance(x, jax.ShapeDtypeStruct) and x.sharding is None:
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return x

    abstract_state = jax.tree_util.tree_map(_with_sharding, abstract_state)
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    out = mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
    mgr.close()
    return out


def graft_subtree(params, donor_params, key: str):
    """Copy donor_params[key] into params[key] (staged training: load a
    pretrained camera/lidar encoder into the fusion model)."""
    if key not in params or key not in donor_params:
        raise KeyError(f"{key!r} missing from one of the trees")
    new = dict(params)
    new[key] = jax.tree_util.tree_map(lambda x: x, donor_params[key])
    return type(params)(new) if not isinstance(params, dict) else new
