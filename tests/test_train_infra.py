"""Optimizer schedules, subtree freezing, loss registry, config cycle."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hmvit_tpu.train.losses import build_loss, pixor_loss, voxel_net_loss
from hmvit_tpu.train.schedulers import build_optimizer, build_schedule


def test_cosine_warmup_schedule_shape():
    cfg = {"core_method": "cosineannealwarm", "epoches": 10,
           "warmup_lr": 1e-5, "warmup_epoches": 2, "lr_min": 1e-6}
    sched = build_schedule(cfg, 1e-3, steps_per_epoch=100)
    assert np.isclose(float(sched(0)), 1e-5, rtol=1e-3)
    assert np.isclose(float(sched(200)), 1e-3, rtol=1e-2)  # warmup peak
    assert float(sched(999)) < float(sched(500))
    assert float(sched(10_000)) >= 1e-6 - 1e-9


def test_multistep_schedule():
    sched = build_schedule(
        {"core_method": "multistep", "step_size": [2, 4], "gamma": 0.1},
        1e-2, steps_per_epoch=10)
    assert np.isclose(float(sched(0)), 1e-2)
    assert np.isclose(float(sched(25)), 1e-3)
    assert np.isclose(float(sched(45)), 1e-4)


def test_frozen_subtree_gets_no_updates():
    tx, _ = build_optimizer(
        {"core_method": "AdamW", "lr": 1e-2, "args": {}},
        {"core_method": "constant"},
        steps_per_epoch=1,
        frozen_prefixes=("camera_encoder",),
    )
    params = {
        "camera_encoder": {"w": jnp.ones((3,))},
        "fusion": {"w": jnp.ones((3,))},
    }
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(new["camera_encoder"]["w"], 1.0)
    assert np.abs(np.asarray(new["fusion"]["w"]) - 1.0).max() > 1e-4


def test_loss_registry():
    fn, kwargs = build_loss({"core_method": "point_pillar_loss",
                             "args": {"cls_weight": 2.0, "reg": 3.0}})
    assert kwargs == {"cls_weight": 2.0, "reg_weight": 3.0}
    assert build_loss({"core_method": "voxel_net_loss"})[0] is voxel_net_loss
    assert build_loss({"core_method": "pixor_loss"})[0] is pixor_loss


def test_config_snapshot_cycle(tmp_path):
    from hmvit_tpu.config import load_config, save_config

    cfg = load_config("hmvit_tpu/config/hypes/smoke_hetero_tiny.yaml")
    save_config(cfg, str(tmp_path / "config.yaml"))
    back = load_config("", model_dir=str(tmp_path))
    assert back["postprocess"]["anchor_args"]["W"] == \
        cfg["postprocess"]["anchor_args"]["W"]
    assert back["model"]["core_method"] == cfg["model"]["core_method"]
    # derived grid survives the round trip
    assert back["model"]["args"]["lidar"]["point_pillar_scatter"][
        "grid_size"] == [64, 64, 1]
