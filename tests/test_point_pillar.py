"""Single-agent PointPillars: forward shapes, gradient flow, overfit."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hmvit_tpu.data.anchors import generate_anchor_grid, generate_labels
from hmvit_tpu.data.synthetic import (
    lidar_from_boxes,
    make_scene,
    vehicles_in_agent_frame,
)
from hmvit_tpu.models.point_pillar import PointPillarDetector
from hmvit_tpu.train.losses import point_pillar_loss

pytestmark = pytest.mark.slow

# tiny config: range +-20.48 m, voxel 0.64 -> grid 64x64, heads 16x16
RANGE = [-20.48, -20.48, -3.0, 20.48, 20.48, 1.0]
CFG = {
    "voxel_size": [0.64, 0.64, 4.0],
    "lidar_range": RANGE,
    "anchor_number": 2,
    "pillar_vfe": {"use_norm": True, "with_distance": False,
                   "use_absolute_xyz": True, "num_filters": [32]},
    "point_pillar_scatter": {"num_features": 32, "grid_size": [64, 64, 1]},
    "base_bev_backbone": {
        "layer_nums": [2, 2, 2],
        "layer_strides": [2, 2, 2],
        "num_filters": [32, 32, 32],
        "upsample_strides": [1, 2, 4],
        "num_upsample_filter": [32, 32, 32],
    },
    "shrink_header": {"kernal_size": [3], "stride": [2], "padding": [1],
                      "dim": [64], "input_dim": 96},
}
ANCHOR_ARGS = {
    "cav_lidar_range": RANGE,
    "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
    "feature_stride": 4, "num": 2,
    "vw": 0.64, "vh": 0.64, "vd": 4, "W": 64, "H": 64, "D": 1,
}


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(5)
    vehicles, poses = make_scene(rng, num_agents=1, num_vehicles=4, area=15)
    points, mask = lidar_from_boxes(rng, vehicles, poses[0],
                                    max_points=4096, max_range=25.0)
    gt = vehicles_in_agent_frame(vehicles, poses[0], RANGE)
    anchors = generate_anchor_grid(ANCHOR_ARGS, "hwl")
    gt_pad = np.zeros((20, 7))
    gt_pad[: len(gt)] = gt
    m = np.zeros(20)
    m[: len(gt)] = 1
    labels = generate_labels(gt_pad, m, anchors, 0.6, 0.45)
    return points, mask, labels


def test_forward_shapes_and_grads(scene):
    points, mask, labels = scene
    model = PointPillarDetector(CFG)
    variables = model.init(jax.random.key(0), points[None], mask[None],
                           train=False)
    out = model.apply(variables, points[None], mask[None], train=False)
    assert out["psm"].shape == (1, 2, 16, 16)
    assert out["rm"].shape == (1, 14, 16, 16)

    batch_labels = {
        "pos_equal_one": jnp.asarray(labels["pos_equal_one"])[None],
        "targets": jnp.asarray(labels["targets"])[None],
    }

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            points[None], mask[None], train=True,
            mutable=["batch_stats"],
        )
        total, _ = point_pillar_loss(out, batch_labels)
        return total

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(x)) for x in leaves)
    assert any(np.abs(x).max() > 0 for x in leaves)


def test_overfit_single_frame(scene):
    """30 steps of Adam on one frame must slash the loss — the whole
    voxelize->PFN->backbone->head->loss chain learns end to end."""
    points, mask, labels = scene
    model = PointPillarDetector(CFG)
    variables = model.init(jax.random.key(1), points[None], mask[None],
                           train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    batch_labels = {
        "pos_equal_one": jnp.asarray(labels["pos_equal_one"])[None],
        "targets": jnp.asarray(labels["targets"])[None],
    }

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                points[None], mask[None], train=True,
                mutable=["batch_stats"],
            )
            total, parts = point_pillar_loss(out, batch_labels)
            return total, (updates["batch_stats"], parts)

        (total, (new_bs, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, total

    losses = []
    for _ in range(30):
        params, batch_stats, opt_state, total = step(
            params, batch_stats, opt_state
        )
        losses.append(float(total))
    assert losses[-1] < losses[0] * 0.35, losses[::6]
