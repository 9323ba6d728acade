"""Per-stage agent fusion backbone (reference att_bev_backbone.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmvit_tpu.data.synthetic import make_hetero_batch
from hmvit_tpu.models.zoo import build_model

pytestmark = pytest.mark.slow

RANGE = [-20.48, -20.48, -3.0, 20.48, 20.48, 1.0]
CFG = {
    "core_method": "point_pillar_intermediate",
    "args": {
        "anchor_number": 2,
        "lidar": {
            "voxel_size": [0.64, 0.64, 4.0],
            "lidar_range": RANGE,
            "pillar_vfe": {"num_filters": [32]},
            "point_pillar_scatter": {"grid_size": [64, 64, 1]},
            "base_bev_backbone": {
                "layer_nums": [1, 1], "layer_strides": [2, 2],
                "num_filters": [32, 32], "upsample_strides": [1, 2],
                "num_upsample_filter": [32, 32]},
            "shrink_header": {"kernal_size": [3], "stride": [1],
                              "padding": [1], "dim": [64],
                              "input_dim": 64},
        },
    },
}


def test_per_stage_fusion_uses_all_agents_at_every_stage():
    batch, _ = make_hetero_batch(seed=0, batch_size=1, max_cav=3,
                                 num_agents=3, max_points=2048,
                                 image_size=32, camera_ratio=0.0,
                                 ego_mode="lidar", lidar_range=RANGE)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    model = build_model(CFG)
    variables = model.init(jax.random.key(0), jb, train=False)
    out = model.apply(variables, jb, train=False)
    assert out["psm"].shape[0] == 1
    assert np.isfinite(np.asarray(out["psm"])).all()

    # removing a non-ego agent's points changes the ego output (fusion
    # happens inside the backbone, not post-hoc on final features only)
    jb2 = dict(jb)
    jb2["points_mask"] = jb["points_mask"].at[:, 2].set(0.0)
    out2 = model.apply(variables, jb2, train=False)
    assert np.abs(np.asarray(out2["psm"] - out["psm"])).max() > 1e-5

    # the ego projection matters: perturbing a sender's transform moves
    # its contribution
    jb3 = dict(jb)
    t = jb["transformation_matrix"]
    jb3["transformation_matrix"] = t.at[:, 1, 0, 3].add(3.0)
    out3 = model.apply(variables, jb3, train=False)
    assert np.abs(np.asarray(out3["psm"] - out["psm"])).max() > 1e-5

    # differs from the post-hoc att architecture with same config family
    posthoc = build_model({"core_method": "point_pillar_opv2v",
                           "args": CFG["args"]})
    v2 = posthoc.init(jax.random.key(0), jb, train=False)
    outp = posthoc.apply(v2, jb, train=False)
    assert outp["psm"].shape == out["psm"].shape

    # gradient flows through every stage's fusion
    def loss(v):
        return jnp.sum(model.apply(v, jb, train=False)["psm"] ** 2)

    g = jax.grad(lambda p: loss({"params": p,
                                 "batch_stats": variables["batch_stats"]}))(
        variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert sum(float(jnp.abs(x).sum()) for x in leaves) > 0
