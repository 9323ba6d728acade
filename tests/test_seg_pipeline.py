"""Camera BEV segmentation: model forward, loss grad, dataset GT."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from hmvit_tpu.data.synthetic import make_hetero_batch
from hmvit_tpu.models.seg_head import seg_loss
from hmvit_tpu.models.zoo import build_model

pytestmark = pytest.mark.slow


def test_camera_segmentor_end_to_end():
    rng_range = [-20.48, -20.48, -3.0, 20.48, 20.48, 1.0]
    batch, _ = make_hetero_batch(
        seed=0, batch_size=1, max_cav=2, num_agents=2, max_points=512,
        image_size=32, num_cams=2, camera_ratio=1.0, ego_mode="camera",
        lidar_range=rng_range,
    )
    model = build_model({
        "core_method": "cvt_seg",
        "args": {"target": "dynamic",
                 "camera": {"dim": 16, "bev_size": 4, "out_dim": 16,
                            "num_blocks": 1, "decoder_layers": 2,
                            "encoder_channels": (8, 8, 16, 16)}},
    })
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.key(0), jb, train=False)
    out = model.apply(variables, jb, train=False)
    assert out["dynamic_seg"].shape == (1, 16, 16, 2)

    from hmvit_tpu.models.seg_head import rasterize_boxes_to_mask

    boxes = batch["object_bbx_center"][0][batch["object_bbx_mask"][0] > 0]
    gt = rasterize_boxes_to_mask(boxes, rng_range, (16, 16))
    labels = {"dynamic_seg": jnp.asarray(gt[None], jnp.int32)}

    def loss(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jb, train=True, mutable=["batch_stats"])
        return seg_loss(o, labels)[0]

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(x)) for x in leaves)
    assert any(np.abs(x).max() > 0 for x in leaves)
