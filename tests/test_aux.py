"""Augmentation, visualization, segmentation head/loss/rasterizer."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from hmvit_tpu.data.augment import DataAugmentor
from hmvit_tpu.models.seg_head import (
    BevSegHead,
    rasterize_boxes_to_mask,
    seg_iou,
    seg_loss,
)
from hmvit_tpu.utils import boxes as B
from hmvit_tpu.visualization.vis import visualize_bev, visualize_seg


def test_augmentor_consistency():
    """Augmented points must stay on the augmented boxes: points that were
    inside a box remain inside after any world transform."""
    rng = np.random.default_rng(0)
    box = np.array([[5.0, -3.0, 0.0, 4.0, 2.0, 1.5, 0.4]])  # lwh order
    corners = B.boxes_to_corners_3d(box, "lwh")[0]
    inner = corners[:4, :2].mean(0)
    pts = np.concatenate(
        [inner + rng.uniform(-0.3, 0.3, (50, 2)),
         np.zeros((50, 1)), np.ones((50, 1))], axis=1)

    aug = DataAugmentor(
        [{"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x", "y"]},
         {"NAME": "random_world_rotation"},
         {"NAME": "random_world_scaling"}],
        train=True, seed=3)
    for _ in range(5):
        p2, b2 = aug(pts, box)
        c2 = B.boxes_to_corners_3d(b2, "lwh")[0]
        inside = B.points_in_rotated_box_mask(p2[:, :2], c2[:4, :2])
        assert inside.mean() > 0.9


def test_augmentor_disabled_when_eval():
    aug = DataAugmentor([{"NAME": "random_world_rotation"}], train=False)
    pts = np.random.default_rng(0).normal(size=(10, 4))
    box = np.zeros((2, 7))
    p2, b2 = aug(pts, box)
    np.testing.assert_array_equal(p2, pts)


def test_visualization_writes_png(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (1000, 3))
    boxes = np.array([[0, 0, 0, 1.5, 2.0, 4.5, 0.3]])
    corners = B.boxes_to_corners_3d(boxes, "hwl")
    out = str(tmp_path / "frame.png")
    visualize_bev(pts, corners, corners, [-50, -50, -3, 50, 50, 1],
                  save_path=out)
    assert os.path.getsize(out) > 1000

    seg_out = str(tmp_path / "seg.png")
    visualize_seg(rng.integers(0, 2, (64, 64)), save_path=seg_out)
    assert os.path.getsize(seg_out) > 500


def test_seg_head_and_loss():
    head = BevSegHead("both")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 8)),
                    jnp.float32)
    variables = head.init(jax.random.key(0), x)
    out = head.apply(variables, x)
    assert out["dynamic_seg"].shape == (2, 16, 16, 2)
    assert out["static_seg"].shape == (2, 16, 16, 3)

    labels = {
        "dynamic_seg": jnp.zeros((2, 16, 16), jnp.int32),
        "static_seg": jnp.zeros((2, 16, 16), jnp.int32),
    }
    total, parts = seg_loss(out, labels)
    assert np.isfinite(float(total))


def test_rasterizer_marks_box_cells():
    boxes = np.array([[0.0, 0.0, 0.0, 1.5, 2.0, 4.0, 0.0]])  # hwl
    mask = rasterize_boxes_to_mask(boxes, [-10, -10, -3, 10, 10, 1],
                                   (64, 64))
    # center cell inside, far corner outside
    assert mask[32, 32] == 1
    assert mask[0, 0] == 0
    # roughly the box area fraction: 8 m^2 of 400 m^2 -> ~2% of cells
    frac = mask.mean()
    assert 0.01 < frac < 0.05

    iou = seg_iou(mask, mask)
    assert iou["miou"] == 1.0
