"""Anchor-free BEV (PIXOR) postprocessor: golden label-map parity vs the
reference LidarBevPostprocessor executed directly, plus a decode
round-trip — perfect targets fed back through the device decode + NMS
must reconstruct the GT boxes (reference:
opencood/data_utils/post_processor/lidar_bev_postprocessor.py)."""
import numpy as np
import pytest

from hmvit_tpu.postprocess_bev import (
    TARGET_MEAN,
    TARGET_STD,
    BevPostprocessor,
    bev_label_map,
    decode_bev_device,
)
from hmvit_tpu.utils import boxes as box_utils

GEOM = {
    "L1": -12.8, "L2": 12.8, "W1": -12.8, "W2": 12.8,
    "H1": -3.0, "H2": 1.0, "res": 0.4, "downsample_rate": 4,
    "input_shape": (64, 64, 11), "label_shape": (16, 16, 7),
}


def _random_boxes(rng, n, max_num=12):
    boxes = np.zeros((max_num, 7))
    mask = np.zeros((max_num,))
    for i in range(n):
        boxes[i] = [rng.uniform(-9, 9), rng.uniform(-9, 9),
                    rng.uniform(-1.5, 0.0), rng.uniform(3.0, 4.5),
                    rng.uniform(1.4, 2.0), 1.5, rng.uniform(-np.pi, np.pi)]
        mask[i] = 1
    return boxes, mask


def test_label_map_matches_reference():
    torch = pytest.importorskip("torch")  # noqa: F841
    from test_reference_parity import _install_reference

    _install_reference()
    from opencood.data_utils.post_processor.lidar_bev_postprocessor import (
        LidarBevPostprocessor,
    )

    params = {"geometry_param": GEOM, "order": "lwh",
              "nms_thresh": 0.15,
              "target_args": {"score_threshold": 0.5},
              "max_num": 12}
    ref = LidarBevPostprocessor(params, train=True)

    rng = np.random.default_rng(0)
    boxes, mask = _random_boxes(rng, 6)
    ref_label = ref.generate_label(gt_box_center=boxes, mask=mask)
    got = bev_label_map(boxes, mask, GEOM)

    np.testing.assert_allclose(got["label_map"], ref_label["label_map"],
                               atol=1e-5)
    np.testing.assert_allclose(got["bev_corners"],
                               ref_label["bev_corners"], atol=1e-5)


def test_decode_round_trip():
    """Perfect targets -> decode -> NMS reconstructs the GT corners."""
    rng = np.random.default_rng(1)
    boxes, mask = _random_boxes(rng, 4)
    # keep boxes apart so NMS keeps exactly one detection per GT
    boxes[:4, 0] = [-7, -7, 7, 7]
    boxes[:4, 1] = [-7, 7, -7, 7]
    label = bev_label_map(boxes, mask, GEOM)["label_map"]  # (7, H, W)

    cls_logits = label[:1] * 20.0 - 10.0
    reg = label[1:]
    pp = BevPostprocessor({"geometry_param": GEOM, "nms_thresh": 0.15,
                           "target_args": {"score_threshold": 0.5}},
                          train=False)
    corners, scores = pp.post_process(
        {"ego": {"transformation_matrix": np.eye(4)}},
        {"ego": {"cls": cls_logits, "reg": reg}})

    assert corners is not None and corners.shape[0] == 4
    gt_corners = box_utils.boxes_to_corners_2d(boxes[:4], "lwh")[..., :2]

    # match each GT to its closest detection by centroid
    det_c = corners.mean(axis=1)
    for g in range(4):
        gc = gt_corners[g].mean(axis=0)
        j = np.argmin(np.linalg.norm(det_c - gc[None], axis=1))
        # every cell in the box encodes the exact box, so the surviving
        # detection reproduces the corners up to float32 round-off
        np.testing.assert_allclose(corners[j], gt_corners[g], atol=2e-3)
        assert scores[j] > 0.99


def test_decode_respects_threshold_and_transform():
    rng = np.random.default_rng(2)
    boxes, mask = _random_boxes(rng, 1)
    label = bev_label_map(boxes, mask, GEOM)["label_map"]
    cls_logits = label[:1] * 20.0 - 10.0

    # empty frame below threshold
    corners, scores, valid = decode_bev_device(
        np.full(GEOM["label_shape"][:2], -10.0), label[1:], np.eye(4),
        GEOM, score_threshold=0.5)
    assert not np.asarray(valid).any()

    # translation-only transform shifts the decoded corners
    t = np.eye(4)
    t[0, 3], t[1, 3] = 2.0, -1.0
    c0, s0, v0 = decode_bev_device(cls_logits, label[1:], np.eye(4), GEOM)
    c1, s1, v1 = decode_bev_device(cls_logits, label[1:], t, GEOM)
    k = np.asarray(v0)
    np.testing.assert_allclose(np.asarray(c1)[k] - np.asarray(c0)[k],
                               np.broadcast_to([2.0, -1.0],
                                               np.asarray(c0)[k].shape),
                               atol=1e-4)


def test_normalization_stats_are_reference_verbatim():
    np.testing.assert_allclose(
        TARGET_MEAN, [0.008, 0.001, 0.202, 0.2, 0.43, 1.368])
    np.testing.assert_allclose(
        TARGET_STD, [0.866, 0.5, 0.954, 0.668, 0.09, 0.111])


def test_labels_and_loss_plumbing():
    """build_postprocessor -> labels_for_batch -> pixor_loss wiring: the
    anchor-free family trains through the generic trainer path."""
    import jax.numpy as jnp

    from hmvit_tpu.postprocess import build_postprocessor
    from hmvit_tpu.train.losses import build_loss
    from hmvit_tpu.train.trainer import labels_for_batch

    pp = build_postprocessor(
        {"core_method": "BevPostprocessor", "geometry_param": GEOM,
         "nms_thresh": 0.15, "target_args": {"score_threshold": 0.5}},
        train=True)
    assert pp.generate_anchor_box() is None

    rng = np.random.default_rng(3)
    boxes, mask = _random_boxes(rng, 3)
    batch = {"object_bbx_center": boxes[None], "object_bbx_mask": mask[None]}
    labels = labels_for_batch(pp, None, batch)
    assert labels["label_map"].shape == (1, 7, 16, 16)

    loss_fn, kwargs = build_loss(
        {"core_method": "pixor_loss", "args": {"alpha": 1.0, "beta": 2.0}})
    lm = labels["label_map"]
    perfect = {"cls": lm[:, :1] * 20.0 - 10.0, "reg": lm[:, 1:]}
    loss_perfect, metrics = loss_fn(perfect, labels, **kwargs)
    noisy = {"cls": jnp.zeros_like(lm[:, :1]),
             "reg": lm[:, 1:] + 0.5}
    loss_noisy, _ = loss_fn(noisy, labels, **kwargs)
    assert float(loss_perfect) < float(loss_noisy)
    assert float(metrics["reg_loss"]) < 1e-6  # perfect reg -> zero
